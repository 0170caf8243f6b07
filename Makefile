# Developer entry points. `make check` is the fast dev gate (<8 min: the
# suite minus the slow-marked multi-minute files); `make check-full` is the
# SHIP gate: the FULL suite must be green before an end-of-round snapshot
# (a red flagship test shipped once; never again).

PY ?= python

.PHONY: check check-full test test-full smoke bench dryrun

check: test smoke

check-full: test-full smoke

test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-full:
	$(PY) -m pytest tests/ -q

smoke:
	bash scripts/smoke.sh

bench:
	$(PY) bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
