# Developer entry points. `make check` is the ship gate: the FULL test
# suite must be green before an end-of-round snapshot (a red flagship test
# shipped once; never again).

PY ?= python

.PHONY: check test smoke bench dryrun

check: test smoke

test:
	$(PY) -m pytest tests/ -q

smoke:
	bash scripts/smoke.sh

bench:
	$(PY) bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
