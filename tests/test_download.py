"""Downloader tests (file:// URLs — no egress needed)."""

import gzip
import os

import pandas as pd
import pytest

from fragnet_tpu.data.download import DOWNLOAD_REGISTRY, download_moleculenet


class TestDownload:
    def test_registry_covers_moleculenet(self):
        from fragnet_tpu.data.moleculenet import MOLECULENET_REGISTRY

        for name in MOLECULENET_REGISTRY:
            assert name in DOWNLOAD_REGISTRY

    def test_file_url(self, tmp_path):
        src = tmp_path / "src.csv"
        pd.DataFrame({"smiles": ["CCO"], "expt": [1.0]}).to_csv(
            src, index=False)
        out = download_moleculenet("freesolv", str(tmp_path / "out"),
                                   url=f"file://{src}")
        assert os.path.basename(out) == "freesolv.csv"
        df = pd.read_csv(out)
        assert list(df["smiles"]) == ["CCO"]

    def test_gz_url(self, tmp_path):
        src = tmp_path / "src.csv.gz"
        with gzip.open(src, "wt") as f:
            f.write("smiles,NR-AR\nCCO,1\n")
        out = download_moleculenet("tox21", str(tmp_path / "out"),
                                   url=f"file://{src}")
        assert pd.read_csv(out).shape == (1, 2)

    def test_existing_file_short_circuits(self, tmp_path):
        out_dir = tmp_path / "out"
        out_dir.mkdir()
        (out_dir / "esol.csv").write_text("smiles,y\nCCO,0\n")
        out = download_moleculenet("esol", str(out_dir),
                                   url="http://0.0.0.0:1/nope")
        assert out.endswith("esol.csv")

    def test_no_egress_error(self, tmp_path):
        with pytest.raises((ConnectionError, ValueError)):
            download_moleculenet("esol", str(tmp_path / "o"),
                                 url="http://127.0.0.1:9/none", timeout=1.0)
