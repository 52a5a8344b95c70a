"""io (ark writer/reader, device selection) and profiling utils."""

import numpy as np
import pytest

from torchain_tpu import io as tio
from torchain_tpu.utils import StepTimer


class TestArk:
    def test_round_trip(self, tmp_path):
        path = str(tmp_path / "post.ark")
        rng = np.random.default_rng(0)
        mats = {f"utt{i}": rng.normal(size=(5 + i, 4)).astype(np.float32) for i in range(3)}
        with tio.MatrixWriter(path) as w:
            for k, v in mats.items():
                w[k] = v
        back = tio.read_ark_text(path)
        assert back.keys() == mats.keys()
        for k in mats:
            np.testing.assert_allclose(back[k], mats[k], rtol=1e-5)

    def test_rejects_bad_ids(self, tmp_path):
        with tio.MatrixWriter(str(tmp_path / "x.ark")) as w:
            with pytest.raises(ValueError):
                w["bad id"] = np.zeros((2, 2), np.float32)

    def test_malformed_read(self, tmp_path):
        p = tmp_path / "bad.ark"
        p.write_text("1.0 2.0\n")
        with pytest.raises(ValueError):
            tio.read_ark_text(str(p))


class TestDevice:
    def test_select_device(self):
        d = tio.select_device()
        assert d.platform == "cpu"  # conftest forces cpu
        with pytest.raises(RuntimeError):
            tio.select_device("tpu")


class TestStepTimer:
    def test_throughput_accounting(self):
        t = StepTimer(warmup=1, per_chip=False)
        for _ in range(5):
            t.step(2.0)
        s = t.summary()
        assert s["steps"] == 5
        assert s["audio_seconds"] == pytest.approx(8.0)  # 4 counted steps
        assert s["audio_s_per_s_per_chip"] > 0


class TestToolsImport:
    def test_tools_parse(self):
        """tools/ scripts must at least parse (they are run standalone)."""
        import ast
        import pathlib

        for p in pathlib.Path("tools").glob("*.py"):
            ast.parse(p.read_text(), filename=str(p))

    def test_bench_and_entry_parse(self):
        import ast

        ast.parse(open("bench.py").read())
        ast.parse(open("__graft_entry__.py").read())
