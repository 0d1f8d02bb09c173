"""Tool-script coverage (reference tools/ surface, SURVEY §2.7)."""

import json
import os
import runpy
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run_tool(name, argv, timeout=300):
    """Run a tool in-process (fast; conftest's CPU config applies)."""
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(REPO, "tools", name), run_name="__main__")
    finally:
        sys.argv = old


class TestModelEMA:
    def test_extracts_ema_params(self, tmp_path, capsys):
        import orbax.checkpoint as ocp

        ckpt = {
            "params": {"w": np.ones(3, np.float32)},
            "extra": {"ema_params": {"w": np.full(3, 0.5, np.float32)}},
        }
        src = tmp_path / "iter_10"
        out = tmp_path / "ema"
        with ocp.StandardCheckpointer() as saver:
            saver.save(str(src), ckpt)
        _run_tool("model_ema.py", [str(src), str(out)])
        with ocp.StandardCheckpointer() as saver:
            restored = saver.restore(str(out))
        np.testing.assert_allclose(restored["params"]["w"], 0.5)

    def test_missing_ema_errors(self, tmp_path):
        import orbax.checkpoint as ocp

        src = tmp_path / "iter_10"
        with ocp.StandardCheckpointer() as saver:
            saver.save(str(src), {"params": {"w": np.ones(2, np.float32)}})
        with pytest.raises(SystemExit):
            _run_tool("model_ema.py", [str(src), str(tmp_path / "o")])


class TestLogToTensorboard:
    def test_parses_iter_lines(self, tmp_path):
        log = tmp_path / "run.log"
        log.write_text(
            "2026 INFO Iter [1/10] ETA 00:01:00 loss=1.5 aglw=0.8\n"
            "junk line\n"
            "2026 INFO Iter [2/10] ETA 00:00:30 loss=1.25 aglw=0.9\n"
        )
        out = tmp_path / "tb"
        _run_tool("convert_log_to_tensorboard.py", [str(log), str(out)])
        files = os.listdir(out)
        assert any("tfevents" in f for f in files)


class TestBenchServingTiny:
    def test_cpu_smoke(self, capsys):
        _run_tool(
            "bench_serving.py",
            ["--tiny", "--requests", "4", "--slots", "4", "--no-cfg",
             "--steps-per-sync", "2", "--image-tokens", "6"],
        )
        out = capsys.readouterr().out.strip().splitlines()[-1]
        data = json.loads(out)
        assert data["tokens_per_s"] > 0
        assert data["requests"] == 4
