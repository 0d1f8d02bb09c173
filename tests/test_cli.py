import json
import os

import numpy as np
import pytest
from PIL import Image

CONFIG = os.path.join(os.path.dirname(__file__), "..", "configs", "vqgan", "smoke.py")


@pytest.fixture(autouse=True)
def dry_run(monkeypatch):
    monkeypatch.setenv("DRY_RUN", "1")


class TestCLI:
    def test_train_then_test_then_val(self, tmp_path, capsys):
        from vector_quantization_tpu.cli import test as test_cli
        from vector_quantization_tpu.cli import train as train_cli
        from vector_quantization_tpu.cli import val as val_cli

        work = str(tmp_path / "work")
        train_cli.main(["smoke", CONFIG, "--work-dir", work])
        ckpt_dir = os.path.join(work, "checkpoints")
        assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)
        assert os.path.exists(os.path.join(work, "run.log"))
        assert os.path.exists(os.path.join(work, "config.json"))

        ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
        test_cli.main(
            ["smoke", CONFIG, "--work-dir", work, "--load-model-from", ckpt]
        )
        out = capsys.readouterr().out
        results = json.loads(out[out.index("{"):])
        assert "codebook_usage" in results and "psnr" in results

        # val daemon: one pass over existing checkpoints then exit
        val_cli.main(
            ["smoke", CONFIG, "--work-dir", work, "--max-idle-rounds", "1"]
        )

    def test_resume_flags(self, tmp_path):
        from vector_quantization_tpu.cli import train as train_cli

        work = str(tmp_path / "work")
        train_cli.main(["smoke", CONFIG, "--work-dir", work])
        # auto-resume: second run starts at the saved step and finishes
        train_cli.main(["smoke", CONFIG, "--work-dir", work, "--auto-resume"])

    def test_tokenize(self, tmp_path):
        from vector_quantization_tpu.cli import tokenize as tok_cli

        work = str(tmp_path / "work")
        tok_cli.main(["smoke", CONFIG, "--work-dir", work])
        token_dir = os.path.join(work, "tokens")
        files = os.listdir(token_dir)
        assert files
        data = np.load(os.path.join(token_dir, files[0]))
        assert data["tokens"].ndim == 3  # (B, h, w)
        assert data["tokens"].dtype == np.int32

    def test_demo(self, tmp_path):
        from vector_quantization_tpu.cli import demo as demo_cli

        img_path = str(tmp_path / "img.png")
        Image.new("RGB", (48, 48), (120, 80, 200)).save(img_path)
        work = str(tmp_path / "work")
        demo_cli.main(
            ["smoke", CONFIG, "--work-dir", work, "--image", img_path]
        )
        assert os.path.exists(os.path.join(work, "demo", "reconstruction.png"))

    def test_fid_cache(self, tmp_path):
        from vector_quantization_tpu.cli import fid as fid_cli

        fid_path = str(tmp_path / "stats.npz")
        fid_cli.main(["smoke", CONFIG, "--fid-path", fid_path])
        data = np.load(fid_path)
        assert data["mean"].shape == (2048,)

    def test_config_options_and_override(self, tmp_path):
        from vector_quantization_tpu.cli.common import build_parser, prepare

        args = build_parser("t").parse_args(
            [
                "smoke",
                CONFIG,
                "--override",
                "trainer.max_iters=7",
                "trainer.algorithm.optimizer.lr=0.5",
            ]
        )
        cfg = prepare(args)
        assert cfg.trainer.max_iters == 7
        assert cfg.trainer.algorithm.optimizer.lr == 0.5
