"""End-to-end golden-number harness test (tools/golden_eval.py).

Exercises the reference's de-facto regression workflow
(``/root/reference/docs/pretrained_models.md:44-51``): synthesize a
taming-layout torch checkpoint, convert → graft → validate → compare
against a golden metric dict. The numbers themselves are arbitrary (random
weights); what this proves is that the *pipeline* produces a stable metric
dict and that the tolerance gate passes on agreement and fails on drift.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_golden_eval():
    spec = importlib.util.spec_from_file_location(
        "golden_eval", os.path.join(REPO, "tools", "golden_eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


CONFIG = """
_base_ = ["{repo}/configs/datasets/synthetic.py", "{repo}/configs/strategies/dp.py"]

_model = dict(
    type="AutoencoderModel",
    encoder=dict(type="VQGANEncoder", width=32, width_mults=(1, 2),
                 depth_mult=2, out_channels=8),
    post_encode=dict(type="ConvConnector", out_channels=8),
    quantizer=dict(type="VectorQuantizer", codebook_size=16,
                   embedding_dim=8,
                   losses=dict(vqgan=dict(beta=0.25))),
    pre_decode=dict(type="ConvConnector", out_channels=8),
    decoder=dict(type="VQGANDecoder", width=32, width_mults=(2, 1),
                 depth_mult=3, in_channels=8),
)

validator = dict(
    type="Validator",
    dataloader=dict(batch_size=8),
    dataset=dict(image_size=32, size=8),
    algorithm=dict(
        type="VQGANAlgorithm",
        model=_model,
        discriminator=dict(type="PatchGANDiscriminator", width=16, depth=2),
        optimizer=dict(type="adam", lr=1e-4),
        recon_losses=dict(l1=dict(), mse=dict()),
    ),
    metrics=dict(
        codebook_usage=dict(type="CodebookUsageMetric", codebook_size=16),
        codebook_ppl=dict(type="CodebookPPLMetric", codebook_size=16),
        l1=dict(type="ImageLossMetric", kind="l1"),
        mse=dict(type="ImageLossMetric", kind="mse"),
        psnr=dict(type="ImageLossMetric", kind="psnr"),
        ssim=dict(type="ImageLossMetric", kind="ssim"),
    ),
)
"""


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    from tests.test_parity_torch import _TmVQGAN

    tmp = tmp_path_factory.mktemp("golden")
    ckpt = tmp / "tiny_taming.pth"
    torch.manual_seed(0)
    torch.save({"state_dict": _TmVQGAN().state_dict()}, str(ckpt))
    cfg = tmp / "eval_config.py"
    cfg.write_text(CONFIG.format(repo=REPO))
    return _load_golden_eval(), str(ckpt), str(cfg), tmp


def _run(mod, ckpt, cfg, tmp, extra):
    return mod.main(
        [
            "taming_vqgan",
            "--checkpoint", ckpt,
            "--config", cfg,
            "--work-dir", str(tmp / "work"),
            "--converter-options", "width=32", "enc_width_mults=(1, 2)",
            "enc_depth=2", "dec_depth=3",
        ]
        + extra
    )


class TestGoldenEval:
    def test_fails_against_reference_golden(self, harness, capsys):
        """Random weights cannot hit the published taming numbers — the
        gate must FAIL (proves the comparison actually bites)."""
        mod, ckpt, cfg, tmp = harness
        rc = _run(mod, ckpt, cfg, tmp, [])
        out = capsys.readouterr().out
        assert rc == 1
        assert "FAIL" in out
        # FID metric not in this config → reported as missing, not crash
        assert "fid" in out

    def test_passes_against_measured_golden(self, harness, capsys):
        """Re-running against its own measured numbers passes — the metric
        pipeline is deterministic and the tolerance gate is sound."""
        mod, ckpt, cfg, tmp = harness
        _run(mod, ckpt, cfg, tmp, [])
        first = capsys.readouterr().out
        # the metric dict is the first (flat) JSON object in the output
        measured = json.loads(first[first.index("{"): first.index("}") + 1])
        golden = {
            k.rsplit("/", 1)[-1]: v
            for k, v in measured.items()
            if k.rsplit("/", 1)[-1] in mod.DEFAULT_TOL
        }
        rc = _run(
            mod, ckpt, cfg, tmp, ["--golden", json.dumps(golden)]
        )
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "FAIL" not in out

    def test_publish(self, harness, tmp_path, monkeypatch, capsys):
        """--publish records measured metrics into BASELINE.json."""
        mod, ckpt, cfg, tmp = harness
        baseline = tmp_path / "BASELINE.json"
        baseline.write_text(json.dumps({"published": {}}))

        def fake_publish(family, results, args, _path=str(baseline)):
            with open(_path) as f:
                data = json.load(f)
            data["published"][family] = {
                "checkpoint": os.path.basename(args.checkpoint),
                "config": args.config,
                "metrics": {k: float(v) for k, v in results.items()},
            }
            with open(_path, "w") as f:
                json.dump(data, f)

        monkeypatch.setattr(mod, "publish", fake_publish)
        rc = _run(mod, ckpt, cfg, tmp, ["--publish"])
        capsys.readouterr()
        assert rc in (0, 1)
        data = json.loads(baseline.read_text())
        assert "taming_vqgan" in data["published"]
        assert data["published"]["taming_vqgan"]["metrics"]
