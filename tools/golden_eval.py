#!/usr/bin/env python
"""Golden-number regression harness: converted checkpoint → val → Δ vs golden.

The reference's de-facto regression suite is "convert an upstream checkpoint,
run ``vq.test``, compare against the recorded metric dict"
(``/root/reference/docs/pretrained_models.md:44-51``,
``tools/convert_checkpoints.py:25-80``). This tool is that workflow end to
end, with the comparison made explicit and machine-checkable:

    python tools/golden_eval.py taming_vqgan --checkpoint last.ckpt \
        --config configs/vqgan/16384_imagenet_ddp.py \
        [--config-options k=v ...] [--tol-fid 0.1] [--publish]

    python tools/golden_eval.py beit_vqkd --checkpoint vqkd.pth \
        --config configs/vqkd/clip_8192_imagenet_ddp.py

Steps:

1. load the torch checkpoint and run the matching weight converter
   (numerical converter parity is proven by ``tests/test_parity_torch.py``);
2. build the config's ``validator`` and graft the converted params onto the
   freshly-initialised state (strict=False merge, reference semantics);
3. run validation, print the metric dict;
4. diff against the golden values (built-in table below = the reference's
   published numbers, overridable with ``--golden JSON``), exit non-zero if
   any metric is outside tolerance (rFID budget 0.1 per the north star);
5. with ``--publish``, record the measured numbers into
   ``BASELINE.json["published"]`` with provenance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Golden metric dicts for converted upstream checkpoints, keyed by family.
# Values: /root/reference/docs/pretrained_models.md:48 (taming VQGAN f16
# 16384 on ImageNet-1k val 256px) and :51 (BEiT-v2 VQ-KD CLIP-B/16 8192).
GOLDEN = {
    "taming_vqgan": {
        "fid": 4.9808,
        "lpips": 0.28323,
        "l1": 0.06812,
        "mse": 0.013180,
        "psnr": 19.9704,
        "ssim": 0.50234,
        "codebook_usage": 0.059326,
        "codebook_ppl": 6.8124,
    },
    "beit_vqkd": {
        "r_loss": 0.16431,
        "codebook_usage": 1.0,
        "codebook_ppl": 8.9482,
    },
}

# Per-metric absolute tolerances. FID gets the north star's 0.1 budget;
# bounded [0,1]-ish metrics get 5e-3; PSNR (dB) 0.05; PPL 0.05.
DEFAULT_TOL = {
    "fid": 0.1,
    "lpips": 5e-3,
    "l1": 2e-3,
    "mse": 5e-4,
    "psnr": 0.05,
    "ssim": 5e-3,
    "codebook_usage": 5e-3,
    "codebook_ppl": 0.05,
    "r_loss": 2e-3,
}


def convert(family: str, checkpoint: str, options: dict) -> dict:
    from vector_quantization_tpu.utils import converters as C

    sd = C.load_torch_state_dict(checkpoint)
    if family == "taming_vqgan":
        kwargs = {
            k: options[k]
            for k in ("width", "enc_width_mults", "enc_depth", "dec_depth")
            if k in options
        }
        return {"generator": C.convert_taming_vqgan(sd, **kwargs)}
    if family == "beit_vqkd":
        return C.convert_beit_vqkd(sd)
    raise SystemExit(f"unknown family {family!r}")


def graft(state, converted: dict):
    """strict=False merge of the converted tree over the state's params,
    re-placed on the params' shardings (sharded FSDP/TP configs would
    otherwise lose placement — ADVICE r2)."""
    from vector_quantization_tpu.training.checkpoints import merge_params

    params = state.params
    if "generator" not in params and "generator" in converted:
        converted = converted["generator"]
    return state.replace(params=merge_params(params, converted))


def compare(
    results: dict, golden: dict, tols: dict
) -> list[tuple[str, float, float, float, bool]]:
    rows = []
    for key, want in golden.items():
        got = None
        for rkey, rval in results.items():
            # metric names come out namespaced ("l1/l1", "fid") — match on
            # the trailing path component
            if rkey == key or rkey.rsplit("/", 1)[-1] == key:
                got = float(rval)
                break
        if got is None:
            rows.append((key, want, float("nan"), float("nan"), False))
            continue
        tol = tols.get(key, 0.01)
        rows.append((key, want, got, got - want, abs(got - want) <= tol))
    return rows


def publish(family: str, results: dict, args) -> None:
    root = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(root, "BASELINE.json")
    with open(path) as f:
        baseline = json.load(f)
    entry = {
        "checkpoint": os.path.basename(args.checkpoint),
        "config": args.config,
        "metrics": {k: float(v) for k, v in results.items()},
    }
    baseline.setdefault("published", {})[family] = entry
    with open(path, "w") as f:
        json.dump(baseline, f, indent=1)
    print(f"published {family} metrics to BASELINE.json")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("family", choices=sorted(GOLDEN))
    p.add_argument("--checkpoint", required=True, help="torch .pth/.ckpt")
    p.add_argument("--config", required=True, help="config with a validator")
    p.add_argument("--config-options", nargs="*", default=[])
    p.add_argument("--override", nargs="*", default=[])
    p.add_argument(
        "--golden", default=None,
        help="JSON file or inline JSON overriding the built-in golden table",
    )
    p.add_argument(
        "--tol", default=None,
        help="JSON mapping metric→abs tolerance (merged over defaults)",
    )
    p.add_argument("--work-dir", default=None)
    p.add_argument("--publish", action="store_true")
    p.add_argument(
        "--converter-options", nargs="*", default=[],
        help="k=v options forwarded to the weight converter (width, ...)",
    )
    args = p.parse_args(argv)

    from vector_quantization_tpu.cli.common import parse_kv, prepare
    from vector_quantization_tpu.parallel.mesh import init_distributed
    from vector_quantization_tpu.training.runner import build_runner

    init_distributed()
    ns = argparse.Namespace(
        name=f"golden_{args.family}",
        config=args.config,
        config_options=args.config_options,
        override=args.override,
    )
    config = prepare(ns)
    validator = build_runner(config, "validator")
    if args.work_dir:
        validator.work_dir = args.work_dir

    converted = convert(
        args.family, args.checkpoint, parse_kv(args.converter_options)
    )
    validator.init_state()
    validator.state = graft(validator.state, converted)

    results = validator.run()
    print(json.dumps({k: float(v) for k, v in results.items()}, indent=2))

    golden = dict(GOLDEN[args.family])
    if args.golden:
        if os.path.exists(args.golden):
            with open(args.golden) as f:
                golden = json.load(f)
        else:
            golden = json.loads(args.golden)
    tols = dict(DEFAULT_TOL)
    if args.tol:
        tols.update(json.loads(args.tol))

    rows = compare(results, golden, tols)
    ok = True
    print(f"{'metric':<16}{'golden':>12}{'measured':>12}{'delta':>12}  ok")
    for key, want, got, delta, good in rows:
        ok &= good
        print(f"{key:<16}{want:>12.5f}{got:>12.5f}{delta:>+12.5f}  "
              f"{'PASS' if good else 'FAIL'}")
    if args.publish:
        publish(args.family, results, args)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
