#!/usr/bin/env python
"""Convert reference/pretrained torch checkpoints into this framework's
orbax param trees.

The analogue of the reference's ``tools/convert_checkpoints.py`` (+ the
download list in ``tools/prepare_checkpoints.py`` / docs/pretrained_models.md):

    python tools/convert_weights.py vgg16_lpips --src vgg16.pth \
        --lin vgg.pth.converted --out pretrained/lpips
    python tools/convert_weights.py pt_inception --src pt_inception.pth \
        --out pretrained/inception
    python tools/convert_weights.py taming_vqgan --src last.ckpt \
        --out pretrained/vqgan_f16_16384 [--check CONFIG]
    python tools/convert_weights.py clip_visual --src ViT-B-16.pt --out ...
    python tools/convert_weights.py gpt2 --src pytorch_model.bin --out ...
    python tools/convert_weights.py hf_llama --src consolidated.pth --out ...

``--check CONFIG`` builds the model from the config and verifies the
converted tree merges onto it exactly (the reference's round-trip check,
convert_checkpoints.py:60-80).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vector_quantization_tpu.utils.converters import (  # noqa: E402
    convert_clip_visual,
    convert_gpt2,
    convert_hf_llama,
    convert_pt_inception,
    convert_taming_vqgan,
    convert_vgg16_lpips,
    load_torch_state_dict,
)


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def check_against_config(params, config_path: str) -> None:
    import jax
    import jax.numpy as jnp

    from vector_quantization_tpu import algorithms  # noqa: F401
    from vector_quantization_tpu.registries import ModelRegistry
    from vector_quantization_tpu.utils.config import load_config

    cfg = load_config(config_path)
    model_cfg = cfg["trainer"]["algorithm"]["model"]
    model = ModelRegistry.build(model_cfg)
    image_size = cfg["trainer"].get("dataset", {}).get("image_size", 256)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 3), jnp.float32),
    )["params"]
    t_shapes = _tree_shapes(template)
    c_shapes = _tree_shapes(params)
    missing = sorted(set(t_shapes) - set(c_shapes))
    extra_keys = sorted(set(c_shapes) - set(t_shapes))
    mismatched = sorted(
        k
        for k in set(t_shapes) & set(c_shapes)
        if t_shapes[k] != c_shapes[k]
    )
    if missing:
        print(f"MISSING ({len(missing)}):", *missing[:20], sep="\n  ")
    if extra_keys:
        print(f"EXTRA ({len(extra_keys)}):", *extra_keys[:20], sep="\n  ")
    if mismatched:
        print(f"SHAPE MISMATCH ({len(mismatched)}):")
        for k in mismatched[:20]:
            print(f"  {k}: model {t_shapes[k]} vs converted {c_shapes[k]}")
    if not (missing or mismatched):
        print("check OK: converted tree matches the model")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "kind",
        choices=[
            "vgg16_lpips",
            "pt_inception",
            "taming_vqgan",
            "clip_visual",
            "gpt2",
            "hf_llama",
        ],
    )
    p.add_argument("--src", required=True)
    p.add_argument("--lin", default=None, help="LPIPS lin weights (.pth)")
    p.add_argument("--out", required=True)
    p.add_argument("--check", default=None, help="config to verify against")
    args = p.parse_args()

    sd = load_torch_state_dict(args.src)
    batch_stats = None
    if args.kind == "vgg16_lpips":
        lin = load_torch_state_dict(args.lin) if args.lin else None
        params = convert_vgg16_lpips(sd, lin)
    elif args.kind == "pt_inception":
        params, batch_stats = convert_pt_inception(sd)
    elif args.kind == "taming_vqgan":
        params = convert_taming_vqgan(sd)
    elif args.kind == "clip_visual":
        params = convert_clip_visual(sd)
    elif args.kind == "gpt2":
        params = convert_gpt2(sd)
    else:
        params = convert_hf_llama(sd)

    if args.check:
        check_against_config(params, args.check)

    import orbax.checkpoint as ocp

    payload = {"params": params}
    if batch_stats:
        payload["batch_stats"] = batch_stats
    with ocp.StandardCheckpointer() as saver:
        saver.save(os.path.abspath(args.out), payload, force=True)
    print(f"saved converted params to {args.out}")


if __name__ == "__main__":
    main()
