#!/usr/bin/env python
"""Pretrained-dependency manifest + conversion driver.

The reference downloads these in ``tools/prepare_checkpoints.py:31-60`` /
``docs/pretrained_models.md:5-41``. This environment has no egress, so this
script only (a) lists what to fetch and where to put it, and (b) converts
everything it finds under ``--src-dir`` via tools/convert_weights.py.

Expected files under --src-dir:
  pt_inception-2015-12-05-6726825d.pth     (pytorch-fid inception)
  vgg16-397923af.pth                       (torchvision VGG16)
  vgg.pth / vgg.pth.converted              (LPIPS lin weights)
  vqgan_imagenet_f16_16384/last.ckpt       (taming-transformers VQGAN)
  ViT-B-16.pt                              (OpenAI CLIP)
  dino_vitbase16_pretrain.pth              (DINO ViT-B/16)
  mae_pretrain_vit_base.pth                (MAE ViT-B/16)
  gpt2/pytorch_model.bin                   (HF GPT-2)
  vqkd_encoder_base_...beit_v2.pth         (BEiT-v2 VQ-KD)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

KNOWN = {
    "pt_inception-2015-12-05-6726825d.pth": ("pt_inception", "inception"),
    "vgg16-397923af.pth": ("vgg16_lpips", "lpips"),
    "ViT-B-16.pt": ("clip_visual", "clip_b16"),
    "pytorch_model.bin": ("gpt2", "gpt2"),
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src-dir", default="downloads")
    p.add_argument("--out-dir", default="pretrained")
    args = p.parse_args()

    if not os.path.isdir(args.src_dir):
        print(__doc__)
        print(f"(source dir {args.src_dir!r} not found — nothing converted)")
        return

    converter = os.path.join(os.path.dirname(__file__), "convert_weights.py")
    for root, _, files in os.walk(args.src_dir):
        for f in files:
            if f not in KNOWN:
                continue
            kind, out_name = KNOWN[f]
            cmd = [
                sys.executable,
                converter,
                kind,
                "--src",
                os.path.join(root, f),
                "--out",
                os.path.join(args.out_dir, out_name),
            ]
            if kind == "vgg16_lpips":
                lin = os.path.join(args.src_dir, "vgg.pth.converted")
                if os.path.exists(lin):
                    cmd += ["--lin", lin]
            print("+", " ".join(cmd))
            subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
