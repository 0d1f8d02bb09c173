"""torch → flax weight converters.

The analogue of the reference's ``tools/convert_checkpoints.py:25-80`` (which
converts taming-transformers / LPIPS / BEiT-v2 checkpoints into its own
layout): these functions map torch state dicts onto this framework's flax
param trees, enabling golden-number validation against the reference's
published metrics (SURVEY §6).

Conventions: torch convs are OIHW → flax HWIO; torch Linear weights are
(out, in) → flax (in, out); BatchNorm running stats go to ``batch_stats``.
All converters take a flat ``{name: np.ndarray}`` dict (load ``.pth`` with
``torch.load(..., map_location='cpu')`` and call ``numpy()``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "convert_vgg16_lpips",
    "convert_pt_inception",
    "convert_taming_vqgan",
    "convert_clip_visual",
    "convert_gpt2",
    "convert_hf_llama",
    "convert_beit_vqkd",
]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "module"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return {
        k: v.detach().numpy()
        for k, v in sd.items()
        if hasattr(v, "detach")
    }


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w: np.ndarray) -> np.ndarray:
    """(out, in) → (in, out)."""
    return np.transpose(w)


# ---------------------------------------------------------------------------
# LPIPS: torchvision vgg16 features + converted lin weights
# ---------------------------------------------------------------------------

_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_vgg16_lpips(
    vgg_sd: Mapping[str, np.ndarray],
    lin_sd: Mapping[str, np.ndarray] | None = None,
) -> dict:
    """torchvision ``vgg16`` ``features.N.weight/bias`` + the reference's
    converted LPIPS lin convs (``pretrained/lpips/vgg.pth.converted``:
    ``{i}.weight`` of Conv2d(C,1,1,bias=False)) → LPIPS module params."""
    params: dict[str, Any] = {"vgg": {}}
    for i, idx in enumerate(_VGG16_CONV_IDX):
        params["vgg"][f"conv{i}"] = {
            "kernel": _conv(vgg_sd[f"features.{idx}.weight"]),
            "bias": vgg_sd[f"features.{idx}.bias"],
        }
    if lin_sd is not None:
        for i in range(5):
            key = f"{i}.weight" if f"{i}.weight" in lin_sd else f"lins.{i}.weight"
            params[f"lin{i}"] = {"kernel": _conv(lin_sd[key])}
    return params


# ---------------------------------------------------------------------------
# pytorch-fid InceptionV3 ("pt_inception" weights)
# ---------------------------------------------------------------------------


def convert_pt_inception(sd: Mapping[str, np.ndarray]) -> tuple[dict, dict]:
    """pt_inception state dict → (params, batch_stats) for
    InceptionV3Features. Names match module-for-module
    (``Mixed_5b.branch1x1.conv.weight`` → ``Mixed_5b/branch1x1/conv``)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for name, value in sd.items():
        parts = name.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            set_in(params, parts[:-1] + ["kernel"], _conv(value))
        elif parts[-2] == "bn":
            if parts[-1] == "weight":
                set_in(params, parts[:-1] + ["scale"], value)
            elif parts[-1] == "bias":
                set_in(params, parts[:-1] + ["bias"], value)
            elif parts[-1] == "running_mean":
                set_in(stats, parts[:-1] + ["mean"], value)
            elif parts[-1] == "running_var":
                set_in(stats, parts[:-1] + ["var"], value)
        # fc / AuxLogits are unused by the feature extractor
    return params, stats


# ---------------------------------------------------------------------------
# taming-transformers VQGAN → AutoencoderModel(VQGANEncoder/Decoder)
# ---------------------------------------------------------------------------


def _gn(sd, prefix):
    return {
        "GroupNorm_0": {
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
        }
    }


def _resblock(sd, prefix, has_shortcut):
    out = {
        "GroupNorm32_0": _gn(sd, f"{prefix}.norm1"),
        "conv1": {
            "kernel": _conv(sd[f"{prefix}.conv1.weight"]),
            "bias": sd[f"{prefix}.conv1.bias"],
        },
        "GroupNorm32_1": _gn(sd, f"{prefix}.norm2"),
        "conv2": {
            "kernel": _conv(sd[f"{prefix}.conv2.weight"]),
            "bias": sd[f"{prefix}.conv2.bias"],
        },
    }
    if has_shortcut:
        out["shortcut"] = {
            "kernel": _conv(sd[f"{prefix}.nin_shortcut.weight"]),
            "bias": sd[f"{prefix}.nin_shortcut.bias"],
        }
    return out


def _attnblock(sd, prefix):
    # taming q/k/v/proj_out are 1x1 convs (C, C, 1, 1) → fused qkv Dense
    q = sd[f"{prefix}.q.weight"][:, :, 0, 0]
    k = sd[f"{prefix}.k.weight"][:, :, 0, 0]
    v = sd[f"{prefix}.v.weight"][:, :, 0, 0]
    qkv_w = np.concatenate([_lin(q), _lin(k), _lin(v)], axis=1)  # (C, 3C)
    qkv_b = np.concatenate(
        [sd[f"{prefix}.q.bias"], sd[f"{prefix}.k.bias"], sd[f"{prefix}.v.bias"]]
    )
    proj = sd[f"{prefix}.proj_out.weight"][:, :, 0, 0]
    return {
        "GroupNorm32_0": _gn(sd, f"{prefix}.norm"),
        "qkv": {"kernel": qkv_w, "bias": qkv_b},
        "proj": {
            "kernel": _lin(proj),
            "bias": sd[f"{prefix}.proj_out.bias"],
        },
    }


def _taming_half(
    sd: Mapping[str, np.ndarray],
    prefix: str,
    num_levels: int,
    depth: int,
    attention_layer: int | None,
    widths: list[int],
    decoder: bool,
) -> dict:
    backbone: dict[str, Any] = {
        "conv_in": {
            "kernel": _conv(sd[f"{prefix}.conv_in.weight"]),
            "bias": sd[f"{prefix}.conv_in.bias"],
        },
        "refine": {
            "res1": _resblock(sd, f"{prefix}.mid.block_1", False),
            "attn": _attnblock(sd, f"{prefix}.mid.attn_1"),
            "res2": _resblock(sd, f"{prefix}.mid.block_2", False),
        },
        "GroupNorm32_0": _gn(sd, f"{prefix}.norm_out"),
        "proj_out": {
            "kernel": _conv(sd[f"{prefix}.conv_out.weight"]),
            "bias": sd[f"{prefix}.conv_out.bias"],
        },
    }
    updown = "up" if decoder else "down"
    for i in range(num_levels):
        # taming decoder indexes up.{level} by resolution: up[num-1] runs
        # first; our decoder layer i corresponds to taming level num-1-i
        t = (num_levels - 1 - i) if decoder else i
        in_w = widths[i]
        for d in range(depth):
            blk_in = in_w if d > 0 else widths[max(i - 1, 0)] if i else None
            prefix_b = f"{prefix}.{updown}.{t}.block.{d}"
            has_shortcut = f"{prefix_b}.nin_shortcut.weight" in sd
            backbone[f"layer{i}_res{d}"] = _resblock(
                sd, prefix_b, has_shortcut
            )
            if attention_layer == i:
                backbone[f"layer{i}_attn{d}"] = _attnblock(
                    sd, f"{prefix}.{updown}.{t}.attn.{d}"
                )
        if i < num_levels - 1:
            if decoder:
                backbone[f"up{i}"] = {
                    "Conv_0": {
                        "kernel": _conv(
                            sd[f"{prefix}.up.{t}.upsample.conv.weight"]
                        ),
                        "bias": sd[f"{prefix}.up.{t}.upsample.conv.bias"],
                    }
                }
            else:
                backbone[f"down{i}"] = {
                    "Conv_0": {
                        "kernel": _conv(
                            sd[f"{prefix}.down.{t}.downsample.conv.weight"]
                        ),
                        "bias": sd[f"{prefix}.down.{t}.downsample.conv.bias"],
                    }
                }
    return {"backbone": backbone}


def convert_taming_vqgan(
    sd: Mapping[str, np.ndarray],
    *,
    width: int = 128,
    enc_width_mults: tuple[int, ...] = (1, 1, 2, 2, 4),
    enc_depth: int = 2,
    dec_depth: int = 3,
) -> dict:
    """taming-transformers VQGAN checkpoint → AutoencoderModel params
    (encoder/decoder/quantizer/post_encode/pre_decode).

    The reference validates its converted checkpoints against
    docs/pretrained_models.md:48 (rFID 4.98 etc.) — same role here.
    """
    n = len(enc_width_mults)
    enc_widths = [width * m for m in enc_width_mults]
    dec_widths = list(reversed(enc_widths))
    params: dict[str, Any] = {}
    params["encoder"] = _taming_half(
        sd, "encoder", n, enc_depth, n - 1, enc_widths, decoder=False
    )
    params["decoder"] = _taming_half(
        sd, "decoder", n, dec_depth, 0, dec_widths, decoder=True
    )
    params["quantizer"] = {"codebook": sd["quantize.embedding.weight"]}
    if "quant_conv.weight" in sd:
        params["post_encode"] = {
            "Conv_0": {
                "kernel": _conv(sd["quant_conv.weight"]),
                "bias": sd["quant_conv.bias"],
            }
        }
    if "post_quant_conv.weight" in sd:
        params["pre_decode"] = {
            "Conv_0": {
                "kernel": _conv(sd["post_quant_conv.weight"]),
                "bias": sd["post_quant_conv.bias"],
            }
        }
    return params


# ---------------------------------------------------------------------------
# CLIP visual tower → CLIPTeacher
# ---------------------------------------------------------------------------


def convert_clip_visual(
    sd: Mapping[str, np.ndarray], num_heads: int | None = None
) -> dict:
    """OpenAI CLIP ``visual.*`` weights → CLIPTeacher backbone params."""
    v = {
        k[len("visual."):]: val
        for k, val in sd.items()
        if k.startswith("visual.")
    } or dict(sd)
    bb: dict[str, Any] = {
        "patch_embed": {"kernel": _conv(v["conv1.weight"])},
        "cls_token": v["class_embedding"].reshape(1, 1, -1),
        "pos_embed": v["positional_embedding"][None],
        "ln_pre": {
            "scale": v["ln_pre.weight"], "bias": v["ln_pre.bias"]
        },
        "ln_post": {
            "scale": v["ln_post.weight"], "bias": v["ln_post.bias"]
        },
    }
    if "proj" in v:
        bb["proj"] = v["proj"]
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in v:
        p = f"transformer.resblocks.{i}"
        d = v[f"{p}.ln_1.weight"].shape[0]
        in_proj_w = v[f"{p}.attn.in_proj_weight"]  # (3d, d)
        in_proj_b = v[f"{p}.attn.in_proj_bias"]
        wq, wk, wv = np.split(in_proj_w, 3, axis=0)
        bq, bk, bv = np.split(in_proj_b, 3, axis=0)
        heads = num_heads or _clip_num_heads(d)
        dh = d // heads

        def mh(w, b):
            return {
                "kernel": _lin(w).reshape(d, heads, dh),
                "bias": b.reshape(heads, dh),
            }

        bb[f"block{i}_norm1"] = {
            "scale": v[f"{p}.ln_1.weight"], "bias": v[f"{p}.ln_1.bias"]
        }
        bb[f"block{i}_attn"] = {
            "query": mh(wq, bq),
            "key": mh(wk, bk),
            "value": mh(wv, bv),
            "out": {
                "kernel": _lin(v[f"{p}.attn.out_proj.weight"]).reshape(
                    heads, dh, d
                ),
                "bias": v[f"{p}.attn.out_proj.bias"],
            },
        }
        bb[f"block{i}_norm2"] = {
            "scale": v[f"{p}.ln_2.weight"], "bias": v[f"{p}.ln_2.bias"]
        }
        bb[f"block{i}_fc1"] = {
            "kernel": _lin(v[f"{p}.mlp.c_fc.weight"]),
            "bias": v[f"{p}.mlp.c_fc.bias"],
        }
        bb[f"block{i}_fc2"] = {
            "kernel": _lin(v[f"{p}.mlp.c_proj.weight"]),
            "bias": v[f"{p}.mlp.c_proj.bias"],
        }
        i += 1
    return {"backbone": bb}


def _clip_num_heads(d: int) -> int:
    return {768: 12, 1024: 16, 1280: 16}.get(d, max(1, d // 64))


# ---------------------------------------------------------------------------
# HF GPT-2 / Llama → GPT2Transformer / LlamaTransformer
# ---------------------------------------------------------------------------


def convert_gpt2(sd: Mapping[str, np.ndarray]) -> dict:
    """HF GPT-2 (``transformer.*`` or bare) → GPT2Transformer params.
    Note: HF GPT-2 Conv1D stores weights (in, out) — no transpose."""
    g = {
        k[len("transformer."):]: val
        for k, val in sd.items()
        if k.startswith("transformer.")
    } or dict(sd)
    params: dict[str, Any] = {
        "wte": g["wte.weight"],
        "wpe": g["wpe.weight"],
        "ln_f": {"scale": g["ln_f.weight"], "bias": g["ln_f.bias"]},
    }
    i = 0
    while f"h.{i}.ln_1.weight" in g:
        p = f"h.{i}"
        params[f"h{i}"] = {
            "ln_1": {"scale": g[f"{p}.ln_1.weight"], "bias": g[f"{p}.ln_1.bias"]},
            "c_attn": {
                "kernel": g[f"{p}.attn.c_attn.weight"],
                "bias": g[f"{p}.attn.c_attn.bias"],
            },
            "c_proj": {
                "kernel": g[f"{p}.attn.c_proj.weight"],
                "bias": g[f"{p}.attn.c_proj.bias"],
            },
            "ln_2": {"scale": g[f"{p}.ln_2.weight"], "bias": g[f"{p}.ln_2.bias"]},
            "mlp_fc": {
                "kernel": g[f"{p}.mlp.c_fc.weight"],
                "bias": g[f"{p}.mlp.c_fc.bias"],
            },
            "mlp_proj": {
                "kernel": g[f"{p}.mlp.c_proj.weight"],
                "bias": g[f"{p}.mlp.c_proj.bias"],
            },
        }
        i += 1
    return params


def convert_hf_llama(sd: Mapping[str, np.ndarray]) -> dict:
    """HF LlamaForCausalLM → LlamaTransformer params."""
    m = {
        k[len("model."):]: val for k, val in sd.items() if k.startswith("model.")
    } or dict(sd)
    params: dict[str, Any] = {
        "embedding": m["embed_tokens.weight"],
        "final_norm": {"scale": m["norm.weight"]},
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = _lin(sd["lm_head.weight"])
    i = 0
    while f"layers.{i}.input_layernorm.weight" in m:
        p = f"layers.{i}"
        params[f"layer{i}"] = {
            "input_norm": {"scale": m[f"{p}.input_layernorm.weight"]},
            "q_proj": {"kernel": _lin(m[f"{p}.self_attn.q_proj.weight"])},
            "k_proj": {"kernel": _lin(m[f"{p}.self_attn.k_proj.weight"])},
            "v_proj": {"kernel": _lin(m[f"{p}.self_attn.v_proj.weight"])},
            "o_proj": {"kernel": _lin(m[f"{p}.self_attn.o_proj.weight"])},
            "post_norm": {
                "scale": m[f"{p}.post_attention_layernorm.weight"]
            },
            "gate_proj": {"kernel": _lin(m[f"{p}.mlp.gate_proj.weight"])},
            "up_proj": {"kernel": _lin(m[f"{p}.mlp.up_proj.weight"])},
            "down_proj": {"kernel": _lin(m[f"{p}.mlp.down_proj.weight"])},
        }
        i += 1
    return params


# ---------------------------------------------------------------------------
# BEiT-v2 VQ-KD checkpoint → ViTEncoder/ViTDecoder/quantizer
# ---------------------------------------------------------------------------


def _beit_vit(sd: Mapping[str, np.ndarray], prefix: str, task_prefix: str) -> dict:
    """One BEiT ViT half (upstream keys ``{prefix}.patch_embed.proj...`` +
    top-level ``{task_prefix}.{0,2}`` task layer) → _ViTBackbone params."""
    bb: dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv(sd[f"{prefix}.patch_embed.proj.weight"]),
            "bias": sd[f"{prefix}.patch_embed.proj.bias"],
        },
        "cls_token": sd[f"{prefix}.cls_token"],
        "pos_embed": sd[f"{prefix}.pos_embed"],
        "fc_norm": {
            "scale": sd[f"{prefix}.fc_norm.weight"],
            "bias": sd[f"{prefix}.fc_norm.bias"],
        },
        "task1": {
            "kernel": _lin(sd[f"{task_prefix}.0.weight"]),
            "bias": sd[f"{task_prefix}.0.bias"],
        },
        "task2": {
            "kernel": _lin(sd[f"{task_prefix}.2.weight"]),
            "bias": sd[f"{task_prefix}.2.bias"],
        },
    }
    i = 0
    while f"{prefix}.blocks.{i}.norm1.weight" in sd:
        p = f"{prefix}.blocks.{i}"
        bb[f"block{i}"] = {
            "norm1": {
                "scale": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]
            },
            "attn": {
                "qkv_kernel": _lin(sd[f"{p}.attn.qkv.weight"]),
                "q_bias": sd[f"{p}.attn.q_bias"],
                "v_bias": sd[f"{p}.attn.v_bias"],
                "proj": {
                    "kernel": _lin(sd[f"{p}.attn.proj.weight"]),
                    "bias": sd[f"{p}.attn.proj.bias"],
                },
            },
            "norm2": {
                "scale": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]
            },
            "fc1": {
                "kernel": _lin(sd[f"{p}.mlp.fc1.weight"]),
                "bias": sd[f"{p}.mlp.fc1.bias"],
            },
            "fc2": {
                "kernel": _lin(sd[f"{p}.mlp.fc2.weight"]),
                "bias": sd[f"{p}.mlp.fc2.bias"],
            },
        }
        i += 1
    return {"backbone": bb}


def convert_beit_vqkd(
    sd: Mapping[str, np.ndarray], with_decoder: bool = True
) -> dict:
    """BEiT-v2 VQ-KD checkpoint (upstream ``vqkd_encoder...`` layout; the
    reference converts the same keys in ``tools/convert_checkpoints.py``
    ``BEiTv2Converter``) → AutoencoderModel(ViTEncoder/ViTDecoder) params."""
    params: dict[str, Any] = {
        "encoder": _beit_vit(sd, "encoder", "encode_task_layer"),
        "quantizer": {"codebook": sd["quantize.embedding.weight"]},
    }
    if with_decoder and "decoder.cls_token" in sd:
        params["decoder"] = _beit_vit(sd, "decoder", "decode_task_layer")
    if "post_quant_conv.weight" in sd:
        w = sd["post_quant_conv.weight"]
        kernel = _conv(w) if w.ndim == 4 else _lin(w)
        params["pre_decode"] = {
            "Conv_0" if w.ndim == 4 else "Dense_0": {
                "kernel": kernel,
                "bias": sd["post_quant_conv.bias"],
            }
        }
    return params
