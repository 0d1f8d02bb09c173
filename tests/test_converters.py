"""Structural converter tests: synthesize torch-layout state dicts for tiny
configs, convert, and verify the result loads into the flax models exactly
(tree paths + shapes + a forward pass)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.utils.converters import (
    convert_clip_visual,
    convert_gpt2,
    convert_hf_llama,
    convert_pt_inception,
    convert_taming_vqgan,
    convert_vgg16_lpips,
)


def tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(tree_shapes(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def assert_trees_match(template, converted, allow_missing=()):
    t = tree_shapes(template)
    c = tree_shapes(converted)
    missing = {
        k for k in set(t) - set(c)
        if not any(k.startswith(a) for a in allow_missing)
    }
    extra = set(c) - set(t)
    assert not missing, f"missing from converted: {sorted(missing)[:10]}"
    assert not extra, f"extra in converted: {sorted(extra)[:10]}"
    for k in set(t) & set(c):
        assert t[k] == c[k], f"{k}: {t[k]} vs {c[k]}"


class TestVGG16LPIPS:
    def test_structure(self):
        from vector_quantization_tpu.models.losses.lpips import LPIPS

        rng = np.random.default_rng(0)
        widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
        idxs = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        vgg_sd = {}
        c_in = 3
        for idx, w in zip(idxs, widths):
            vgg_sd[f"features.{idx}.weight"] = rng.normal(
                size=(w, c_in, 3, 3)
            ).astype(np.float32)
            vgg_sd[f"features.{idx}.bias"] = np.zeros(w, np.float32)
            c_in = w
        lin_sd = {
            f"{i}.weight": rng.normal(size=(1, c, 1, 1)).astype(np.float32)
            for i, c in enumerate([64, 128, 256, 512, 512])
        }
        params = convert_vgg16_lpips(vgg_sd, lin_sd)

        lpips = LPIPS()
        x = jnp.zeros((1, 32, 32, 3))
        template = lpips.init(jax.random.PRNGKey(0), x, x)["params"]
        assert_trees_match(template, params)
        out = lpips.apply({"params": params}, x, x)
        assert float(out) == 0.0


class TestPtInception:
    def test_structure(self):
        from vector_quantization_tpu.models.metrics.inception import (
            InceptionV3Features,
        )

        model = InceptionV3Features(resize_input=False)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3), jnp.uint8)
        )
        template_p = variables["params"]
        template_s = variables["batch_stats"]

        # synthesize the torch sd by walking the template (name rules are
        # module-for-module, so this also checks converter path handling)
        sd = {}

        def walk(tree, stats, prefix):
            for k, v in tree.items():
                path = f"{prefix}.{k}" if prefix else k
                if isinstance(v, dict):
                    walk(v, stats.get(k, {}), path)
                elif k == "kernel":
                    sd[f"{path[:-len('.kernel')]}.weight"] = np.transpose(
                        np.asarray(v), (3, 2, 0, 1)
                    )
                elif k == "scale":
                    sd[f"{path[:-len('.scale')]}.weight"] = np.asarray(v)
                elif k == "bias":
                    sd[path] = np.asarray(v)

        walk(template_p, template_s, "")

        def walk_stats(tree, prefix):
            for k, v in tree.items():
                path = f"{prefix}.{k}" if prefix else k
                if isinstance(v, dict):
                    walk_stats(v, path)
                elif k == "mean":
                    sd[f"{path[:-len('.mean')]}.running_mean"] = np.asarray(v)
                elif k == "var":
                    sd[f"{path[:-len('.var')]}.running_var"] = np.asarray(v)

        walk_stats(template_s, "")

        params, stats = convert_pt_inception(sd)
        assert_trees_match(template_p, params)
        assert_trees_match(template_s, stats)
        feats = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.zeros((1, 75, 75, 3), jnp.uint8),
        )
        assert feats.shape == (1, 2048)


def _fake_taming_sd(width, mults, enc_depth, dec_depth, embed_dim, k):
    """Synthesize a taming-transformers VQGAN state dict for tiny configs."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, c_out, c_in, ks):
        sd[f"{name}.weight"] = rng.normal(size=(c_out, c_in, ks, ks)).astype(
            np.float32
        ) * 0.02
        sd[f"{name}.bias"] = np.zeros(c_out, np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def resblock(name, c_in, c_out):
        norm(f"{name}.norm1", c_in)
        conv(f"{name}.conv1", c_out, c_in, 3)
        norm(f"{name}.norm2", c_out)
        conv(f"{name}.conv2", c_out, c_out, 3)
        if c_in != c_out:
            conv(f"{name}.nin_shortcut", c_out, c_in, 1)

    def attn(name, c):
        norm(f"{name}.norm", c)
        for qkv in ("q", "k", "v"):
            conv(f"{name}.{qkv}", c, c, 1)
        conv(f"{name}.proj_out", c, c, 1)

    n = len(mults)
    widths = [width * m for m in mults]
    # encoder
    conv("encoder.conv_in", width, 3, 3)
    c = width
    for i, w in enumerate(widths):
        for d in range(enc_depth):
            resblock(f"encoder.down.{i}.block.{d}", c, w)
            c = w
            if i == n - 1:
                attn(f"encoder.down.{i}.attn.{d}", w)
        if i < n - 1:
            conv(f"encoder.down.{i}.downsample.conv", w, w, 3)
    for b in ("block_1", "block_2"):
        resblock(f"encoder.mid.{b}", c, c)
    attn("encoder.mid.attn_1", c)
    norm("encoder.norm_out", c)
    conv("encoder.conv_out", embed_dim, c, 3)
    # decoder (mirror, taming up.{level} with level = n-1-i)
    dec_widths = list(reversed(widths))
    conv("decoder.conv_in", dec_widths[0], embed_dim, 3)
    c = dec_widths[0]
    for b in ("block_1", "block_2"):
        resblock(f"decoder.mid.{b}", c, c)
    attn("decoder.mid.attn_1", c)
    for i, w in enumerate(dec_widths):
        t = n - 1 - i
        for d in range(dec_depth):
            resblock(f"decoder.up.{t}.block.{d}", c, w)
            c = w
            if i == 0:
                attn(f"decoder.up.{t}.attn.{d}", w)
        if i < n - 1:
            conv(f"decoder.up.{t}.upsample.conv", w, w, 3)
    norm("decoder.norm_out", c)
    conv("decoder.conv_out", 3, c, 3)
    # quantizer + quant convs
    sd["quantize.embedding.weight"] = rng.normal(size=(k, embed_dim)).astype(
        np.float32
    )
    conv("quant_conv", embed_dim, embed_dim, 1)
    conv("post_quant_conv", embed_dim, embed_dim, 1)
    return sd


class TestTamingVQGAN:
    def test_structure_and_forward(self):
        from vector_quantization_tpu import algorithms  # noqa: F401
        from vector_quantization_tpu.registries import ModelRegistry

        width, mults, embed_dim, k = 32, (1, 2), 16, 64
        model = ModelRegistry.build(
            {
                "type": "AutoencoderModel",
                "encoder": {
                    "type": "VQGANEncoder",
                    "width": width,
                    "width_mults": mults,
                    "depth_mult": 2,
                    "out_channels": embed_dim,
                },
                "post_encode": {
                    "type": "ConvConnector", "out_channels": embed_dim
                },
                "quantizer": {
                    "type": "VectorQuantizer",
                    "codebook_size": k,
                    "embedding_dim": embed_dim,
                },
                "pre_decode": {
                    "type": "ConvConnector", "out_channels": embed_dim
                },
                "decoder": {
                    "type": "VQGANDecoder",
                    "width": width,
                    "width_mults": tuple(reversed(mults)),
                    "depth_mult": 3,
                    "in_channels": embed_dim,
                },
            }
        )
        x = jnp.zeros((1, 16, 16, 3))
        template = model.init(jax.random.PRNGKey(0), x)["params"]

        sd = _fake_taming_sd(width, mults, 2, 3, embed_dim, k)
        params = convert_taming_vqgan(
            sd, width=width, enc_width_mults=mults, enc_depth=2, dec_depth=3
        )
        assert_trees_match(template, params)
        out = model.apply({"params": params}, x)
        assert out["pred"].shape == (1, 16, 16, 3)


class TestGPT2Converter:
    def test_structure(self):
        from vector_quantization_tpu.models.transformers.gpt2 import (
            GPT2Transformer,
        )

        rng = np.random.default_rng(0)
        d, layers, vocab, ctx = 32, 2, 50, 16
        sd = {
            "wte.weight": rng.normal(size=(vocab, d)).astype(np.float32),
            "wpe.weight": rng.normal(size=(ctx, d)).astype(np.float32),
            "ln_f.weight": np.ones(d, np.float32),
            "ln_f.bias": np.zeros(d, np.float32),
        }
        for i in range(layers):
            p = f"h.{i}"
            sd[f"{p}.ln_1.weight"] = np.ones(d, np.float32)
            sd[f"{p}.ln_1.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.attn.c_attn.weight"] = rng.normal(size=(d, 3 * d)).astype(np.float32)
            sd[f"{p}.attn.c_attn.bias"] = np.zeros(3 * d, np.float32)
            sd[f"{p}.attn.c_proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
            sd[f"{p}.attn.c_proj.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.ln_2.weight"] = np.ones(d, np.float32)
            sd[f"{p}.ln_2.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.mlp.c_fc.weight"] = rng.normal(size=(d, 4 * d)).astype(np.float32)
            sd[f"{p}.mlp.c_fc.bias"] = np.zeros(4 * d, np.float32)
            sd[f"{p}.mlp.c_proj.weight"] = rng.normal(size=(4 * d, d)).astype(np.float32)
            sd[f"{p}.mlp.c_proj.bias"] = np.zeros(d, np.float32)
        params = convert_gpt2(sd)

        tr = GPT2Transformer(
            vocabulary_size=vocab, hidden_size=d, num_layers=layers,
            num_heads=2, max_length=ctx,
        )
        tokens = jnp.zeros((1, 4), jnp.int32)
        template = tr.init(jax.random.PRNGKey(0), tokens)["params"]
        assert_trees_match(template, params)
        logits = tr.apply({"params": params}, tokens)
        assert logits.shape == (1, 4, vocab)


class TestLlamaConverter:
    def test_structure(self):
        from vector_quantization_tpu.models.transformers.llama import (
            LlamaTransformer,
        )

        rng = np.random.default_rng(0)
        d, layers, vocab, ffn = 32, 2, 50, 64
        sd = {
            "model.embed_tokens.weight": rng.normal(size=(vocab, d)).astype(np.float32),
            "model.norm.weight": np.ones(d, np.float32),
            "lm_head.weight": np.zeros((vocab, d), np.float32),
        }
        for i in range(layers):
            p = f"model.layers.{i}"
            sd[f"{p}.input_layernorm.weight"] = np.ones(d, np.float32)
            sd[f"{p}.post_attention_layernorm.weight"] = np.ones(d, np.float32)
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                sd[f"{p}.self_attn.{proj}.weight"] = rng.normal(
                    size=(d, d)
                ).astype(np.float32)
            sd[f"{p}.mlp.gate_proj.weight"] = rng.normal(size=(ffn, d)).astype(np.float32)
            sd[f"{p}.mlp.up_proj.weight"] = rng.normal(size=(ffn, d)).astype(np.float32)
            sd[f"{p}.mlp.down_proj.weight"] = rng.normal(size=(d, ffn)).astype(np.float32)
        params = convert_hf_llama(sd)

        tr = LlamaTransformer(
            vocabulary_size=vocab, hidden_size=d, num_layers=layers,
            num_heads=2, ffn_dim=ffn, max_length=16,
        )
        tokens = jnp.zeros((1, 4), jnp.int32)
        template = tr.init(jax.random.PRNGKey(0), tokens)["params"]
        assert_trees_match(template, params)


class TestCLIPConverter:
    def test_structure(self):
        from vector_quantization_tpu.models.teachers import CLIPTeacher

        rng = np.random.default_rng(0)
        d, layers, patch, img, proj = 32, 2, 8, 32, 16
        n = (img // patch) ** 2
        sd = {
            "visual.conv1.weight": rng.normal(size=(d, 3, patch, patch)).astype(np.float32),
            "visual.class_embedding": rng.normal(size=(d,)).astype(np.float32),
            "visual.positional_embedding": rng.normal(size=(n + 1, d)).astype(np.float32),
            "visual.ln_pre.weight": np.ones(d, np.float32),
            "visual.ln_pre.bias": np.zeros(d, np.float32),
            "visual.ln_post.weight": np.ones(d, np.float32),
            "visual.ln_post.bias": np.zeros(d, np.float32),
            "visual.proj": rng.normal(size=(d, proj)).astype(np.float32),
        }
        for i in range(layers):
            p = f"visual.transformer.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = np.ones(d, np.float32)
            sd[f"{p}.ln_1.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.attn.in_proj_weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
            sd[f"{p}.attn.in_proj_bias"] = np.zeros(3 * d, np.float32)
            sd[f"{p}.attn.out_proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
            sd[f"{p}.attn.out_proj.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.ln_2.weight"] = np.ones(d, np.float32)
            sd[f"{p}.ln_2.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.mlp.c_fc.weight"] = rng.normal(size=(4 * d, d)).astype(np.float32)
            sd[f"{p}.mlp.c_fc.bias"] = np.zeros(4 * d, np.float32)
            sd[f"{p}.mlp.c_proj.weight"] = rng.normal(size=(d, 4 * d)).astype(np.float32)
            sd[f"{p}.mlp.c_proj.bias"] = np.zeros(d, np.float32)
        params = convert_clip_visual(sd, num_heads=2)

        teacher = CLIPTeacher(
            patch_size=patch, embed_dim=d, depth=layers, num_heads=2,
            proj_dim=proj,
        )
        img_in = jnp.zeros((1, img, img, 3), jnp.uint8)
        template = teacher.init(jax.random.PRNGKey(0), img_in)["params"]
        assert_trees_match(template, params)
        out = teacher.apply({"params": params}, img_in, return_2d=True)
        assert out.shape == (1, img // patch, img // patch, proj)
