"""Numerical torch↔flax parity for every weight converter.

The reference's de-facto regression suite is converted upstream checkpoints
(``tools/convert_checkpoints.py`` ``--check`` + ``docs/pretrained_models.md``
golden metrics). Structural tests (test_converters.py) can't catch a
transposed kernel or a wrong epsilon; these tests build a randomly-initialised
*torch* reference model for each converter (HF models where available,
hand-written fixtures mirroring the upstream architectures otherwise),
convert its state dict, and assert the flax forward matches torch (atol
~1e-4). Any layout/eps/activation mistake in a converter or flax model fails
here immediately instead of surfacing as a wrong rFID much later.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vector_quantization_tpu.utils import converters  # noqa: E402

torch.manual_seed(0)


def _np(t):
    return t.detach().cpu().numpy()


def _sd(module):
    return {k: _np(v) for k, v in module.state_dict().items()}


def _assert_close(a, b, atol=1e-4, rtol=1e-4, what=""):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=what)


# ===========================================================================
# HF GPT-2 / Llama (torch reference = transformers itself)
# ===========================================================================


class TestHFTransformers:
    def test_gpt2(self):
        from transformers import GPT2Config, GPT2LMHeadModel

        from vector_quantization_tpu.models.transformers.gpt2 import (
            GPT2Transformer,
        )

        cfg = GPT2Config(
            vocab_size=64,
            n_positions=16,
            n_embd=32,
            n_layer=2,
            n_head=2,
            resid_pdrop=0.0,
            embd_pdrop=0.0,
            attn_pdrop=0.0,
        )
        ref = GPT2LMHeadModel(cfg).eval()
        tokens = np.array([[1, 5, 9, 30, 2, 0, 63, 7]], np.int64)
        with torch.no_grad():
            want = _np(ref(torch.from_numpy(tokens)).logits)

        params = converters.convert_gpt2(_sd(ref))
        model = GPT2Transformer(
            vocabulary_size=64,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            max_length=16,
        )
        got = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
        _assert_close(got, want, what="gpt2 logits")

    def test_llama(self):
        from transformers import LlamaConfig, LlamaForCausalLM

        from vector_quantization_tpu.models.transformers.llama import (
            LlamaTransformer,
        )

        cfg = LlamaConfig(
            vocab_size=64,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            max_position_embeddings=16,
            attention_dropout=0.0,
            tie_word_embeddings=False,
        )
        ref = LlamaForCausalLM(cfg).eval()
        tokens = np.array([[3, 1, 60, 4, 9, 22, 17, 8]], np.int64)
        with torch.no_grad():
            want = _np(ref(torch.from_numpy(tokens)).logits)

        params = converters.convert_hf_llama(_sd(ref))
        model = LlamaTransformer(
            vocabulary_size=64,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            ffn_dim=64,
            max_length=16,
        )
        got = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
        _assert_close(got, want, atol=2e-4, rtol=2e-4, what="llama logits")

    def test_llama_decode_matches_teacher_forced(self):
        """The converted model's incremental (KV-cache) decode must agree
        with its own full-sequence forward — exercises RoPE offsets and the
        cache-masked attention on converted weights."""
        from transformers import LlamaConfig, LlamaForCausalLM

        from vector_quantization_tpu.models.transformers.llama import (
            LlamaTransformer,
        )

        cfg = LlamaConfig(
            vocab_size=32,
            hidden_size=16,
            intermediate_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            max_position_embeddings=8,
            attention_dropout=0.0,
            tie_word_embeddings=False,
        )
        ref = LlamaForCausalLM(cfg).eval()
        params = converters.convert_hf_llama(_sd(ref))
        model = LlamaTransformer(
            vocabulary_size=32,
            hidden_size=16,
            num_layers=2,
            num_heads=2,
            ffn_dim=32,
            max_length=8,
        )
        tokens = jnp.array([[3, 1, 30, 4, 9]], jnp.int32)
        full = model.apply({"params": params}, tokens)
        cache = model.init_cache(1, dtype=jnp.float32)
        step = []
        for t in range(tokens.shape[1]):
            logits, cache = model.apply(
                {"params": params}, tokens[:, t : t + 1], cache
            )
            step.append(logits[:, 0])
        _assert_close(
            jnp.stack(step, 1), full, atol=1e-4, what="kv-cache decode"
        )


# ===========================================================================
# taming-transformers VQGAN (hand-written torch fixture, taming layout)
# ===========================================================================


class _TmResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32 if cin % 32 == 0 else cin, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32 if cout % 32 == 0 else cout, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class _TmAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.GroupNorm(32 if c % 32 == 0 else c, c, eps=1e-6)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)  # (b, n, c)
        k = k.reshape(b, c, hh * ww)  # (b, c, n)
        w = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)  # (b, nq, nk)
        v = v.reshape(b, c, hh * ww)  # (b, c, n)
        h = torch.bmm(v, w.permute(0, 2, 1))  # (b, c, nq)
        h = h.reshape(b, c, hh, ww)
        return x + self.proj_out(h)


class _TmDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class _TmUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _TmLevel(nn.Module):
    """One resolution level: .block / .attn ModuleLists + down/up sample."""

    def __init__(self, cin, cout, depth, attend, resample):
        super().__init__()
        blocks, attns = [], []
        c = cin
        for _ in range(depth):
            blocks.append(_TmResBlock(c, cout))
            c = cout
            if attend:
                attns.append(_TmAttn(cout))
        self.block = nn.ModuleList(blocks)
        self.attn = nn.ModuleList(attns)
        if resample == "down":
            self.downsample = _TmDown(cout)
        elif resample == "up":
            self.upsample = _TmUp(cout)

    def forward(self, x, resample=True):
        for i, blk in enumerate(self.block):
            x = blk(x)
            if len(self.attn):
                x = self.attn[i](x)
        if resample and hasattr(self, "downsample"):
            x = self.downsample(x)
        if resample and hasattr(self, "upsample"):
            x = self.upsample(x)
        return x


class _TmMid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.block_1 = _TmResBlock(c, c)
        self.attn_1 = _TmAttn(c)
        self.block_2 = _TmResBlock(c, c)

    def forward(self, x):
        return self.block_2(self.attn_1(self.block_1(x)))


class _TmEncoder(nn.Module):
    def __init__(self, width, mults, depth, zdim):
        super().__init__()
        widths = [width * m for m in mults]
        n = len(mults)
        self.conv_in = nn.Conv2d(3, width, 3, padding=1)
        self.down = nn.ModuleList(
            _TmLevel(
                widths[i - 1] if i else width,
                widths[i],
                depth,
                attend=(i == n - 1),
                resample="down" if i < n - 1 else None,
            )
            for i in range(n)
        )
        self.mid = _TmMid(widths[-1])
        self.norm_out = nn.GroupNorm(32, widths[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(widths[-1], zdim, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for level in self.down:
            x = level(x)
        x = self.mid(x)
        return self.conv_out(F.silu(self.norm_out(x)))


class _TmDecoder(nn.Module):
    def __init__(self, width, mults, depth, zdim):
        super().__init__()
        widths = [width * m for m in mults]  # low→high resolution widths
        n = len(mults)
        self.conv_in = nn.Conv2d(zdim, widths[-1], 3, padding=1)
        self.mid = _TmMid(widths[-1])
        # up[t]: t = n-1 runs first (lowest resolution)
        self.up = nn.ModuleList(
            _TmLevel(
                widths[min(t + 1, n - 1)],
                widths[t],
                depth,
                attend=(t == n - 1),
                resample="up" if t > 0 else None,
            )
            for t in range(n)
        )
        self.norm_out = nn.GroupNorm(32, widths[0], eps=1e-6)
        self.conv_out = nn.Conv2d(widths[0], 3, 3, padding=1)

    def forward(self, x):
        x = self.mid(self.conv_in(x))
        for t in reversed(range(len(self.up))):
            x = self.up[t](x)
        return self.conv_out(F.silu(self.norm_out(x)))


class _TmVQGAN(nn.Module):
    def __init__(self, width=32, mults=(1, 2), enc_depth=2, dec_depth=3,
                 zdim=8, codes=16):
        super().__init__()
        self.encoder = _TmEncoder(width, mults, enc_depth, zdim)
        self.decoder = _TmDecoder(width, mults, dec_depth, zdim)
        self.quantize = nn.Module()
        self.quantize.embedding = nn.Embedding(codes, zdim)
        self.quant_conv = nn.Conv2d(zdim, zdim, 1)
        self.post_quant_conv = nn.Conv2d(zdim, zdim, 1)

    def encode_feat(self, x):
        return self.quant_conv(self.encoder(x))

    def forward(self, x):
        feat = self.encode_feat(x)  # (b, z, h, w)
        b, z, h, w = feat.shape
        flat = feat.permute(0, 2, 3, 1).reshape(-1, z)
        d = torch.cdist(flat, self.quantize.embedding.weight)
        codes = d.argmin(dim=1)
        zq = self.quantize.embedding(codes).reshape(b, h, w, z)
        zq = zq.permute(0, 3, 1, 2)
        return self.decoder(self.post_quant_conv(zq)), codes.reshape(b, h, w)


class TestTamingVQGAN:
    def _build(self):
        from vector_quantization_tpu import algorithms  # noqa: F401
        from vector_quantization_tpu.registries import ModelRegistry

        ref = _TmVQGAN().eval()
        params = converters.convert_taming_vqgan(
            _sd(ref), width=32, enc_width_mults=(1, 2), enc_depth=2,
            dec_depth=3,
        )
        model = ModelRegistry.build(
            {
                "type": "AutoencoderModel",
                "encoder": {
                    "type": "VQGANEncoder",
                    "width": 32,
                    "width_mults": (1, 2),
                    "depth_mult": 2,
                    "out_channels": 8,
                },
                "post_encode": {"type": "ConvConnector", "out_channels": 8},
                "quantizer": {
                    "type": "VectorQuantizer",
                    "codebook_size": 16,
                    "embedding_dim": 8,
                },
                "pre_decode": {"type": "ConvConnector", "out_channels": 8},
                "decoder": {
                    "type": "VQGANDecoder",
                    "width": 32,
                    "width_mults": (2, 1),
                    "depth_mult": 3,
                    "in_channels": 8,
                },
            }
        )
        return ref, model, params

    def test_encode_parity(self):
        ref, model, params = self._build()
        x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3))
        x = x.astype(np.float32)
        with torch.no_grad():
            want = _np(
                ref.encode_feat(torch.from_numpy(x).permute(0, 3, 1, 2))
            ).transpose(0, 2, 3, 1)
        got = model.apply(
            {"params": params}, jnp.asarray(x), method=model.encode
        )
        _assert_close(got, want, atol=2e-4, rtol=2e-4, what="taming encode")

    def test_full_roundtrip_parity(self):
        ref, model, params = self._build()
        x = np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3))
        x = x.astype(np.float32)
        with torch.no_grad():
            want, want_codes = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
        want = _np(want).transpose(0, 2, 3, 1)

        xj = jnp.asarray(x)
        codes = model.apply(
            {"params": params}, xj, method=model.encode_to_quant
        )
        np.testing.assert_array_equal(
            np.asarray(codes), _np(want_codes), err_msg="taming codes"
        )
        recon = model.apply(
            {"params": params}, codes, method=model.decode_from_quant
        )
        _assert_close(recon, want, atol=5e-4, rtol=5e-4, what="taming recon")


# ===========================================================================
# OpenAI CLIP visual tower (hand-written torch fixture, CLIP layout)
# ===========================================================================


class _ClipBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.c_fc = nn.Linear(d, 4 * d)
        self.mlp.c_proj = nn.Linear(4 * d, d)

    def forward(self, x):  # (L, N, D)
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        y = self.ln_2(x)
        h = self.mlp.c_fc(y)  # quick-GELU on the c_fc output
        return x + self.mlp.c_proj(h * torch.sigmoid(1.702 * h))


class _ClipVisual(nn.Module):
    def __init__(self, d=32, heads=2, depth=2, patch=8, img=16, out=16):
        super().__init__()
        n = (img // patch) ** 2
        self.conv1 = nn.Conv2d(3, d, patch, stride=patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(d) * 0.02)
        self.positional_embedding = nn.Parameter(torch.randn(n + 1, d) * 0.02)
        self.ln_pre = nn.LayerNorm(d)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            _ClipBlock(d, heads) for _ in range(depth)
        )
        self.ln_post = nn.LayerNorm(d)
        self.proj = nn.Parameter(torch.randn(d, out) * 0.02)

    def forward(self, x):  # (N, 3, H, W) → patch tokens (N, n, out)
        x = self.conv1(x)
        b, d, h, w = x.shape
        x = x.reshape(b, d, h * w).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(b, 1, d)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding[None]
        x = self.ln_pre(x).permute(1, 0, 2)  # LND
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = self.ln_post(x.permute(1, 0, 2))
        return x[:, 1:] @ self.proj


class TestCLIPVisual:
    def test_parity(self):
        from vector_quantization_tpu.models.teachers.vit import _TeacherViT

        ref = _ClipVisual().eval()
        x = np.random.default_rng(2).normal(size=(2, 16, 16, 3))
        x = x.astype(np.float32)
        with torch.no_grad():
            want = _np(ref(torch.from_numpy(x).permute(0, 3, 1, 2)))

        params = converters.convert_clip_visual(_sd(ref), num_heads=2)
        model = _TeacherViT(
            patch_size=8,
            embed_dim=32,
            depth=2,
            num_heads=2,
            act="quick_gelu",
            pre_norm=True,
            final_norm=True,
            proj_dim=16,
            ln_eps=1e-5,
        )
        got = model.apply({"params": params["backbone"]}, jnp.asarray(x))
        got = np.asarray(got).reshape(2, -1, 16)
        _assert_close(got, want, atol=2e-4, rtol=2e-4, what="clip visual")


# ===========================================================================
# VGG16 + LPIPS (hand-written torch fixture, torchvision/LPIPS layout)
# ===========================================================================

_VGG_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]


def _make_vgg16_features():
    layers, cin = [], 3
    for v in _VGG_PLAN:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    return nn.Sequential(*layers)


class _TorchLPIPS(nn.Module):
    _taps = (3, 8, 15, 22, 29)  # after relu1_2/2_2/3_3/4_3/5_3

    def __init__(self):
        super().__init__()
        self.features = _make_vgg16_features()
        self.shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        self.scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        self.lins = nn.ModuleList(
            nn.Conv2d(c, 1, 1, bias=False) for c in (64, 128, 256, 512, 512)
        )

    def _feats(self, x):
        x = (x - self.shift) / self.scale
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self._taps:
                out.append(x)
        return out

    @staticmethod
    def _unit(x):
        return x * torch.rsqrt((x * x).sum(dim=1, keepdim=True) + 1e-10)

    def forward(self, pred, target):
        total = 0.0
        for fp, ft, lin in zip(self._feats(pred), self._feats(target), self.lins):
            diff = (self._unit(fp) - self._unit(ft)) ** 2
            total = total + lin(diff).mean(dim=(1, 2, 3)).mean()
        return total


class TestLPIPS:
    def test_parity(self):
        from vector_quantization_tpu.models.losses.lpips import LPIPS

        ref = _TorchLPIPS().eval()
        vgg_sd = {f"features.{k}": v for k, v in _sd(ref.features).items()}
        lin_sd = {
            f"{i}.weight": _np(lin.weight) for i, lin in enumerate(ref.lins)
        }
        params = converters.convert_vgg16_lpips(vgg_sd, lin_sd)

        rng = np.random.default_rng(3)
        pred = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        tgt = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = float(
                ref(
                    torch.from_numpy(pred).permute(0, 3, 1, 2),
                    torch.from_numpy(tgt).permute(0, 3, 1, 2),
                )
            )
        got = float(
            LPIPS().apply(
                {"params": params}, jnp.asarray(pred), jnp.asarray(tgt)
            )
        )
        assert abs(got - want) < 1e-4, (got, want)


# ===========================================================================
# pytorch-fid InceptionV3 (hand-written torch fixture, pt_inception layout)
# ===========================================================================


class _BConv(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):  # FID quirk: count_include_pad=False
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class _IncA(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = _BConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = _BConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = _BConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BConv(cin, pool, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avgp(x)),
        ], 1)


class _IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _BConv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2),
        ], 1)


class _IncC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _BConv(cin, 192, kernel_size=1)
        self.branch7x7_1 = _BConv(cin, c7, kernel_size=1)
        self.branch7x7_2 = _BConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BConv(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat(
            [self.branch1x1(x), b7, bd, self.branch_pool(_avgp(x))], 1
        )


class _IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _BConv(cin, 192, kernel_size=1)
        self.branch3x3_2 = _BConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BConv(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _BConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)), b7, F.max_pool2d(x, 3, 2)
        ], 1)


class _IncE(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = _BConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = _BConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = _BConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = _avgp(x) if self.pool == "avg" else F.max_pool2d(x, 3, 1, 1)
        return torch.cat(
            [self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1
        )


class _TorchFIDInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _BConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BConv(80, 192, kernel_size=3)
        self.Mixed_5b = _IncA(192, 32)
        self.Mixed_5c = _IncA(256, 64)
        self.Mixed_5d = _IncA(288, 64)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128)
        self.Mixed_6c = _IncC(768, 160)
        self.Mixed_6d = _IncC(768, 160)
        self.Mixed_6e = _IncC(768, 192)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280, "avg")
        self.Mixed_7c = _IncE(2048, "max")

    def forward(self, x):  # x in [-1, 1], NCHW
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))  # (B, 2048)


class TestInception:
    def test_parity(self):
        from vector_quantization_tpu.models.metrics.inception import (
            InceptionV3Features,
        )

        ref = _TorchFIDInception()
        # randomise BN running stats so the stats conversion is exercised
        gen = torch.Generator().manual_seed(7)
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
        ref = ref.eval()

        params, stats = converters.convert_pt_inception(_sd(ref))
        model = InceptionV3Features(resize_input=False)

        images = np.random.default_rng(4).integers(
            0, 256, (2, 75, 75, 3), dtype=np.uint8
        )
        with torch.no_grad():
            xt = torch.from_numpy(
                images.astype(np.float32) / 255.0 * 2.0 - 1.0
            ).permute(0, 3, 1, 2)
            want = _np(ref(xt))
        got = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(images)
        )
        _assert_close(got, want, atol=1e-3, rtol=1e-3, what="fid inception")


# ===========================================================================
# BEiT-v2 VQ-KD (hand-written torch fixture, upstream vqkd layout)
# ===========================================================================


class _BeitAttn(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(d, 3 * d, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(d))
        self.v_bias = nn.Parameter(torch.randn(d) * 0.02)
        self.proj = nn.Linear(d, d)

    def forward(self, x):
        b, n, d = x.shape
        bias = torch.cat(
            [self.q_bias, torch.zeros_like(self.v_bias), self.v_bias]
        )
        qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(b, n, 3, self.heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (b, h, n, dh)
        q = q * (d // self.heads) ** -0.5
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(x)


class _BeitBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = _BeitAttn(d, heads)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, 4 * d)
        self.mlp.fc2 = nn.Linear(4 * d, d)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class _BeitViT(nn.Module):
    def __init__(self, img=16, patch=8, d=32, heads=2, depth=2):
        super().__init__()
        n = (img // patch) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = nn.ModuleList(_BeitBlock(d, heads) for _ in range(depth))
        self.fc_norm = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed.proj(x)
        b, d, h, w = x.shape
        x = x.reshape(b, d, h * w).permute(0, 2, 1)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.fc_norm(x[:, 1:])


class _BeitVQKD(nn.Module):
    """Upstream-named fixture: encoder + encode_task_layer + quantize."""

    def __init__(self, d=32, zdim=8, codes=16):
        super().__init__()
        self.encoder = _BeitViT(d=d)
        self.encode_task_layer = nn.Sequential(
            nn.Linear(d, d), nn.Tanh(), nn.Linear(d, zdim)
        )
        self.quantize = nn.Module()
        self.quantize.embedding = nn.Embedding(codes, zdim)

    def encode_feat(self, x):
        return self.encode_task_layer(self.encoder(x))


class TestBeitVQKD:
    def test_encoder_parity(self):
        from vector_quantization_tpu.models.autoencoders.vit import ViTEncoder

        ref = _BeitVQKD().eval()
        params = converters.convert_beit_vqkd(_sd(ref), with_decoder=False)
        model = ViTEncoder(
            img_size=16, patch_size=8, out_channels=8,
            embed_dim=32, depth=2, num_heads=2,
        )
        x = np.random.default_rng(5).normal(size=(2, 16, 16, 3))
        x = x.astype(np.float32)
        with torch.no_grad():
            want = _np(
                ref.encode_feat(torch.from_numpy(x).permute(0, 3, 1, 2))
            ).reshape(2, 2, 2, 8)
        got = model.apply({"params": params["encoder"]}, jnp.asarray(x))
        _assert_close(got, want, atol=2e-4, rtol=2e-4, what="beit vqkd enc")
        np.testing.assert_array_equal(
            params["quantizer"]["codebook"],
            _np(ref.quantize.embedding.weight),
        )
