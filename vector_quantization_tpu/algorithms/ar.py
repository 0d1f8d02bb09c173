"""AR proposal networks — class-conditional generation (LlamaGen-style).

Behavioral reference (SURVEY §2.6 ``ar``):
- ``ARC2I`` = C2I + X2IMixin (``vq/algorithms/ar/c2i.py:13-15``): a frozen
  pretrained IR tokenizer embedded in the model bridges pixels↔codes
  (``models/image.py:101-137``); the transformer is teacher-forced on
  [category | image codes] sequences; CFG drops conditions to the
  uncondition token during training (``models/x2i.py:64-74``).
- Training recipe: AdamW, batch 256, CFG dropout 0.1, α=1.75, top-k 600 /
  top-p 0.92 sampling (``configs/llamagen/ar.py:20-26``, BASELINE.md).

TPU-native: the frozen tokenizer's params ride in ``state.extra`` (never
optimized, checkpointed with the AR state so generation checkpoints are
self-contained); tokenize → pack → CE → AdamW is one jitted step; generation
is the jitted scan in :mod:`..tasks.sequence_modeling`. Pre-tokenized
corpora are supported: a batch carrying ``codes`` skips the tokenizer.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax

from ..registries import AlgorithmRegistry, ModelRegistry, TransformerRegistry
from ..tasks.sequence_modeling import (
    TokenCodebook,
    generate,
    next_token_ce,
    pack_c2i_tokens,
    teacher_forced_sample,
)
from ..training.state import TrainState
from .base import Algorithm

__all__ = ["ARAlgorithm"]


@AlgorithmRegistry.register()
class ARAlgorithm(Algorithm):
    def __init__(
        self,
        *,
        transformer: Mapping[str, Any],
        ir: Mapping[str, Any] | Any,
        num_categories: int,
        cfg: float | None = None,
        cfg_alpha: float = 1.75,
        sampler: Mapping[str, Any] | None = None,
        image_size: int = 256,
        eval_generate: bool = False,
        fused_ce: bool = True,
        **kwargs: Any,
    ) -> None:
        # eval_generate: run full class-conditional generation during eval
        # (reference X2I.forward generates in validation for visuals/FID,
        # x2i.py:79-126); costly, off by default
        self.eval_generate = eval_generate
        # fused_ce: train with the logits-free chunked CE
        # (ops/fused_ce.py) when the transformer supports it — at
        # Llama-medium b64/257 the dense f32 head+CE's (B·T, V) logits
        # are ~3.3 GB of the 16 GB chip; the fused loss removes them,
        # which is what lets batch 128 fit alongside full remat (r5,
        # work_dirs/exp/exp_mem_r5.py: 5.6 GB temp vs 10.5 GB dense).
        # Numerics: bf16 head matmul with f32 accumulation (vs dense
        # f32) — gradients agree to bf16 cotangent precision
        # (tests/test_fused_ce.py); the AR regression anchor is recorded
        # with this default.
        self.fused_ce = fused_ce
        self.ir_model = ModelRegistry.build_or_return(ir)
        codebook_size = self.ir_model.quantizer.codebook_size
        self.num_categories = num_categories
        self.cfg = cfg
        self.cfg_alpha = cfg_alpha
        self.sampler = dict(
            sampler or {"temperature": 1.0, "top_k": 600, "top_p": 0.92}
        )
        self.image_size = image_size
        down = self.ir_model.encoder.downsample_factor
        self.image_hw = image_size // down
        num_cond = num_categories + (1 if cfg is not None else 0)
        self.image_codebook = TokenCodebook(num_cond, codebook_size)
        vocabulary_size = num_cond + codebook_size
        seq_len = 1 + self.image_hw * self.image_hw
        t_cfg = dict(transformer)
        t_cfg.setdefault("vocabulary_size", vocabulary_size)
        t_cfg.setdefault("max_length", seq_len)
        transformer_model = TransformerRegistry.build(t_cfg)
        super().__init__(model=transformer_model, **kwargs)

    @property
    def uncondition_token(self) -> int:
        return self.num_categories

    # -- state -------------------------------------------------------------

    def init_state(self, rng: jax.Array, batch) -> TrainState:
        rng, t_rng, ir_rng = jax.random.split(rng, 3)
        seq = 1 + self.image_hw * self.image_hw
        tokens = jnp.zeros((2, seq), jnp.int32)
        params = self.model.init(t_rng, tokens)["params"]
        ir_params = self.ir_model.init(
            ir_rng,
            jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32),
        )["params"]
        tx = self.tx(params)
        return TrainState.create(
            params=params,
            opt_state=tx.init(params),
            rng=rng,
            extra={"ir_params": ir_params},
        )

    def load_ir_from(self, state: TrainState, paths) -> TrainState:
        """Embed a pretrained tokenizer (reference ``vq.utils.load`` +
        ``--load-model-from`` composition, ``configs/ar/x2i.py:14-21``)."""
        from ..training.checkpoints import load_model_from

        extra = dict(state.extra)
        loaded = load_model_from(paths, {"params": extra["ir_params"]})
        extra["ir_params"] = loaded["params"] if "params" in loaded else loaded
        return state.replace(extra=extra)

    # -- pieces ------------------------------------------------------------

    def encode_image_tokens(self, ir_params, image: jax.Array) -> jax.Array:
        codes = self.ir_model.apply(
            {"params": ir_params}, image, method=self.ir_model.encode_to_quant
        )
        return jax.lax.stop_gradient(codes)

    def decode_image_tokens(self, ir_params, codes: jax.Array) -> jax.Array:
        return self.ir_model.apply(
            {"params": ir_params},
            codes,
            method=self.ir_model.decode_from_quant,
        )

    def _tokens(self, state: TrainState, batch, rng, train: bool) -> jax.Array:
        if "codes" in batch:
            codes = batch["codes"]
        else:
            codes = self.encode_image_tokens(
                state.extra["ir_params"], batch["image"]
            )
        category = batch["category"].astype(jnp.int32)
        if self.cfg is not None and train:
            drop = jax.random.uniform(rng, category.shape) < self.cfg
            category = jnp.where(drop, self.uncondition_token, category)
        return pack_c2i_tokens(category, codes, self.image_codebook)

    # -- steps -------------------------------------------------------------

    def train_step(self, state: TrainState, batch):
        state, rng = state.next_rng()
        rng_drop, _ = jax.random.split(rng)
        tokens = self._tokens(state, batch, rng_drop, train=True)

        use_fused = (
            self.fused_ce
            and getattr(self.model, "supports_fused_ce", False)
            and not getattr(self.model, "quantize", False)
        )

        def loss_fn(params):
            if use_fused:
                return self.model.apply(
                    {"params": params}, tokens, fused_ce_targets=tokens
                )
            logits = self.model.apply({"params": params}, tokens)
            return next_token_ce(logits, tokens)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        tx = self.tx(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss": loss},
        )

    def eval_step(self, state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, 1)
        tokens = self._tokens(state, batch, rng, train=False)
        logits = self.model.apply({"params": state.params}, tokens)
        loss = next_token_ce(logits, tokens)
        # token accuracy: re-sample image positions from teacher-forced
        # logits vs ground truth (reference AccuracyMetric,
        # vq/tasks/sequence_modeling/runners/metrics.py:22-47)
        image_logits = logits[:, :-1]  # predicting positions 1..T-1 (codes)
        sampled = teacher_forced_sample(
            rng, image_logits, self.image_codebook, self.sampler
        )
        gt = tokens[:, 1:]
        accuracy = jnp.mean((sampled == gt).astype(jnp.float32))
        memo = {"loss": loss, "accuracy": accuracy, "codes": gt}
        if self.eval_generate:
            memo["generated_image"] = self.generate_step(
                state, batch["category"], jax.random.fold_in(rng, 2)
            )
        return memo

    def half_generate_step(self, state: TrainState, batch, rng):
        """Regenerate the back half of each image from the GT front half —
        the reference's 'half_generate' visualization
        (``vq/algorithms/ar/x2i.py:62-105``)."""
        tokens = self._tokens(state, batch, rng, train=False)
        total = self.image_hw * self.image_hw
        keep = total // 2
        prefix = tokens[:, : 1 + keep]
        codes_back = generate(
            self.model,
            state.params,
            prefix,
            total - keep,
            self.image_codebook,
            rng,
            sampler=self.sampler,
        )
        front = self.image_codebook.debias(tokens[:, 1: 1 + keep])
        codes = jnp.concatenate([front, codes_back], axis=1)
        codes = codes.reshape(-1, self.image_hw, self.image_hw)
        return self.decode_image_tokens(state.extra["ir_params"], codes)

    def generate_step(self, state: TrainState, category: jax.Array, rng):
        """category (B,) → images (B, H, W, 3) in [-1, 1]."""
        cond = category.astype(jnp.int32)
        if self.cfg is not None:
            uncond = jnp.full_like(cond, self.uncondition_token)
            cond = jnp.concatenate([uncond, cond])
        prefix = cond[:, None]  # condition codebook starts at 0 (no bias)
        codes = generate(
            self.model,
            state.params,
            prefix,
            self.image_hw * self.image_hw,
            self.image_codebook,
            rng,
            sampler=self.sampler,
            cfg_alpha=self.cfg_alpha if self.cfg is not None else None,
        )
        codes = codes.reshape(-1, self.image_hw, self.image_hw)
        return self.decode_image_tokens(state.extra["ir_params"], codes)
