"""Algorithm layer — jitted train/eval steps per tokenizer family.

Functional re-design of the reference's runner/algorithm split (SURVEY §7):
an Algorithm owns the model + optimizer and exposes pure ``train_step`` /
``eval_step`` functions (jit/pjit-compiled by the runner). The reference's
quantizer-callback side effects (EMA k-means, CVQ reinit, normalize, lazy
k-means init — ``vq/algorithms/*/callbacks``) are explicit codebook-state
updates applied after the gradient step, inside the same jitted function, so
their cross-device reductions fuse into the step.

``ReconstructionAlgorithm`` covers the plain autoencoder training recipe
(FSQ; VQ autoencoders without GAN): recon losses + quantizer loss, optional
codebook update. Subclasses/configs specialise to each reference algorithm:
- FSQ      → no codebook, no update                       (configs/fsq)
- VQ-KD    → update 'kmeans' + lazy init + frozen codebook (configs/vqkd)
- CVQ-VAE  → update 'cvq'                                  (configs/cvqvae)
- Cluster  → update 'cvq', only quantizer trains           (configs/cluster)
- VQGAN    → see algorithms/vqgan.py (adds GAN losses + discriminator)
"""

from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax

from ..models.losses.recon import cosine_loss, l1_loss, mse_loss
from ..ops import codebook as cb_ops
from ..ops.distances import normalize, pairwise_distance
from ..registries import AlgorithmRegistry, ModelRegistry
from ..training.optim import build_optimizer
from ..training.state import TrainState

__all__ = ["Algorithm", "ReconstructionAlgorithm", "apply_codebook_update"]

RECON_LOSSES = {"l1": l1_loss, "mse": mse_loss, "cosine": cosine_loss}


def _tree_get(tree: Any, path: tuple[str, ...]) -> Any:
    for k in path:
        tree = tree[k]
    return tree


def _tree_set(tree: Any, path: tuple[str, ...], value: Any) -> Any:
    """Immutable set on nested dicts."""
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _tree_set(tree[path[0]], path[1:], value)
    return out


def apply_codebook_update(
    cfg: Mapping[str, Any],
    codebook: jax.Array,
    x: jax.Array,
    codes: jax.Array,
    extra: Mapping[str, Any],
    rng: jax.Array,
) -> tuple[jax.Array, dict[str, Any]]:
    """Dispatch the configured non-gradient codebook update.

    cfg examples:
      {"type": "normalize"}                       — spherical re-projection
      {"type": "kmeans", "decay": 0.99}           — VQ-KD EMA k-means
      {"type": "cvq", "ema_decay": 0.99, "anchor": "nearest", "sync": True}
    """
    kind = cfg["type"]
    extra = dict(extra)
    if kind == "normalize":
        return normalize(codebook).astype(codebook.dtype), extra
    if kind == "kmeans":
        new = cb_ops.kmeans_update(
            codebook,
            x,
            codes,
            decay=cfg.get("decay", 0.99),
            normalize_input=cfg.get("normalize_input", True),
            renormalize=cfg.get("renormalize", True),
        )
        return new, extra
    if kind == "cvq":
        p = extra["probability"]
        d = pairwise_distance(x.reshape(-1, x.shape[-1]), codebook, "l2")
        new, p, new_cache = cb_ops.cvq_update(
            codebook,
            p,
            x,
            d,
            codes,
            ema_decay=cfg.get("ema_decay", 0.99),
            eps=cfg.get("eps", 1e-3),
            anchor=cfg.get("anchor", "nearest"),
            key=rng,
            sync=cfg.get("sync", True),
            axis_name=None,  # global arrays under pjit
            anchor_cache=extra.get("anchor_cache"),
        )
        extra["probability"] = p
        if new_cache is not None:
            extra["anchor_cache"] = new_cache
        return new, extra
    raise ValueError(f"unknown codebook update {kind!r}")


class Algorithm:
    """Base: owns model + optimizer; subclasses define the loss."""

    codebook_path: tuple[str, ...] = ("quantizer", "codebook")

    def __init__(
        self,
        *,
        model: Mapping[str, Any] | Any,
        optimizer: Mapping[str, Any] | None = None,
        ema_decay: float | None = None,
        **kwargs: Any,
    ) -> None:
        self.model = ModelRegistry.build_or_return(model)
        self.optimizer_cfg = dict(
            optimizer or {"type": "adam", "lr": 1e-4}
        )
        self._tx = None
        # EMA shadow of the model weights (reference: todd EMA callback;
        # extraction via tools/model_ema.py:8-23)
        self.ema_decay = ema_decay
        self.extra_cfg = kwargs

    def maybe_init_ema(self, extra: dict, params: Any) -> dict:
        if self.ema_decay is not None:
            extra["ema_params"] = jax.tree_util.tree_map(
                jnp.array, params
            )
        return extra

    def maybe_update_ema(self, extra: Mapping[str, Any], params: Any) -> dict:
        extra = dict(extra)
        if self.ema_decay is not None:
            d = self.ema_decay
            extra["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p,
                extra["ema_params"],
                params,
            )
        return extra

    @classmethod
    def build_pre_hook(cls, config, registry):
        return config

    # -- state -------------------------------------------------------------

    def example_input(self, batch: Mapping[str, Any]) -> Any:
        return batch["image"]

    def init_state(self, rng: jax.Array, batch: Mapping[str, Any]) -> TrainState:
        rng, init_rng = jax.random.split(rng)
        variables = self.model.init(init_rng, self.example_input(batch))
        params = variables["params"]
        tx = self.tx(params)
        return TrainState.create(
            params=params,
            opt_state=tx.init(params),
            rng=rng,
            extra=self.init_extra(params),
        )

    def init_extra(self, params: Any) -> dict[str, Any]:
        return {}

    def tx(self, params: Any) -> optax.GradientTransformation:
        if self._tx is None:
            self._tx = build_optimizer(self.optimizer_cfg, params)
        return self._tx

    # -- steps (pure; jitted by the runner) --------------------------------

    def train_step(self, state: TrainState, batch) -> tuple[TrainState, dict]:
        raise NotImplementedError

    def eval_step(self, state: TrainState, batch) -> dict:
        raise NotImplementedError


@AlgorithmRegistry.register()
class ReconstructionAlgorithm(Algorithm):
    """Autoencoder training: recon losses + quantizer loss (+ codebook
    update). The train step for FSQ / VQ-KD-style / CVQ / Cluster configs."""

    def __init__(
        self,
        *,
        recon_losses: Mapping[str, Mapping[str, Any]] | None = None,
        codebook_update: Mapping[str, Any] | None = None,
        lazy_kmeans_init: Mapping[str, Any] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.recon_losses = dict(recon_losses or {"l1": {}, "mse": {}})
        self.codebook_update = dict(codebook_update) if codebook_update else None
        self.lazy_kmeans_init = (
            dict(lazy_kmeans_init) if lazy_kmeans_init is not None else None
        )
        self.lpips_module = None
        if "lpips" in self.recon_losses:
            from ..models.losses.lpips import LPIPS

            self.lpips_module = LPIPS()

    def _init_lpips(self, extra: dict, rng: jax.Array) -> dict:
        """LPIPS VGG+lin params are frozen state; auto-loaded from
        ``$PRETRAINED/lpips`` (converted via tools/convert_weights.py) when
        present, random otherwise (smoke runs)."""
        if self.lpips_module is not None:
            import os

            from ..utils.flags import Store

            dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
            params = self.lpips_module.init(rng, dummy, dummy)["params"]
            pretrained = os.path.join(str(Store.PRETRAINED), "lpips")
            if os.path.isdir(pretrained):
                import orbax.checkpoint as ocp

                with ocp.StandardCheckpointer() as saver:
                    loaded = saver.restore(os.path.abspath(pretrained))
                params = loaded.get("params", loaded)
            extra["lpips_params"] = params
        return extra

    def init_state(self, rng: jax.Array, batch: Mapping[str, Any]) -> TrainState:
        rng, lpips_rng = jax.random.split(rng)
        state = super().init_state(rng, batch)
        extra = self._init_lpips(dict(state.extra), lpips_rng)
        extra = self.maybe_init_ema(extra, state.params)
        return state.replace(extra=extra)

    def init_extra(self, params: Any) -> dict[str, Any]:
        extra: dict[str, Any] = {}
        if self.codebook_update and self.codebook_update["type"] == "cvq":
            cb = _tree_get(params, self.codebook_path)
            k = cb.shape[0]
            extra["probability"] = jnp.zeros((k,), jnp.float32)
            if self.codebook_update.get("anchor") == "cached":
                # CachedAnchor cross-batch cache, seeded like the
                # reference's first-step uniform missing-pad
                extra["anchor_cache"] = jax.random.uniform(
                    jax.random.PRNGKey(0), cb.shape, jnp.float32
                )
        if self.lazy_kmeans_init is not None:
            extra["initialized"] = jnp.zeros((), jnp.bool_)
        return extra

    # -- loss --------------------------------------------------------------

    def _recon_target(self, out, batch, extra) -> jax.Array | None:
        """What the decoder reconstructs (VQ-KD overrides this with teacher
        features). None → no reconstruction term (Cluster: quantizer only)."""
        return batch["image"] if "pred" in out else None

    def _losses(self, out, batch, extra=None) -> dict[str, jax.Array]:
        losses = dict(out["quantizer"].losses)
        if out["quantizer"].loss.ndim == 0 and not losses:
            losses["loss_quantizer"] = out["quantizer"].loss
        target = self._recon_target(out, batch, extra or {})
        if target is not None:
            pred = out["pred"]
            for name, cfg in self.recon_losses.items():
                if name == "lpips":
                    raw = self.lpips_module.apply(
                        {"params": (extra or {})["lpips_params"]}, pred, target
                    )
                    losses["loss_lpips"] = cfg.get("weight", 1.0) * raw
                else:
                    losses[f"loss_{name}"] = RECON_LOSSES[name](
                        pred, target, **cfg
                    )
        return losses

    # -- steps -------------------------------------------------------------

    def train_step(self, state: TrainState, batch) -> tuple[TrainState, dict]:
        state, rng = state.next_rng()
        rng_init, rng_update, rng_drop = jax.random.split(rng, 3)
        params = state.params
        extra = dict(state.extra)

        # lazy k-means codebook init on the first real batch (reference
        # LazyInitWeightsMixin + VQKDCallback.lazy_init_weights)
        if self.lazy_kmeans_init is not None:
            params, extra = self._maybe_lazy_init(
                params, extra, batch, rng_init
            )

        def loss_fn(params):
            out = self.model.apply(
                {"params": params},
                batch["image"],
                train=True,
                rngs={"dropout": rng_drop},
            )
            losses = self._losses(out, batch, extra)
            total = sum(losses.values(), jnp.zeros((), jnp.float32))
            # the quantizer's summed internal loss (covers the case where
            # .losses was empty but .loss is not)
            if not out["quantizer"].losses:
                total = total + out["quantizer"].loss
            return total, (out, losses)

        (loss, (out, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        tx = self.tx(params)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)

        if self.codebook_update is not None:
            codebook = _tree_get(params, self.codebook_path)
            new_cb, extra = apply_codebook_update(
                self.codebook_update,
                codebook,
                out["quantizer"].aux["x"],
                out["quantizer"].codes,
                extra,
                rng_update,
            )
            params = _tree_set(params, self.codebook_path, new_cb)

        extra = self.maybe_update_ema(extra, params)
        metrics = {"loss": loss, **losses}
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                extra=extra,
            ),
            metrics,
        )

    def _maybe_lazy_init(self, params, extra, batch, rng):
        cfg = self.lazy_kmeans_init
        codebook = _tree_get(params, self.codebook_path)

        def do_init(codebook):
            out = self.model.apply(
                {"params": params}, batch["image"], method=self.model.encode
            )
            x = out.reshape(-1, out.shape[-1])
            return cb_ops.kmeans_init(
                x,
                codebook.shape[0],
                rng,
                iters=cfg.get("iters", 10),
                normalize_input=cfg.get("normalize_input", True),
            ).astype(codebook.dtype)

        new_cb = jax.lax.cond(
            extra["initialized"], lambda cb: cb, do_init, codebook
        )
        params = _tree_set(params, self.codebook_path, new_cb)
        extra = dict(extra)
        extra["initialized"] = jnp.ones((), jnp.bool_)
        return params, extra

    def eval_step(self, state: TrainState, batch) -> dict:
        out = self.model.apply(
            {"params": state.params}, batch["image"], train=False
        )
        losses = self._losses(out, batch, dict(state.extra))
        memo = {"codes": out["quantizer"].codes, **losses}
        if "pred" in out:  # TokenizerModel (Cluster) has no decode path
            memo["pred"] = out["pred"]
        return memo
