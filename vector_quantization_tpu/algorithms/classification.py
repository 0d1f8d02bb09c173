"""Image classification (IC) — linear probe over quantized features.

Behavioral reference: ``vq/tasks/image_classification/models.py:28-122`` —
frozen tokenizer ``encode_to_quant`` → ``quantizer.decode`` → spatial mean
pool → BatchNorm + Linear head, cross-entropy loss; trained with the bespoke
LARS optimizer (``optimizers.py:14-63`` → optax.lars here).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..registries import AlgorithmRegistry, ModelRegistry
from ..training.state import TrainState
from .base import Algorithm

__all__ = ["LinearProbe", "ClassificationAlgorithm"]


class LinearProbe(nn.Module):
    num_categories: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.Dense(self.num_categories)(x)


@AlgorithmRegistry.register()
class ClassificationAlgorithm(Algorithm):
    def __init__(
        self,
        *,
        ir: Mapping[str, Any] | Any,
        num_categories: int,
        image_size: int = 256,
        **kwargs: Any,
    ) -> None:
        kwargs.setdefault("optimizer", {"type": "lars", "lr": 0.1})
        self.ir_model = ModelRegistry.build_or_return(ir)
        self.num_categories = num_categories
        self.image_size = image_size
        super().__init__(model=LinearProbe(num_categories), **kwargs)

    def init_state(self, rng: jax.Array, batch) -> TrainState:
        rng, ir_rng, head_rng = jax.random.split(rng, 3)
        ir_params = self.ir_model.init(
            ir_rng,
            jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32),
        )["params"]
        feat = self._features({"ir_params": ir_params}, batch["image"][:1])
        head_vars = self.model.init(head_rng, feat, train=False)
        tx = self.tx(head_vars["params"])
        return TrainState.create(
            params=head_vars["params"],
            opt_state=tx.init(head_vars["params"]),
            rng=rng,
            extra={
                "ir_params": ir_params,
                "bn_stats": head_vars.get("batch_stats", {}),
            },
        )

    def load_ir_from(self, state: TrainState, paths) -> TrainState:
        from ..training.checkpoints import load_model_from

        extra = dict(state.extra)
        extra["ir_params"] = load_model_from(paths, extra["ir_params"])
        return state.replace(extra=extra)

    def _features(self, extra, image: jax.Array) -> jax.Array:
        """pixels → pooled quantized features (frozen; reference
        models.py:73-96)."""
        ir = extra["ir_params"]
        codes = self.ir_model.apply(
            {"params": ir}, image, method=self.ir_model.encode_to_quant
        )
        b, h, w = codes.shape
        z = self.ir_model.apply(
            {"params": ir},
            codes.reshape(-1),
            method=lambda m, c: m.quantizer.decode(c),
        )
        z = z.reshape(b, h * w, -1).mean(axis=1)  # spatial mean pool
        return jax.lax.stop_gradient(z)

    def train_step(self, state: TrainState, batch):
        state, rng = state.next_rng()
        feats = self._features(state.extra, batch["image"])
        labels = batch["category"].astype(jnp.int32)

        def loss_fn(params):
            logits, updates = self.model.apply(
                {"params": params, "batch_stats": state.extra["bn_stats"]},
                feats,
                train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, updates["batch_stats"]

        (loss, bn_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        tx = self.tx(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = dict(state.extra)
        extra["bn_stats"] = bn_stats
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                extra=extra,
            ),
            {"loss": loss},
        )

    def eval_step(self, state: TrainState, batch):
        feats = self._features(state.extra, batch["image"])
        logits = self.model.apply(
            {"params": state.params, "batch_stats": state.extra["bn_stats"]},
            feats,
            train=False,
        )
        labels = batch["category"].astype(jnp.int32)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        accuracy = jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        )
        return {"loss": loss, "accuracy": accuracy}
