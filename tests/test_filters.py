"""NamedParametersFilter system (SURVEY §2.1 FreezeMixin/param filters —
r1 coverage item #11 'partial')."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vector_quantization_tpu.utils.filters import (
    NamedParametersFilter,
    filter_state_dict,
    mask_tree,
    partition_params,
)

PARAMS = {
    "encoder": {"conv_in": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}},
    "quantizer": {"codebook": jnp.ones((4, 2))},
    "decoder": {"proj_out": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}},
}


class TestFilter:
    def test_match_modes(self):
        f = NamedParametersFilter(contains=["codebook"])
        assert f("quantizer/codebook") and not f("encoder/conv_in/kernel")
        f = NamedParametersFilter(prefixes=["decoder/"])
        assert f("decoder/proj_out/bias") and not f("encoder/conv_in/bias")
        f = NamedParametersFilter(suffixes=["bias"])
        assert f("decoder/proj_out/bias") and not f("quantizer/codebook")
        f = NamedParametersFilter(regexes=[r"conv_\w+/kernel"])
        assert f("encoder/conv_in/kernel") and not f("decoder/proj_out/kernel")
        f = NamedParametersFilter(names=["quantizer/codebook"])
        assert f("quantizer/codebook") and not f("quantizer/codebook2")

    def test_empty_filter_rejected(self):
        with pytest.raises(ValueError):
            NamedParametersFilter()

    def test_mask_and_partition(self):
        mask = mask_tree(PARAMS, {"suffixes": ["bias"]})
        assert mask["encoder"]["conv_in"]["bias"] is True
        assert mask["encoder"]["conv_in"]["kernel"] is False
        frozen, trainable = partition_params(PARAMS, "codebook")
        assert set(frozen) == {"quantizer/codebook"}
        assert "decoder/proj_out/kernel" in trainable
        sd = filter_state_dict(PARAMS, {"prefixes": ["encoder/"]})
        assert set(sd) == {"encoder/conv_in/kernel", "encoder/conv_in/bias"}

    def test_optimizer_exclude_spec(self):
        from vector_quantization_tpu.training.optim import build_optimizer

        tx = build_optimizer(
            {"type": "sgd", "lr": 1.0,
             "exclude": {"contains": ["codebook"], "suffixes": ["bias"]}},
            PARAMS,
        )
        grads = jax.tree_util.tree_map(jnp.ones_like, PARAMS)
        state = tx.init(PARAMS)
        updates, _ = tx.update(grads, state, PARAMS)
        # excluded leaves get zero updates, others get -lr * grad
        np.testing.assert_allclose(
            np.asarray(updates["quantizer"]["codebook"]), 0.0
        )
        np.testing.assert_allclose(
            np.asarray(updates["encoder"]["conv_in"]["bias"]), 0.0
        )
        np.testing.assert_allclose(
            np.asarray(updates["encoder"]["conv_in"]["kernel"]), -1.0
        )
