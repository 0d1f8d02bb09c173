#!/usr/bin/env python
"""VQGAN train-step micro-bench: the aglw probe's cost, before vs after.

VERDICT r1/r2 asked for a recorded number behind the aglw redesign. Three
timed variants of the same jitted two-optimizer train step:

- ``aglw_off``      — adaptive weight disabled (aglw_gain=None);
- ``aglw_shared``   — the shipped design: decode runs through a vjp wrt the
                      final decoder kernel, aglw costs two short pullbacks
                      reusing the training pass's own forward;
- ``aglw_reforward``— the r2 design, reproduced here for comparison: a
                      separate decode+discriminator forward inside the
                      probe (one extra generation-phase decode per iter).

Prints one JSON line with ms/step for each and the overhead ratios.

Measured on v5e (b8 128px, work_dirs/published/train_step_bench.json):
off 29.45 ms, shared 29.92 (+1.6%), reforward 29.94 (+1.7%) — the shipped
shared-forward probe is near-free, and the re-forward emulation measures
the same because XLA CSEs the duplicate decode (stop_gradient is identity
in the forward pass), i.e. the compiler was already neutralising most of
the r2 design's extra forward; the r3 restructure guarantees it
structurally instead of relying on CSE.

Usage: python tools/bench_train_step.py [--batch 8] [--size 128] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vector_quantization_tpu.cli.common import honor_env_platform  # noqa: E402

honor_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vector_quantization_tpu import algorithms as _algos  # noqa: E402,F401
from vector_quantization_tpu.algorithms.base import (  # noqa: E402
    _tree_get,
    _tree_set,
)
from vector_quantization_tpu.algorithms.vqgan import VQGANAlgorithm  # noqa: E402


class _ReforwardVQGAN(VQGANAlgorithm):
    """r2-cost emulation: the aglw probe re-runs decode + disc on its own
    forward instead of reusing the training pass's (the behavior VERDICT r2
    weak #5 flagged). Only used by this bench for the before/after record."""

    def _augment_generation_out(self, g_params, out, rng) -> dict:
        # recompute the probe exactly like r2's _aglw: fresh decode + disc
        # forward under a vjp wrt the last kernel
        z = jax.lax.stop_gradient(out["quantizer"].z)
        last = jax.lax.stop_gradient(
            _tree_get({"generator": g_params}, self._last_path)
        )
        d_params = None  # bound in train_step; probe built there instead
        out["_probe_z"] = z
        out["_probe_last"] = last
        return out

    def _extra_generation_losses(self, g_params, out, batch, extra) -> dict:
        z, last = out.pop("_probe_z"), out.pop("_probe_last")
        d_params = self._bench_d_params
        d_stats = extra["d_batch_stats"]

        def heads(kernel):
            g2 = _tree_set({"generator": g_params}, self._last_path, kernel)[
                "generator"
            ]
            pred = self.model.apply({"params": g2}, z, method=self.model.decode)
            r, _ = self._r_loss(pred, batch["image"], extra)
            logits, _ = self._disc_apply(d_params, d_stats, pred, train=False)
            return r, self.g_loss_fn(logits)

        _, pullback = jax.vjp(heads, last)
        one, zero = jnp.ones(()), jnp.zeros(())
        (r_grad,) = pullback((one, zero))
        (g_grad,) = pullback((zero, one))
        aglw = jnp.linalg.norm(r_grad.reshape(-1)) / (
            jnp.linalg.norm(g_grad.reshape(-1)) + 1e-4
        )
        # fold into the loss with zero weight: the FLOPs execute, the
        # numbers stay identical to the shipped step
        # weight ~0 (not exactly 0: XLA would DCE the probe entirely);
        # perturbs the loss by ~1e-28, keeps the r2 FLOPs in the graph
        return {"_r2_probe": jax.lax.stop_gradient(aglw) * 1e-30}


def build_algo(cls, aglw_gain, width, codebook, dim):
    model = dict(
        type="AutoencoderModel",
        encoder=dict(type="VQGANEncoder", width=width, out_channels=dim),
        quantizer=dict(
            type="VectorQuantizer",
            codebook_size=codebook,
            embedding_dim=dim,
            losses=dict(vqgan=dict(beta=0.25)),
        ),
        decoder=dict(type="VQGANDecoder", width=width, in_channels=dim),
    )
    return cls(
        model=model,
        discriminator=dict(type="PatchGANDiscriminator", width=64, depth=3),
        optimizer=dict(type="adam", lr=1e-4, betas=(0.5, 0.9)),
        recon_losses=dict(l1=dict(), mse=dict()),
        aglw_gain=aglw_gain,
        generator_start=0,
        discriminator_start=0,
    )


def time_step(algo, batch, steps=8) -> float:
    state = algo.init_state(jax.random.PRNGKey(0), batch)
    if isinstance(algo, _ReforwardVQGAN):
        algo._bench_d_params = state.params["discriminator"]

    step_fn = jax.jit(algo.train_step)

    @jax.jit
    def chained(state, batch, salt):
        b = {"image": batch["image"] * (1.0 + salt * 1e-7)}

        def body(i, st):
            st, _ = step_fn(st, b)
            return st

        return jax.lax.fori_loop(0, steps, body, state)

    state2 = chained(state, batch, jnp.float32(0))
    np.asarray(state2.step)  # compile + warm
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(state, batch, jnp.float32(i + 1)).step)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / steps


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()
    if args.tiny:
        width, codebook, dim, args.size, args.batch = 32, 64, 16, 32, 2
    else:
        width, codebook, dim = 128, 8192, 256

    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0)
            .normal(0, 0.5, (args.batch, args.size, args.size, 3))
            .astype(np.float32)
        )
    }
    t_off = time_step(build_algo(VQGANAlgorithm, None, width, codebook, dim), batch)
    t_shared = time_step(
        build_algo(VQGANAlgorithm, 0.8, width, codebook, dim), batch
    )
    t_refwd = time_step(
        build_algo(_ReforwardVQGAN, 0.8, width, codebook, dim), batch
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"VQGAN train step ms (b{args.batch} {args.size}px "
                    f"w{width} cb{codebook})"
                ),
                "aglw_off_ms": round(t_off * 1e3, 2),
                "aglw_shared_ms": round(t_shared * 1e3, 2),
                "aglw_reforward_ms": round(t_refwd * 1e3, 2),
                "aglw_cost_shared": round(t_shared / t_off - 1, 4),
                "aglw_cost_reforward": round(t_refwd / t_off - 1, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
