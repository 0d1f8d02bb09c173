"""Weight-only INT8 matmul Pallas kernel.

The decode step of the AR transformer is memory-bound: every token reads all
weights. INT8 storage halves that traffic — but only if dequantisation
happens on-chip. XLA lowers ``(w_int8.astype(bf16) * scale) @ x`` by
materialising the dequantised matrix back to HBM (measured 12× slower than
bf16); this kernel streams int8 tiles into VMEM, converts + scales in
registers, and feeds the MXU directly.

``int8_matmul(x (B, D) bf16/f32, w (D, F) int8, scale (F,) f32) → (B, F)``.
Falls back to the XLA composition off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int8_matmul"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref):
    d_idx = pl.program_id(1)

    @pl.when(d_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)  # int8 → bf16 in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(d_idx == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:] * scale_ref[:]


@functools.partial(jax.jit, static_argnames=("block_f", "block_d", "interpret"))
def _int8_matmul_pallas(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    *,
    block_f: int = 512,
    block_d: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    b, d = x.shape
    dw, f = w.shape
    assert d == dw and scale.shape == (f,)
    b_pad = _round_up(max(b, 8), 8)
    d_pad = _round_up(d, block_d) if d > block_d else _round_up(d, 128)
    block_d_eff = min(block_d, d_pad)
    f_pad = _round_up(f, block_f) if f > block_f else _round_up(f, 128)
    block_f_eff = min(block_f, f_pad)

    xp = jnp.zeros((b_pad, d_pad), x.dtype).at[:b, :d].set(x)
    wp = jnp.zeros((d_pad, f_pad), jnp.int8).at[:d, :f].set(w)
    sp = jnp.zeros((1, f_pad), jnp.float32).at[0, :f].set(scale)

    grid = (f_pad // block_f_eff, d_pad // block_d_eff)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (b_pad, block_d_eff), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_d_eff, block_f_eff),
                lambda i, j: (j, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_f_eff), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, block_f_eff), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, block_f_eff), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d_pad * f_pad,
            bytes_accessed=d_pad * f_pad + b_pad * d_pad * 2 + b_pad * f_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:b, :f]


def int8_matmul(
    x: jax.Array,
    w_int8: jax.Array,
    scale: jax.Array,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(..., D) @ int8 (D, F) * scale (F,) → (..., F) float32."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        out = _int8_matmul_pallas(x2, w_int8, scale, interpret=interpret)
    else:
        w = w_int8.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
        out = jnp.dot(
            x2.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
        )
    return out.reshape(*lead, -1)
