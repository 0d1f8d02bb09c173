"""Fused nearest-codebook lookup — the framework's hot kernel.

Replaces the reference's ``torch.cdist`` + ``argmin`` encode step
(``vq/algorithms/vq/quantizers.py:92-100``) with a Pallas TPU kernel that
streams codebook tiles through VMEM, computes the distance scores on the MXU
and keeps a running (min, argmin) per input row — the N×K distance matrix is
never materialised in HBM.

Distance trick: for argmin over codes, ``‖x−e‖²`` reduces to
``‖e‖²/2 − x·e`` (monotone in e for fixed x), saving the ‖x‖² term. The
``‖e‖²/2`` row is precomputed outside the kernel (one cheap fused XLA pass
over the codebook) with padded entries set to +inf, which doubles as the
padding mask and keeps the kernel free of iota/select temporaries (VMEM
pressure is just x-tile + e-tile + one score tile).

Gradients: code ids are integer (non-differentiable); the quantized vectors
are produced by an XLA gather from the codebook, which is differentiable wrt
the codebook (that is how the codebook loss trains it — reference
``vq/algorithms/vq/losses.py:42-128``), and the straight-through estimator is
applied by the caller (:func:`vector_quantization_tpu.ops.ste.ste`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distances import normalize, pairwise_distance

__all__ = ["nearest_codes", "vq_quantize", "nearest_codes_xla"]

_BIG = 3.0e38  # python float: jnp scalars would be captured consts in pallas


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nearest_kernel(x_ref, e_ref, esq_ref, codes_ref, best_ref, idx_ref):
    """Grid = (n_tiles, k_tiles); k minor so scratch carries the running min."""
    k = pl.program_id(1)
    bk = e_ref.shape[0]

    @pl.when(k == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    xe = jax.lax.dot_general(
        x_ref[:],
        e_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BK) on the MXU
    score = esq_ref[:] - xe  # (1, BK) broadcast; padded cols are +BIG

    tile_min = jnp.min(score, axis=1, keepdims=True)  # (BN, 1)
    tile_arg = (
        jnp.argmin(score, axis=1).astype(jnp.int32).reshape(-1, 1) + k * bk
    )

    better = tile_min < best_ref[:]
    best_ref[:] = jnp.where(better, tile_min, best_ref[:])
    idx_ref[:] = jnp.where(better, tile_arg, idx_ref[:])

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        codes_ref[:] = idx_ref[:]


def _auto_block_k(k_pad: int, d_pad: int, itemsize: int) -> int:
    """Codebook tile size. Measured on v5e with
    ``dimension_semantics=("parallel", "arbitrary")`` (r4 sweep,
    work_dirs/exp/exp_lookup_r4.py, 5 interleaved trials): 4096-row tiles
    beat 2048 (r3's pick) at every block_n — 1.32x vs XLA at the f8
    16384x16384x64 shape (spread 0.04) and 0.97x at the flagship
    16384x16384x256 (kernel's best; XLA still wins there, see
    ``_default_use_pallas``). 1024-row tiles are the worst of all
    (0.65-0.77x): too little work per DMA round."""
    block = 4096
    if k_pad <= block:
        return k_pad
    # keep a tile under ~4 MB so two buffers fit VMEM alongside the x tile
    while block * d_pad * itemsize > 4 * 1024 * 1024 and block > 512:
        block //= 2
    return block


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def _nearest_codes_pallas(
    x: jax.Array,
    codebook: jax.Array,
    *,
    block_n: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    n, d = x.shape
    k, dk = codebook.shape
    assert d == dk

    if block_n is None:
        # r4 sweep: 2048-row input tiles best at every winning block_k
        # (1.318 vs 1.229 at n512, f8 shape); small inputs keep one tile
        block_n = 2048 if n >= 2048 else _round_up(max(n, 8), 8)
    d_pad = _round_up(max(d, 128), 128)
    if block_k is None:
        block_k = _auto_block_k(
            _round_up(max(k, 128), 512), d_pad, codebook.dtype.itemsize
        )
    n_pad = _round_up(max(n, 8), block_n)
    k_pad = _round_up(max(k, 128), block_k)

    xp = jnp.zeros((n_pad, d_pad), x.dtype).at[:n, :d].set(x)
    ep = jnp.zeros((k_pad, d_pad), codebook.dtype).at[:k, :d].set(codebook)
    e32 = codebook.astype(jnp.float32)
    esq = jnp.full((1, k_pad), _BIG, jnp.float32)
    esq = esq.at[0, :k].set(0.5 * jnp.sum(e32 * e32, axis=1))

    grid = (n_pad // block_n, k_pad // block_k)
    codes = pl.pallas_call(
        _nearest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_n, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_k, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # n tiles are independent; k is a sequential reduction carried
            # in scratch — declaring this lets Mosaic double-buffer the
            # codebook DMA against the distance matmul
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * d_pad,
            bytes_accessed=(
                n_pad * d_pad * x.dtype.itemsize
                + grid[0] * k_pad * d_pad * codebook.dtype.itemsize
                + n_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, ep, esq)
    return codes[:n, 0]


def nearest_codes_xla(
    x: jax.Array, codebook: jax.Array, metric: str = "l2"
) -> jax.Array:
    """XLA reference path (materialises the N×K distance matrix)."""
    d = pairwise_distance(x, codebook, metric)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def _default_use_pallas(d: int) -> bool:
    """Shipped dispatch default for :func:`nearest_codes`, by code dim.

    Measured on v5e, r4 block sweep (work_dirs/exp/exp_lookup_r4.py, five
    interleaved trials per config): with the tuned 2048x4096 tiles the
    kernel wins 1.32x vs XLA at the LlamaGen-f8 microshape
    (16384x16384x64, spread 0.04 — the XLA path's materialised N×K
    distance matrix costs relatively more when D is narrow), while at the
    flagship D=256 shape the kernel's BEST config still measures 0.97x,
    so XLA ships there (the conv encoder dominates the e2e headline at
    ~86% MFU either way). Dispatch: Pallas for narrow code dims, XLA
    otherwise; both stay selectable via ``use_pallas``.
    """
    return d < 128


def nearest_codes(
    x: jax.Array,
    codebook: jax.Array,
    metric: str = "l2",
    *,
    use_pallas: bool | None = None,
    block_n: int = 512,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Nearest-codebook assignment. x: (N, D), codebook: (K, D) → (N,) int32."""
    if metric == "cosine":
        x = normalize(x)
        codebook = normalize(codebook)
    elif metric != "l2":
        raise ValueError(f"unknown metric {metric!r}")
    if use_pallas is None:
        use_pallas = (
            _default_use_pallas(x.shape[-1]) and jax.default_backend() == "tpu"
        )
    x = jax.lax.stop_gradient(x)
    codebook = jax.lax.stop_gradient(codebook)
    if use_pallas:
        return _nearest_codes_pallas(
            x, codebook, block_n=block_n, block_k=block_k, interpret=interpret
        )
    return nearest_codes_xla(x, codebook, metric="l2")


def vq_quantize(
    x: jax.Array,
    codebook: jax.Array,
    metric: str = "l2",
    **kwargs,
) -> tuple[jax.Array, jax.Array]:
    """Assign + gather: returns (codes (N,), z (N, D)).

    ``z = codebook[codes]`` is differentiable wrt the codebook (gather);
    apply :func:`ste` on (z, x) for the straight-through forward.
    """
    codes = nearest_codes(x, codebook, metric, **kwargs)
    z = jnp.take(codebook, codes, axis=0)
    return codes, z
