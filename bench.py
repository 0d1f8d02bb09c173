"""Headline benchmarks: tokenize img/s/chip, AR decode tokens/s, serving.

SURVIVABILITY CONTRACT (VERDICT r4 #1 — BENCH_r04 was rc=124/empty
because the old all-or-nothing run took ~37 min and printed its one line
at the very end):

1. **Incremental emission**: after EVERY section the full compact record
   so far is re-printed as one JSON line (and the full record re-written
   to ``work_dirs/bench_notes.json``). The driver captures a bounded tail
   of output; the LAST complete line wins, so a timeout at any point
   loses at most the in-flight section.
2. **Wall-clock budget**: ``BENCH_BUDGET_S`` (env or ``--budget``,
   default 900 s). Between sections the clock is checked; sections that
   don't fit are marked ``{"skipped": "budget"}`` and the run ends
   cleanly. Sections are ordered so the verdict's minimum set
   {headline, mfu, ar core, serving best+staggered, train, dataplane}
   lands first; microbenches and alternates fill whatever remains.
3. **Quiet stderr**: XLA donation warnings are filtered — in the r4
   capture they flooded the tail and displaced the result line.

Every number describes the SHIPPED DEFAULT code path (the dispatch
`nearest_codes` / `int8_matmul` / `generate` resolve on TPU), and `mfu`
comes from the same run as the headline. Alternate paths are named
sub-entries; prose lives only in the sidecar notes.

Timing through the TPU tunnel: dispatch dedup and ~26ms RPC latency make
single-call timing meaningless. Short ops are timed as jitted dependent
chains (salted inputs defeat dedup; median of repeats; the differential
(t_long−t_short)/Δlinks cancels RPC). Chains that lose to jitter are
reported as null, not clamped garbage (ADVICE r2). Seconds-long calls
(generate, serving) are timed whole with the RPC overhead subtracted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import warnings
from functools import partial
from typing import Any

# XLA donation warnings flooded the r4 driver capture's tail (the serving
# window resizes legitimately cannot alias every buffer); silence them so
# the result line is what the tail contains
warnings.filterwarnings(
    "ignore", message="Some donated buffers were not usable"
)

import jax
import jax.numpy as jnp
import numpy as np

from vector_quantization_tpu import algorithms  # noqa: F401
from vector_quantization_tpu.ops import nearest_codes, nearest_codes_xla
from vector_quantization_tpu.ops.vq_lookup import _nearest_codes_pallas
from vector_quantization_tpu.registries import ModelRegistry

BATCH = 128  # throughput batch: +2% img/s over b32 (amortized dispatch)
IMG = 256
R2_HEADLINE = 1144.84  # BENCH_r02 recorded img/s — the cross-round baseline
CODEBOOK = 8192
DIM = 256
CHAIN_SHORT, CHAIN_LONG = 4, 20  # 16-link differential: ~400 ms signal vs ~10 ms tunnel jitter

# per-chip peaks for MFU / speed-of-light accounting
_CHIP_SPECS = {
    # device_kind prefix: (bf16 FLOP/s, HBM bytes/s)
    "TPU v5 lite": (197e12, 819e9),  # v5e
    "TPU v5": (459e12, 2765e9),  # v5p
    "TPU v4": (275e12, 1228e9),
}


def chip_specs() -> tuple[float, float]:
    kind = jax.devices()[0].device_kind
    for prefix, specs in _CHIP_SPECS.items():
        if kind.startswith(prefix):
            return specs
    return (197e12, 819e9)


def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _rpc_overhead() -> float:
    """Median host→device→host round trip of a trivial jitted fetch."""
    fn = jax.jit(lambda x: x + 1)
    x = jnp.zeros((), jnp.float32)
    float(fn(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


# -- tokenize ---------------------------------------------------------------


def build(
    batch=BATCH, img=IMG, codebook=CODEBOOK, dim=DIM, width=128,
    width_mults=None, normalize=False,
):
    cfg = {
        "type": "TokenizerModel",
        "encoder": {
            "type": "VQGANEncoder",
            "width": width,
            "out_channels": dim,
            "dtype": jnp.bfloat16,
        },
        "quantizer": {
            "type": "VectorQuantizer",
            "codebook_size": codebook,
            "embedding_dim": dim,
            "normalize_inputs": normalize,
        },
    }
    if width_mults is not None:
        cfg["encoder"]["width_mults"] = width_mults
    model = ModelRegistry.build(cfg)
    x = jnp.zeros((batch, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables["params"], x


def tokenize_chain(model, lookup: str, chain: int):
    """lookup: "default" (shipped dispatch), "pallas", or "xla"."""
    if lookup == "pallas" and not on_tpu():
        lookup = "xla"  # Pallas compiles on TPU only; CPU smoke uses XLA

    def encode_once(params, x):
        feat = model.apply({"params": params}, x, method=model.encode)
        b, h, w, d = feat.shape
        flat = feat.reshape(b * h * w, d).astype(jnp.bfloat16)
        codebook = params["quantizer"]["codebook"].astype(jnp.bfloat16)
        if lookup == "pallas":
            codes = _nearest_codes_pallas(flat, codebook)
        elif lookup == "xla":
            codes = nearest_codes_xla(flat, codebook)
        else:
            codes = nearest_codes(flat, codebook)
        return codes.reshape(b, h, w)

    @jax.jit
    def chained(params, x, salt):
        def body(i, carry):
            x, acc = carry
            codes = encode_once(params, x)
            # dependent perturbation: each link must execute before the next
            x = x * (1.0 + (codes[0, 0, 0] % 3).astype(x.dtype) * 1e-7)
            return (x, acc + codes.sum())

        _, acc = jax.lax.fori_loop(
            0, chain, body, (x * (1.0 + salt * 1e-7), jnp.zeros((), jnp.int32))
        )
        return acc

    return chained


def images_per_sec_pair(
    model, params, x, lookup_a: str, lookup_b: str | None = None
) -> tuple[float | None, float | None]:
    """Time two lookup paths INTERLEAVED (a_short, b_short, a_long, b_long
    round-robin): machine drift between runs is ±1-2%, the same order as
    the paths' true gap, so back-to-back measurement decides vs_baseline
    by coin flip — interleaving cancels the drift. With ``lookup_b=None``
    only one path is compiled/timed (the differential chain is
    self-contained, so the absolute rate needs no companion — halves the
    headline section's compile count for the budget)."""
    lookups = (lookup_a,) if lookup_b is None else (lookup_a, lookup_b)
    fns = {
        (lk, chain): tokenize_chain(model, lk, chain)
        for lk in lookups
        for chain in (CHAIN_SHORT, CHAIN_LONG)
    }
    for fn in fns.values():  # compile everything first
        float(fn(params, x, jnp.float32(0)))
    ts = {key: [] for key in fns}
    for i in range(5):
        for key, fn in fns.items():
            t0 = time.perf_counter()
            # unique salt per call: the tunnel dedups identical dispatches
            float(fn(params, x, jnp.float32(i + 1)))
            ts[key].append(time.perf_counter() - t0)

    def rate(lk):
        t_s = sorted(ts[(lk, CHAIN_SHORT)])[2]
        t_l = sorted(ts[(lk, CHAIN_LONG)])[2]
        if t_l <= t_s:  # jitter swallowed the signal: invalid, not clamped
            return None
        return x.shape[0] * (CHAIN_LONG - CHAIN_SHORT) / (t_l - t_s)

    return rate(lookup_a), (rate(lookup_b) if lookup_b is not None else None)


def tokenize_flops_per_image(model, params, x) -> float:
    """Compiled FLOPs of one encode+lookup pass, per image."""

    def encode_once(params, x):
        feat = model.apply({"params": params}, x, method=model.encode)
        b, h, w, d = feat.shape
        flat = feat.reshape(b * h * w, d).astype(jnp.bfloat16)
        cb = params["quantizer"]["codebook"].astype(jnp.bfloat16)
        return nearest_codes_xla(flat, cb).sum()

    cost = jax.jit(encode_once).lower(params, x).compile().cost_analysis()
    return float(cost["flops"]) / x.shape[0]


def lookup_kernel_tflops(overhead: float, n=16384, k=16384, d=256) -> dict:
    """Fused Pallas nearest-code kernel vs XLA at a lookup-bound shape.
    FLOPs = 2·N·K·D for the distance matmul. Single long chain with the
    RPC overhead subtracted; n=5 trials INTERLEAVED across the two paths
    (machine drift between back-to-back runs is the same order as the
    paths' gap — VERDICT r3 #2 asks for repeat/variance in the record)."""
    chain = 128  # ~0.8 ms/link: enough signal to dwarf tunnel jitter
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    e = jax.random.normal(jax.random.PRNGKey(1), (k, d), jnp.bfloat16)

    def chained_fn(fn):
        @jax.jit
        def chained(x, e, salt):
            def body(i, carry):
                x, acc = carry
                codes = fn(x.astype(jnp.bfloat16), e)
                x = x * (1.0 + (codes[0] % 3).astype(jnp.float32) * 1e-7)
                return (x, acc + codes.sum())

            _, acc = jax.lax.fori_loop(
                0, chain, body,
                (x * (1.0 + salt * 1e-9), jnp.zeros((), jnp.int32)),
            )
            return acc

        return chained

    fns = {
        "xla": chained_fn(nearest_codes_xla),
        "pallas": chained_fn(_nearest_codes_pallas),
    }
    ts: dict[str, list[float]] = {name: [] for name in fns}
    for fn in fns.values():
        float(fn(x, e, jnp.float32(0)))  # compile
    trials = 5
    for i in range(trials):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            float(fn(x, e, jnp.float32(i + 1)))
            ts[name].append(time.perf_counter() - t0)

    flops = 2.0 * n * k * d
    peak, _ = chip_specs()

    def stats(name):
        per = sorted((t - overhead) / chain for t in ts[name])
        med = per[trials // 2]
        if med <= 0 or flops / med > peak * 1.02:
            return None, None  # jitter/corruption: null, not garbage
        spread = (per[-1] - per[0]) / med
        return med, round(spread, 3)

    t_xla, xla_spread = stats("xla")
    t_pallas, pallas_spread = stats("pallas")
    out = {
        "shape": f"{n}x{k}x{d}",
        "trials": trials,
        "xla_tflops": round(flops / t_xla / 1e12, 1) if t_xla else None,
        "xla_spread": xla_spread,
    }
    if t_pallas:
        out["pallas_tflops"] = round(flops / t_pallas / 1e12, 1)
        out["pallas_frac_peak"] = round(flops / t_pallas / peak, 3)
        out["pallas_spread"] = pallas_spread
    if t_pallas and t_xla:
        out["speedup_vs_xla"] = round(t_xla / t_pallas, 2)
    return out


# -- AR decode --------------------------------------------------------------

AR_BATCH = 8
AR_SERVE_BATCH = 64  # serving operating point: weight reads amortize
AR_LONG = 256
NUM_CATEGORIES, AR_CODEBOOK = 1000, 16384
AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)


def _ar_build(quantize: bool, params=None, max_length=1 + AR_LONG):
    from vector_quantization_tpu.models.transformers.llama import (
        LlamaTransformer,
        quantize_params_int8,
    )

    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=max_length,
        dtype=jnp.bfloat16,
        quantize=quantize,
        **AR_CFG,
    )
    if params is None:
        params = tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
            "params"
        ]
    if quantize:
        params = quantize_params_int8(params)
    return tr, params


def _ar_time(tr, params, num_tokens: int, batch: int, cache_dtype=None) -> float:
    """Median wall time of one full generate() call (batch, num_tokens)."""
    from vector_quantization_tpu.tasks.sequence_modeling import (
        TokenCodebook,
        generate,
    )

    codebook = TokenCodebook(NUM_CATEGORIES + 1, AR_CODEBOOK)
    prefix = jnp.zeros((batch, 1), jnp.int32)

    kw = {} if cache_dtype is None else {"cache_dtype": cache_dtype}

    def run(params, prefix, key):
        return generate(
            tr, params, prefix, num_tokens, codebook, key,
            sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
            **kw,
        )

    fn = jax.jit(run)
    np.asarray(fn(params, prefix, jax.random.PRNGKey(1)))  # compile+warmup
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(params, prefix, jax.random.PRNGKey(2 + i)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


def ar_tokens_per_sec(
    quantize: bool, batch: int, overhead: float, params=None, cache_dtype=None
) -> tuple[float, Any]:
    """tokens/s/chip from one timed generate, RPC overhead subtracted."""
    tr, params_used = _ar_build(quantize, params)
    t = _ar_time(tr, params_used, AR_LONG, batch, cache_dtype)
    per_tok = max(t - overhead, 1e-9) / AR_LONG
    return batch / per_tok, params_used


def int8_kernel_microbench(overhead: float) -> dict:
    """Shipped int8_matmul vs bf16 over 24 DISTINCT decode-FFN weight
    matrices per pass (a single looped weight stays VMEM-resident and
    measures the MXU, not HBM — 24 layers' weights evict each other like
    the real decode loop). Reports ms/pass and achieved weight GB/s.

    Methodology (VERDICT r4 #4 — the r4 capture's spread was 1.886 at
    n=5, which supports no claim): each timed call previously ran a
    ~30 ms chain, the same order as the tunnel's RPC jitter, so per-trial
    noise swamped the signal. Now the chain is ~250 ms (chain=512),
    trials are interleaved AND order-alternated (int8 first on even
    trials, bf16 first on odd — cancels slow drift), and when the
    min-to-max spread still exceeds 0.3 the record says
    ``"unstable": true`` and carries NO speedup number."""
    from vector_quantization_tpu.ops.int8_matmul import int8_matmul

    b, d, f = AR_SERVE_BATCH, 1024, 2816
    layers, chain = 24, 512
    key = jax.random.PRNGKey(0)
    ws = jax.random.normal(key, (layers, d, f), jnp.float32) * 0.02
    scale = jnp.maximum(jnp.abs(ws).max(axis=1) / 127.0, 1e-8)  # (L, f)
    ws_i8 = jnp.clip(
        jnp.round(ws / scale[:, None, :]), -127, 127
    ).astype(jnp.int8)
    ws_bf = ws.astype(jnp.bfloat16)

    def chained_fn(fn):
        @jax.jit
        def chained(x0, salt, weights, scales):
            def body(i, carry):
                x, acc = carry

                def layer(j, xa):
                    x, acc = xa
                    out = fn(x, weights[j], scales[j] if scales is not None else None)
                    x2 = (out[:, :d] * 1e-3).astype(x.dtype)
                    return (x2, acc + out[0, 0])

                x, acc = jax.lax.fori_loop(0, layers, layer, (x, acc))
                x = x * (1.0 + salt * 1e-9)
                return (x, acc)

            _, acc = jax.lax.fori_loop(
                0, chain, body,
                (x0 * (1.0 + salt * 1e-9), jnp.zeros((), jnp.float32)),
            )
            return acc

        return chained

    x0 = jnp.ones((b, d), jnp.bfloat16)
    runs = {
        "int8": (
            chained_fn(lambda x, w, s: int8_matmul(x, w, s)), ws_i8, scale,
        ),
        "bf16": (
            chained_fn(
                lambda x, w, s: jnp.dot(
                    x, w, preferred_element_type=jnp.float32
                )
            ),
            ws_bf,
            None,
        ),
    }
    for fn, w, s in runs.values():
        float(fn(x0, jnp.float32(0), w, s))  # compile
        float(fn(x0, jnp.float32(0.5), w, s))  # warm execution path
    trials = 7
    ts: dict[str, list[float]] = {name: [] for name in runs}
    order = list(runs.items())
    for i in range(trials):
        for name, (fn, w, s) in (order if i % 2 == 0 else order[::-1]):
            t0 = time.perf_counter()
            float(fn(x0, jnp.float32(i + 1), w, s))
            ts[name].append(time.perf_counter() - t0)

    def stats(name):
        per = sorted((t - overhead) / chain for t in ts[name])
        med = per[trials // 2]
        if med <= 0:
            return None, None
        return med, round((per[-1] - per[0]) / med, 3)

    t_i8, i8_spread = stats("int8")
    t_bf, bf_spread = stats("bf16")
    out = {"shape": f"{layers}x({b}x{d}x{f})", "trials": trials}
    if t_i8:
        out["int8_ms_per_pass"] = round(t_i8 * 1e3, 3)
        out["int8_weight_gb_s"] = round(layers * d * f / t_i8 / 1e9, 1)
        out["int8_spread"] = i8_spread
    if t_bf:
        out["bf16_ms_per_pass"] = round(t_bf * 1e3, 3)
        out["bf16_weight_gb_s"] = round(layers * d * f * 2 / t_bf / 1e9, 1)
        out["bf16_spread"] = bf_spread
    if t_i8 and t_bf:
        # a spread above 0.3 means the MEASUREMENT failed, not the
        # kernel: refuse to print a speedup that is a noise draw
        if max(i8_spread, bf_spread) > 0.3:
            out["unstable"] = True
        else:
            out["int8_speedup"] = round(t_bf / t_i8, 2)
    return out


def ar_step_bytes(
    int8: bool, batch: int, avg_kv_rows: float, kv_int8: bool = False
) -> float:
    """HBM bytes read per decode step (the decode SOL denominator):
    weights (shared across the batch) + the KV rows attention actually
    reads (length-aware decode averages ~(5/8)·L_max with kv_segment=64).
    kv_int8: 1-byte KV codes + the per-(position, head) f32 scale planes."""
    d, layers = AR_CFG["hidden_size"], AR_CFG["num_layers"]
    ffn = AR_CFG["ffn_dim"]
    heads = AR_CFG["num_heads"]
    vocab = NUM_CATEGORIES + 1 + AR_CODEBOOK
    proj = layers * (4 * d * d + 3 * d * ffn)
    head = vocab * d
    per = 1 if int8 else 2
    kv_row = d * (1 if kv_int8 else 2) + (heads * 4 if kv_int8 else 0)
    kv = layers * batch * avg_kv_rows * kv_row * 2  # k+v
    return proj * per + head * (1 if int8 else 4) + kv


# -- serving ----------------------------------------------------------------


def serving_bench(
    fp_params,
    overhead: float,
    *,
    quantize: bool = False,
    cache_dtype=jnp.int8,
    steps_per_sync: int = 128,
    patterns: tuple = ("aligned",),
) -> dict:
    """ARServer end-to-end at the production recipe, one result dict per
    arrival pattern — ALL patterns share one server, so the jitted decode
    variants compile once (remote compiles dominate the section's cost,
    VERDICT r4 #1). Counts only delivered image tokens (CFG pairs two
    lanes per stream); each result carries the decode-step waste
    breakdown (VERDICT r3 #3).

    steps_per_sync 128: a 256-image-token request is exactly 256 decode
    steps (the prefill token is consumed by the first scan step), so 128
    divides it with ZERO overshoot in 2 syncs/wave — each host sync costs
    a ~27 ms tunnel RPC, and k=128 measured +6% steady-state over k=64.

    Patterns:
    - "aligned": 64 requests up front (two full waves) — the offline
      batch case.
    - "staggered" (VERDICT r4 #2): requests ARRIVE OVER TIME — 16 up
      front, 16 more after every host sync until 96 total, then drain.
      That is a SATURATING staggered load: from sync 3 the server holds
      two 16-stream cohorts permanently offset by 128 columns (a
      256-step request turns over every 2 syncs, refilled by arrivals),
      so every scan decodes mixed slot positions — the
      continuous-batching north star — while ramp-in and drain leave
      honest nonzero idle fractions. (8/sync offered only half the
      server's capacity and measured idle_lane_frac 0.50 — an
      arrival-limited number that says nothing about the engine.)
    """
    from vector_quantization_tpu.models.transformers.llama import (
        LlamaTransformer,
        fuse_llama_params,
        quantize_params_int8,
    )
    from vector_quantization_tpu.tasks.sequence_modeling import TokenCodebook
    from vector_quantization_tpu.tasks.serving import ARServer

    image_tokens = AR_LONG
    slots = AR_SERVE_BATCH  # 64 batch rows = 32 CFG request streams
    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=1 + image_tokens + steps_per_sync,
        dtype=jnp.bfloat16,
        quantize=quantize,
        fused_qkv=True,  # bit-exact, measured +11% serving throughput
        **AR_CFG,
    )
    params = quantize_params_int8(fp_params) if quantize else fp_params
    params = fuse_llama_params(params)
    cb = TokenCodebook(NUM_CATEGORIES + 1, AR_CODEBOOK)

    server = ARServer(
        tr, params, cb,
        image_tokens=image_tokens,
        batch_slots=slots,
        sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
        cfg_alpha=1.75,
        uncond_token=NUM_CATEGORIES,
        steps_per_sync=steps_per_sync,
        cache_dtype=cache_dtype,
    )

    def serve(n, staggered):
        # SAME server throughout: the jitted decode closure (and its
        # per-window compiled variants) lives on the server
        if staggered:
            submitted = 0
            for _ in range(min(16, n)):
                server.submit(category=submitted % NUM_CATEGORIES)
                submitted += 1
            t0 = time.perf_counter()
            done = []
            while server.pending or submitted < n:
                done.extend(server.step())
                for _ in range(min(16, n - submitted)):
                    server.submit(category=submitted % NUM_CATEGORIES)
                    submitted += 1
            dt = time.perf_counter() - t0
        else:
            for i in range(n):
                server.submit(category=i % NUM_CATEGORIES)
            t0 = time.perf_counter()
            done = server.run_until_drained()
            dt = time.perf_counter() - t0
        assert len(done) == n, (len(done), n)
        return dt

    out = {}
    warmed = False
    for pattern in patterns:
        staggered = pattern == "staggered"
        requests = 96 if staggered else 64
        # warmup 1.5 waves (aligned) / a shortened arrival ramp
        # (staggered, reaching the steady-state window buckets once):
        # covers every decode variant the timed pattern will hit. After
        # the first pattern only the other pattern's extra window
        # buckets compile (shared server).
        serve(40 if staggered and warmed else (72 if staggered else 48),
              staggered)
        warmed = True
        for key in server.stats:  # count only the timed run
            server.stats[key] = (
                0 if isinstance(server.stats[key], int) else 0.0
            )
        dt = serve(requests, staggered)
        tokens = requests * image_tokens
        rep = server.efficiency_report()
        out[pattern] = {
            "tokens_per_s": round(tokens / dt, 1),
            "images_per_min": round(requests / dt * 60.0, 1),
            "requests": requests,
            "slots": slots,
            "steps_per_sync": steps_per_sync,
            "staggered": staggered,
            "host_rpc_ms_per_sync": round(overhead * 1e3, 1),
            "idle_lane_frac": rep.get("idle_lane_frac"),
            "overshoot_frac": rep.get("overshoot_frac"),
            "host_frac": rep.get("host_frac"),
        }
    return out


def serving_tokens_per_sec(
    fp_params,
    overhead: float,
    *,
    quantize: bool = False,
    cache_dtype=jnp.int8,
    steps_per_sync: int = 128,
    staggered: bool = False,
) -> dict:
    """Single-pattern wrapper around :func:`serving_bench`."""
    pattern = "staggered" if staggered else "aligned"
    return serving_bench(
        fp_params, overhead, quantize=quantize, cache_dtype=cache_dtype,
        steps_per_sync=steps_per_sync, patterns=(pattern,),
    )[pattern]


# -- train step -------------------------------------------------------------


def train_step_bench(overhead: float, on_tpu_: bool) -> dict:
    """Tokenizer train-step throughput (VERDICT r3 missing #5): one jitted
    VQGAN G+D iter at 256px (recipe: configs/vqgan/interface.py, global
    batch 96) and one VQ-KD CLIP-B/16 iter at 224px (configs/vqkd/
    interface.py, global batch 512). Per-chip batch here; img/s scales with
    DP chips (gradient psum overlaps compute). MFU from the same compiled
    step's XLA cost analysis. (The AR train bench is its own budget
    section — ``_ar_train_bench``.)"""
    from vector_quantization_tpu.registries import AlgorithmRegistry

    peak_flops, _ = chip_specs()
    if on_tpu_:
        vqgan_batch, vqkd_batch = 16, 64
        vqgan_img, vqkd_img = 256, 224
        steps = 8
    else:  # CPU smoke fallback (DRY_RUN-sized shapes, tiny images)
        vqgan_batch, vqkd_batch = 2, 2
        vqgan_img, vqkd_img = 64, 64
        steps = 2

    vqgan_cfg = {
        "type": "VQGANAlgorithm",
        "model": {
            "type": "AutoencoderModel",
            "encoder": {
                "type": "VQGANEncoder",
                "width": 128 if on_tpu_ else 32,
                "out_channels": 256,
                "dtype": jnp.bfloat16,
            },
            "quantizer": {
                "type": "VectorQuantizer",
                "codebook_size": 8192,
                "embedding_dim": 256,
                "losses": {"vqgan": {"beta": 0.25}},
            },
            "decoder": {
                "type": "VQGANDecoder",
                "width": 128 if on_tpu_ else 32,
                "in_channels": 256,
                "dtype": jnp.bfloat16,
            },
        },
        "discriminator": {
            "type": "PatchGANDiscriminator",
            "width": 64 if on_tpu_ else 16,
            "depth": 3,
        },
        "optimizer": {"type": "adam", "lr": 5.4e-5, "betas": (0.5, 0.9)},
        "d_optimizer": {"type": "adam", "lr": 4.32e-4, "betas": (0.5, 0.9)},
        "recon_losses": (
            {"l1": {}, "lpips": {"weight": 1.0}} if on_tpu_ else {"l1": {}}
        ),
    }
    vqkd_cfg = {
        "type": "VQKDAlgorithm",
        "model": {
            "type": "AutoencoderModel",
            "encoder": {
                "type": "ViTEncoder",
                "img_size": vqkd_img,
                "patch_size": 16,
                "out_channels": 32,
            },
            "quantizer": {
                "type": "VectorQuantizer",
                "codebook_size": 8192,
                "embedding_dim": 32,
                "distance": "cosine",
                "normalize_inputs": True,
                "codebook_init": "normal",
                "losses": {"commitment": {"weight": 1.0}},
            },
            "pre_decode": {"type": "ConvConnector", "out_channels": 32},
            "decoder": {
                "type": "ViTDecoder",
                "img_size": vqkd_img // 16,
                "patch_size": 1,
                "in_channels": 32,
                "out_channels": 512,
                "depth": 3,
            },
        },
        "teacher": {"type": "CLIPTeacher", "proj_dim": 512},
        "optimizer": {"type": "adamw", "lr": 2e-4, "exclude": "codebook"},
    }
    if on_tpu_:
        vqkd_cfg["model"]["encoder"]["dtype"] = jnp.bfloat16
        vqkd_cfg["model"]["decoder"]["dtype"] = jnp.bfloat16
    if not on_tpu_:
        # CPU smoke: shrink the ViTs so compile stays in budget
        for part in ("encoder", "decoder"):
            vqkd_cfg["model"][part].update(
                embed_dim=64, depth=2, num_heads=2
            )
        vqkd_cfg["teacher"].update(embed_dim=64, depth=2, num_heads=2)
        vqkd_cfg["model"]["decoder"]["out_channels"] = 64
        vqkd_cfg["teacher"]["proj_dim"] = 64

    out = {}
    for tag, cfg, batch, img in (
        ("vqgan_256px", vqgan_cfg, vqgan_batch, vqgan_img),
        ("vqkd_224px", vqkd_cfg, vqkd_batch, vqkd_img),
    ):
        try:
            algo = AlgorithmRegistry.build(cfg)
            rng = jax.random.PRNGKey(0)
            batch_d = {
                "image": jnp.zeros((batch, img, img, 3), jnp.float32),
                "original_image": jnp.zeros(
                    (batch, img, img, 3), jnp.uint8
                ),
            }
            state = algo.init_state(rng, batch_d)
            step = jax.jit(algo.train_step, donate_argnums=0)
            flops = float(
                step.lower(state, batch_d).compile().cost_analysis()["flops"]
            )
            state, warm = step(state, batch_d)  # lazy inits (k-means) fire
            # sync via a value fetch — block_until_ready is a no-op on the
            # dev tunnel until the process's first device->host fetch
            np.asarray(jax.tree_util.tree_leaves(warm)[0])
            # median of 3 rounds + spread (see _ar_train_bench note)
            rounds = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(steps):
                    state, metrics = step(state, batch_d)
                np.asarray(jax.tree_util.tree_leaves(metrics)[0])
                # also await a state leaf: the metrics fetch only awaits
                # the loss dependency chain, not the last optimizer update
                np.asarray(
                    jax.tree_util.tree_leaves(state)[0].ravel()[0]
                )
                rounds.append((time.perf_counter() - t0 - overhead) / steps)
            dt = sorted(rounds)[1]
            out[tag] = {
                "img_per_s": round(batch / dt, 2),
                "step_ms": round(dt * 1e3, 1),
                "batch": batch,
                "mfu": round(flops / dt / peak_flops, 3),
                "spread": round((max(rounds) - min(rounds)) / dt, 3),
            }
        except Exception as exc:  # record, don't kill the artifact
            out[tag] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    return out


def _ar_train_bench(
    overhead: float,
    peak_flops: float,
    batch: int,
    steps: int,
    full_size: bool = True,
) -> dict:
    """Stage-2 AR training: teacher-forced CE step on Llama-medium over
    [class | 256 image codes] sequences (reference recipe: batch 256
    global, configs/llamagen/ar.py — per-chip batch here, scales with DP).
    The AR stage trains on pre-tokenized corpora (tools/tokenize_llamagen),
    so the step is transformer + CE + AdamW only."""
    import optax

    from vector_quantization_tpu.models.transformers.llama import (
        LlamaTransformer,
    )
    from vector_quantization_tpu.tasks.sequence_modeling import next_token_ce

    try:
        cfg = (
            AR_CFG
            if full_size
            else dict(hidden_size=128, num_layers=2, num_heads=2, ffn_dim=256)
        )
        tr = LlamaTransformer(
            vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
            max_length=1 + AR_LONG,
            dtype=jnp.bfloat16,
            remat=True,  # full per-block remat — the shipped r5 recipe:
            # with the fused logits-free CE the b64 step needs 5.6 GB
            # temp (vs 10.5 GB for dense CE + dots policy), which is
            # what lets batch 128 fit (7.5 GB; work_dirs/exp/
            # exp_mem_r5.py) — and b128 measured the best stable
            # tokens/s of every per-process variant (work_dirs/exp/
            # exp_proc_r5.py: 24.7k vs base-dots-b64 ~19k)
            **cfg,
        )
        tokens = jnp.zeros((batch, 1 + AR_LONG), jnp.int32)
        params = tr.init(jax.random.PRNGKey(0), tokens[:1, :8])["params"]
        tx = optax.adamw(1e-4, weight_decay=5e-2)
        opt_state = tx.init(params)

        # donating params+opt_state avoids double-buffering ~4 GB of
        # f32 params/optimizer state across the update
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, tokens):
            def loss_fn(p):
                if full_size:
                    # shipped ARAlgorithm default: fused logits-free CE
                    return tr.apply(
                        {"params": p}, tokens, fused_ce_targets=tokens
                    )
                return next_token_ce(tr.apply({"params": p}, tokens), tokens)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        compiled = None
        for attempt in range(4):  # the tunnel's remote-compile service
            try:  # occasionally drops a response mid-read (INTERNAL) or
                # its tpu_compile_helper subprocess dies (HTTP 500, seen
                # once in the r4 capture); backoff gives it time to respawn
                compiled = step.lower(params, opt_state, tokens).compile()
                break
            except Exception:
                if attempt == 3:
                    raise
                time.sleep(5 * (attempt + 1))
        flops = float(compiled.cost_analysis()["flops"])
        params, opt_state, warm_loss = step(params, opt_state, tokens)
        # sync via a VALUE fetch, not block_until_ready: through the dev
        # tunnel block_until_ready is a no-op until the process's first
        # device->host fetch (measured: a b64 Llama-medium train step
        # "timed" at 3 ms/step standalone vs the real 494 ms), so a fetch
        # both warms the path and guarantees the timed loop is synchronous
        float(warm_loss)
        # median of 3 timed rounds + spread: the full-vocab train step's
        # wall time through the dev tunnel drifts run-to-run (r5 measured
        # the SAME compiled program at 621-2455 ms across sessions,
        # work_dirs/exp/exp_bisect_r5.py) — a single round supports no
        # cross-round comparison; the spread is recorded so readers can
        # judge the number (int8-microbench methodology, VERDICT r4 #4)
        rounds = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                params, opt_state, loss = step(params, opt_state, tokens)
            float(loss)
            # await a params leaf too: the loss fetch does not await the
            # last step's optimizer update (ADVICE r4)
            np.asarray(jax.tree_util.tree_leaves(params)[0].ravel()[0])
            rounds.append((time.perf_counter() - t0 - overhead) / steps)
        dt = sorted(rounds)[1]
        # honest MFU: model flops = cost_analysis of the least-recompute
        # lowering (fused CE + dots policy, 32.51 TFLOP at b64 —
        # work_dirs/exp/exp_mem_r5.py), NOT this full-remat program's
        # compiled flops (+24% self-inflicted recompute); both reported
        model_flops = 32514.8e9 * (batch / 64) if full_size else flops
        return {
            "tokens_per_s": round(batch * (1 + AR_LONG) / dt, 1),
            "img_per_s": round(batch / dt, 2),
            "step_ms": round(dt * 1e3, 1),
            "batch": batch,
            "mfu": round(model_flops / dt / peak_flops, 3),
            "mfu_compiled": round(flops / dt / peak_flops, 3),
            "spread": round((max(rounds) - min(rounds)) / dt, 3),
        }
    except Exception as exc:
        if batch > 32:
            # any recorded number beats an error row: retry at half the
            # batch before giving up (128 -> 64 -> 32)
            out = _ar_train_bench(
                overhead, peak_flops, max(batch // 2, 32), steps, full_size
            )
            if "error" not in out:
                out.setdefault(
                    "note", f"b{batch} failed ({type(exc).__name__}); "
                    f"b{max(batch // 2, 32)} fallback"
                )
                return out
        return {"error": f"{type(exc).__name__}: {exc}"[:200]}


# -- dataplane --------------------------------------------------------------


def _pristine_upload_probe() -> float | None:
    """Host→device link rate from a FRESH process (before its first jit),
    demonstrating the dev tunnel's post-jit transfer cliff (see
    dataplane_tokenize). Costs a full jax cold start — opt-in."""
    try:
        import subprocess

        probe = (
            "import numpy as np, jax, time;"
            "a=[np.random.default_rng(i).integers(0,256,(32,256,256,3),"
            "np.uint8) for i in range(4)];"
            "jax.block_until_ready(jax.device_put(a[0]));"
            "t0=time.perf_counter();"
            "b=[jax.device_put(x) for x in a];"
            "jax.block_until_ready(b);"
            "print(4*32*256*256*3/1e6/(time.perf_counter()-t0))"
        )
        res = subprocess.run(
            [sys.executable, "-c", probe],
            capture_output=True, text=True, timeout=240,
        )
        return round(float(res.stdout.strip().split()[-1]), 1)
    except Exception:
        return None


def dataplane_tokenize(model, params, probe_pristine: bool = False) -> dict | None:
    """JPEG-on-disk → native C++ decode → host→device upload → tokenize.

    The headline feeds jnp.zeros already in HBM; this section carries the
    real input path WITH per-stage rates (VERDICT r3 missing #4: the e2e
    gap is the host→device transfer, so measure it as its own stage and
    overlap it — pipeline = decode thread ∥ upload thread ∥ compute)."""
    from vector_quantization_tpu.data.native import get_decoder

    dec = get_decoder()
    if dec is None:
        return None
    n_images, batch = 256, 32  # decode batch independent of the headline's
    tmp = tempfile.mkdtemp(prefix="vqt_bench_jpeg_")
    try:
        from PIL import Image

        rng = np.random.default_rng(0)
        paths = []
        for i in range(n_images):
            arr = rng.integers(0, 256, (IMG, IMG, 3), np.uint8)
            p = os.path.join(tmp, f"{i:04d}.jpg")
            Image.fromarray(arr).save(p, quality=90)
            paths.append(p)

        @jax.jit
        def tokenize(params, x_u8):
            # pixel codec on device: upload uint8 (4x fewer bytes over the
            # host link than f32), normalize fused into the encoder
            x = x_u8.astype(jnp.float32) / 127.5 - 1.0
            feat = model.apply({"params": params}, x, method=model.encode)
            b, h, w, d = feat.shape
            flat = feat.reshape(b * h * w, d).astype(jnp.bfloat16)
            cb = params["quantizer"]["codebook"].astype(jnp.bfloat16)
            return nearest_codes(flat, cb).reshape(b, h, w)

        seeds = np.zeros((batch,), np.uint64)
        # warmup (compile + thread pool spin-up)
        pix, _ = dec.decode_batch(paths[:batch], IMG, "none", seeds)
        np.asarray(tokenize(params, jnp.asarray(pix)))

        # decode-only rate (host CPU)
        t0 = time.perf_counter()
        batches = []
        for i in range(0, n_images, batch):
            pix, _ = dec.decode_batch(paths[i : i + batch], IMG, "none", seeds)
            batches.append(pix)
        t_decode = time.perf_counter() - t0

        # upload-only rate (host→device link): device_put the pre-decoded
        # uint8 batches back to back, block at the end
        bufs = [jax.device_put(b_) for b_ in batches[:1]]  # transfer warmup
        jax.block_until_ready(bufs[-1])
        t0 = time.perf_counter()
        bufs = [jax.device_put(b_) for b_ in batches]
        jax.block_until_ready(bufs[-1])
        t_upload = time.perf_counter() - t0
        mb = n_images * IMG * IMG * 3 / 1e6

        # dev-tunnel artifact (measured r4): the SAME link moves ~1.6 GB/s
        # until the process executes its first jitted computation, then
        # caps at ~25-45 MB/s (no workaround found: batched puts, one big
        # buffer, implicit args all capped). Prove it per-run with a
        # pristine subprocess so the e2e gap is attributed to the tunnel,
        # not the pipeline. Opt-in (--probe-pristine): the subprocess pays
        # a full jax cold start (~1 min) the budget usually spends better.
        pristine_mb_s = _pristine_upload_probe() if probe_pristine else None

        # compute-only rate at this batch (device-resident input)
        outs = [tokenize(params, b_) for b_ in bufs]
        np.asarray(outs[-1])
        t0 = time.perf_counter()
        outs = [tokenize(params, b_) for b_ in bufs]
        np.asarray(outs[-1])
        t_compute = time.perf_counter() - t0
        del bufs, outs

        # sequential: decode → upload → compute, no overlap
        t0 = time.perf_counter()
        outs = []
        for i in range(0, n_images, batch):
            pix, _ = dec.decode_batch(
                paths[i : i + batch], IMG, "none", seeds
            )
            outs.append(tokenize(params, jnp.asarray(pix)))
        np.asarray(outs[-1])
        t_seq = time.perf_counter() - t0

        # pipelined: a decode thread prefetches; the consumer issues the
        # (async) device_put + tokenize dispatch, so upload and compute
        # overlap through the dispatch queue. A separate uploader THREAD
        # measured slower — concurrent tunnel clients contend.
        import queue
        import threading

        q_raw: queue.Queue = queue.Queue(maxsize=4)

        def producer():
            for i in range(0, n_images, batch):
                pix, _ = dec.decode_batch(
                    paths[i : i + batch], IMG, "none", seeds
                )
                q_raw.put(pix)
            q_raw.put(None)

        t0 = time.perf_counter()
        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        outs = []
        while True:
            pix = q_raw.get()
            if pix is None:
                break
            outs.append(tokenize(params, jax.device_put(pix)))
        np.asarray(outs[-1])
        t_pipe = time.perf_counter() - t0
        thread.join()
        return {
            # e2e = the better of the two forms — what DataLoader's
            # pipeline="auto" calibration ships (VERDICT r4 #6); both
            # rates stay recorded every round
            "img_per_s_e2e": round(n_images / min(t_pipe, t_seq), 1),
            "e2e_mode": "pipelined" if t_pipe <= t_seq else "sequential",
            "img_per_s_e2e_pipelined": round(n_images / t_pipe, 1),
            "img_per_s_e2e_sequential": round(n_images / t_seq, 1),
            "img_per_s_decode_only": round(n_images / t_decode, 1),
            "img_per_s_upload_only": round(n_images / t_upload, 1),
            "upload_mb_s": round(mb / t_upload, 1),
            "upload_mb_s_pristine": pristine_mb_s,  # fresh-process link
            # rate: the tunnel caps transfers ~40x lower after the first
            # jit executes (dev-tunnel artifact; production hosts don't)
            "img_per_s_compute_only": round(n_images / t_compute, 1),
            "decode_threads": dec.num_threads,
            "host_cpus": os.cpu_count(),
        }
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


# -- main -------------------------------------------------------------------


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--budget", type=float,
        default=float(os.environ.get("BENCH_BUDGET_S", "900")),
        help="wall-clock budget in seconds; sections that don't fit are "
        "marked skipped (VERDICT r4 #1)",
    )
    parser.add_argument(
        "--fast", action="store_true",
        help="minimum section set only (headline/ar/serving/train/dataplane)",
    )
    parser.add_argument(
        "--probe-pristine", action="store_true",
        help="run the fresh-subprocess upload probe in the dataplane section",
    )
    parser.add_argument(
        "--skip-ar", action="store_true",
        help="tokenize metrics only (fast smoke)",
    )
    parser.add_argument(
        "--skip-serving", action="store_true",
        help="skip the continuous-batching serving sections",
    )
    parser.add_argument(
        "--skip-train", action="store_true",
        help="skip the train-step throughput sections",
    )
    args = parser.parse_args()

    # Persistent compilation cache: the bench's remote compiles dominate
    # its wall-clock (ar_core alone spends ~400 s compiling three decode
    # programs through the tunnel). Serialized executables are keyed on
    # the program, so a warm cache (prior run of the SAME code) turns
    # each compile into a ~1 s deserialize; a cold cache costs nothing
    # extra. Override the location with JAX_COMPILATION_CACHE_DIR.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "work_dirs", "jax_cache"),
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t_start = time.monotonic()
    peak_flops, hbm_bw = chip_specs()
    overhead = _rpc_overhead()
    tpu = on_tpu()

    result: dict[str, Any] = {
        "metric": (
            "images tokenized/sec/chip (VQGAN-f16 256px, 8192x256 codebook, "
            f"b{BATCH}, shipped default lookup dispatch)"
        ),
        "value": None,
        "unit": "img/s/chip",
        "vs_baseline": None,
        "budget_s": args.budget,
    }
    state: dict[str, Any] = {}

    def emit() -> None:
        """Sidecar + one compact line per section: the driver keeps the
        tail, the last complete line wins — a timeout at any point loses
        at most the in-flight section (VERDICT r4 #1)."""
        result["elapsed_s"] = round(time.monotonic() - t_start, 1)
        os.makedirs("work_dirs", exist_ok=True)
        with open("work_dirs/bench_notes.json", "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(_compact(result)), flush=True)

    def remaining() -> float:
        return args.budget - (time.monotonic() - t_start)

    def fp_params():
        if "fp_params" not in state:
            _, state["fp_params"] = _ar_build(False)
        return state["fp_params"]

    # -- section bodies (each fills `result` in place) ----------------------

    def sec_headline() -> None:
        model, params, x = build()
        state["tok"] = (model, params, x)
        ips, _ = images_per_sec_pair(model, params, x, "default")
        flops_img = tokenize_flops_per_image(model, params, x)
        result["value"] = round(ips, 2) if ips else None
        # cross-round progress vs the r2 recorded headline
        result["vs_baseline"] = round(ips / R2_HEADLINE, 3) if ips else None
        result["lookup_default"] = (
            "pallas" if _default_lookup_is_pallas() else "xla"
        )
        result["mfu"] = {
            "tokenize_gflops_per_img": round(flops_img / 1e9, 2),
            # same run as `value` — one path, one number
            "tokenize_mfu": (
                round(ips * flops_img / peak_flops, 3) if ips else None
            ),
            "peak_bf16_tflops": peak_flops / 1e12,
        }

    def sec_ar_core() -> None:
        """Shipped decode modes at the serving batch: bf16 baseline and
        the serving default int8 weights + int8 KV. The int8-KV-only
        middle mode compiles a THIRD decode program (~140 s through the
        tunnel) and lives in sec_ar_int8kv, scheduled after the train
        sections so those fit the default budget (VERDICT r4 #1)."""
        bf16_64, p = ar_tokens_per_sec(
            quantize=False, batch=AR_SERVE_BATCH, overhead=overhead
        )
        state["fp_params"] = p
        int8w_kv_64, _ = ar_tokens_per_sec(
            quantize=True, batch=AR_SERVE_BATCH, overhead=overhead,
            params=p, cache_dtype=jnp.int8,
        )
        state["raw"] = {"bf16": bf16_64, "int8w_int8kv": int8w_kv_64}
        # shipped kv_segment=32 -> segment c attends 1+32(c+1) rows
        # (..., capped at 257): per-step average over 256 tokens ~145 rows
        avg_rows = (
            sum(min(1 + 32 * (c + 1), 257) for c in range(8)) * 32 / 256
        )
        b = AR_SERVE_BATCH
        sol = hbm_bw / ar_step_bytes(False, b, avg_rows) * b
        sol_kv8 = hbm_bw / ar_step_bytes(False, b, avg_rows, kv_int8=True) * b
        sol_i8_kv8 = (
            hbm_bw / ar_step_bytes(True, b, avg_rows, kv_int8=True) * b
        )
        state["sol_kv8"] = sol_kv8
        result["ar"] = {
            "metric": (
                "AR decode tokens/s/chip (Llama-medium 24L/1024d C2I, "
                "jitted scan + length-aware KV (kv_segment=32 default); "
                f"RPC overhead {overhead * 1e3:.1f}ms subtracted)"
            ),
            "bf16_tokens_per_s_b64": round(bf16_64, 1),
            "int8w_int8kv_tokens_per_s_b64": round(int8w_kv_64, 1),
            "int8w_int8kv_speedup_b64": round(int8w_kv_64 / bf16_64, 2),
            "sol_note": (
                "decode SOL = HBM_BW / (weights + avg KV bytes per step) "
                f"* batch; b64 bf16 {sol:.0f} tok/s "
                f"({bf16_64 / sol:.0%}), int8kv {sol_kv8:.0f}, "
                f"int8w+int8kv "
                f"{sol_i8_kv8:.0f} ({int8w_kv_64 / sol_i8_kv8:.0%}). "
                "kv_segment sweep (r4, work_dirs/exp/exp_kvseg_r4.py, "
                "b64): seg32 optimal for both cache modes."
            ),
            "images_per_s_at_256px_f16": round(
                max(bf16_64, int8w_kv_64) / 256, 2
            ),
        }

    def sec_ar_int8kv() -> None:
        """INT8-KV-only decode (bf16 weights) — r3's headline step; its
        own section purely for schedule priority (third decode compile)."""
        int8kv_64, _ = ar_tokens_per_sec(
            quantize=False, batch=AR_SERVE_BATCH, overhead=overhead,
            params=fp_params(), cache_dtype=jnp.int8,
        )
        ar = result.setdefault("ar", {})
        ar["int8kv_tokens_per_s_b64"] = round(int8kv_64, 1)
        bf = ar.get("bf16_tokens_per_s_b64")
        if bf:
            ar["int8kv_speedup_b64"] = round(int8kv_64 / bf, 2)
        if state.get("sol_kv8"):
            ar["int8kv_vs_sol"] = round(int8kv_64 / state["sol_kv8"], 2)
        state.setdefault("raw", {})["int8kv"] = int8kv_64
        img = ar.get("images_per_s_at_256px_f16") or 0.0
        ar["images_per_s_at_256px_f16"] = round(
            max(img, int8kv_64 / 256), 2
        )

    SRV_METRIC = (
        "AR serving effective tokens/s/chip (continuous batching, CFG "
        "\u03b1=1.75, top-k 600/top-p 0.92, shared-column dense slot "
        "cache, 64 slots, fused qkv; shipped default = INT8 weights + "
        "INT8 KV). Default note (VERDICT r4 #3): int8w+int8kv won "
        "serving in every recorded run; the r4 'inversion' (int8w "
        "losing raw generate decode 24.6k vs 25.7k) did not reproduce \u2014 "
        "r5 controlled re-measure (work_dirs/exp/exp_inversion_r5.py): "
        "generate int8w/bf16w = 1.143, serving = 1.111, i.e. int8w wins "
        "BOTH forms and the r4 decode-side loss was a ~4% noise draw, "
        "not a real effect needing a mechanism."
    )

    def _srv_eff(mode: str) -> float | None:
        srv = (result.get("serving") or {}).get(mode)
        raw = (state.get("raw") or {}).get(mode)
        if not srv or not raw:
            return None
        # CFG pairs two lanes per stream: raw rate / 2 is the bar
        return round(srv["tokens_per_s"] / (raw / 2.0), 3)

    def sec_serving() -> None:
        """The shipped default mode (int8 weights + int8 KV — the winner
        in every recorded run, VERDICT r4 #3): aligned full waves AND
        staggered arrivals (VERDICT r4 #2) on ONE shared server, so the
        decode variants compile once."""
        res = serving_bench(
            fp_params(), overhead, cache_dtype=jnp.int8, quantize=True,
            patterns=("aligned", "staggered"),
        )
        srv = result.setdefault("serving", {"metric": SRV_METRIC})
        srv["int8w_int8kv"] = res["aligned"]
        srv["staggered"] = res["staggered"]
        srv["best_mode"] = "int8w_int8kv"
        srv["efficiency_vs_decode"] = _srv_eff("int8w_int8kv")
        srv["staggered_vs_aligned"] = round(
            res["staggered"]["tokens_per_s"]
            / res["aligned"]["tokens_per_s"],
            3,
        )

    def sec_train_ar() -> None:
        out = _ar_train_bench(
            overhead, peak_flops, batch=128 if tpu else 2,
            steps=8 if tpu else 2, full_size=tpu,
        )
        result.setdefault("train", {})["ar_c2i"] = out

    def sec_train_tok() -> None:
        result.setdefault("train", {}).update(
            train_step_bench(overhead, tpu)
        )

    def sec_dataplane() -> None:
        if "tok" not in state:
            state["tok"] = build()[:3]
        model, params, _ = state["tok"]
        dp = dataplane_tokenize(model, params, args.probe_pristine)
        if dp is not None:
            result["dataplane"] = dp

    def sec_serving_alts() -> None:
        """Alternate cache/weight modes next to the shipped default."""
        result.setdefault("serving", {"metric": SRV_METRIC})
        for name, kw in (
            ("int8kv", dict(cache_dtype=jnp.int8)),
            ("bf16", dict(cache_dtype=jnp.bfloat16)),
        ):
            if remaining() < 120:
                result.setdefault("skipped", {})[f"serving_{name}"] = "budget"
                continue
            result["serving"][name] = serving_tokens_per_sec(
                fp_params(), overhead, **kw
            )
            emit()
        modes = {
            m: v["tokens_per_s"]
            for m, v in result["serving"].items()
            if isinstance(v, dict) and "tokens_per_s" in v
            and not v.get("staggered")
        }
        if modes:
            result["serving"]["best_mode"] = max(modes, key=modes.get)

    def sec_ar_extras() -> None:
        ar = result.setdefault("ar", {})
        bf16_8, _ = ar_tokens_per_sec(
            quantize=False, batch=AR_BATCH, overhead=overhead,
            params=fp_params(),
        )
        ar["bf16_tokens_per_s_b8"] = round(bf16_8, 1)
        if remaining() > 90:
            int8_64, _ = ar_tokens_per_sec(
                quantize=True, batch=AR_SERVE_BATCH, overhead=overhead,
                params=fp_params(),
            )
            ar["int8_tokens_per_s_b64"] = round(int8_64, 1)
            emit()

    def sec_lookup_alt() -> None:
        """Interleaved default-vs-alternate dispatch at the headline shape
        (drift between separate runs is the same order as the gap)."""
        model, params, x = state["tok"]
        alt = "pallas" if not _default_lookup_is_pallas() else "xla"
        ips_d, ips_a = images_per_sec_pair(model, params, x, "default", alt)
        if ips_d and ips_a:
            result["vs_alternate"] = round(ips_d / ips_a, 3)
            result["alternate_img_per_s"] = round(ips_a, 2)

    def sec_lookup_heavy() -> None:
        # LlamaGen f8 (1024 tokens/img, 16384 codes, dim lifted to 64 so
        # the distance matmul is MXU-shaped); the comparison IS the point
        # here, so both paths stay interleaved
        model8, params8, x8 = build(
            batch=16, img=256, codebook=16384, dim=64,
            width=64, width_mults=(1, 1, 2, 2), normalize=True,
        )
        alt8 = "pallas" if not _default_lookup_is_pallas(64) else "xla"
        lh_d, lh_a = images_per_sec_pair(model8, params8, x8, "default", alt8)
        result["lookup_heavy"] = {
            "metric": "img/s f8 tokenize (1024 tok/img, 16384x64 codebook)",
            "img_per_s": round(lh_d, 2) if lh_d else None,
            "vs_alternate": (
                round(lh_d / lh_a, 3) if lh_d and lh_a else None
            ),
        }

    def sec_lookup_kernels() -> None:
        # f8 microshape first: it is where the Pallas kernel IS the
        # shipped default (narrow D can't saturate the MXU from XLA)
        result["lookup_kernel_f8"] = lookup_kernel_tflops(overhead, d=64)
        emit()
        if remaining() > 90:
            result["lookup_kernel"] = lookup_kernel_tflops(overhead)

    def sec_int8_kernel() -> None:
        result.setdefault("ar", {})["int8_kernel"] = int8_kernel_microbench(
            overhead
        )

    # -- section schedule ---------------------------------------------------
    # (name, min seconds to be worth starting, body, enabled). Ordered so
    # the verdict's minimum set lands first; `need` values are measured
    # r4/r5 section costs with compile headroom on the remote-compile
    # tunnel. The headline always runs.
    ar_ok = not args.skip_ar
    srv_ok = ar_ok and not args.skip_serving
    core = [
        ("headline", 0, sec_headline, True),
        ("ar_core", 170, sec_ar_core, ar_ok),
        # needs are measured r5 COLD-cache section costs with headroom;
        # with a warm work_dirs/jax_cache every section is far cheaper
        ("serving", 150, sec_serving, srv_ok),
        ("dataplane", 40, sec_dataplane, True),
        ("train_ar", 110, sec_train_ar, not args.skip_train),
        ("train_tok", 170, sec_train_tok, not args.skip_train),
        ("ar_int8kv", 140, sec_ar_int8kv, ar_ok),
    ]
    extras = [
        ("serving_alts", 240, sec_serving_alts, srv_ok),
        ("lookup_kernels", 150, sec_lookup_kernels, tpu and ar_ok),
        ("int8_kernel", 150, sec_int8_kernel, tpu and ar_ok),
        ("ar_extras", 120, sec_ar_extras, ar_ok),
        ("lookup_heavy", 150, sec_lookup_heavy, True),
        ("lookup_alt", 120, sec_lookup_alt, True),
    ]
    sections = core + ([] if args.fast else extras)
    for name, need, fn, enabled in sections:
        if not enabled:
            continue
        if name != "headline" and remaining() < need:
            result.setdefault("skipped", {})[name] = "budget"
            emit()
            continue
        t_sec = time.monotonic()
        try:
            fn()
        except Exception as exc:  # record, keep going: partial > empty
            result.setdefault("errors", {})[name] = (
                f"{type(exc).__name__}: {exc}"[:200]
            )
        # free the section's device buffers NOW: reference cycles (e.g.
        # the serving engine's slot/closure graph) otherwise delay
        # collection and the NEXT section OOMs on a full chip — the r5
        # first capture lost every post-serving section that way
        import gc

        gc.collect()
        result.setdefault("section_s", {})[name] = round(
            time.monotonic() - t_sec, 1
        )
        emit()

    # the native decoder pool / TPU tunnel leave non-daemon threads behind
    # that can keep the process alive after the result is out; the driver
    # needs a clean exit
    os._exit(0)


def _compact(r: dict) -> dict:
    """Strip prose, keep every headline number (full record:
    work_dirs/bench_notes.json)."""
    out = {
        "metric": "img tokenized/s/chip (VQGAN-f16 256px b128, default dispatch)",
        "value": r.get("value"),
        "unit": "img/s/chip",
        "vs_baseline": r.get("vs_baseline"),
        "mfu": (r.get("mfu") or {}).get("tokenize_mfu"),
        "lookup": {
            "default": r.get("lookup_default"),
            "vs_alt": r.get("vs_alternate"),
        },
        "notes": "work_dirs/bench_notes.json",
    }
    lh = r.get("lookup_heavy")
    if lh:
        out["lookup"]["f8_img_s"] = lh.get("img_per_s")
        out["lookup"]["f8_vs_alt"] = lh.get("vs_alternate")
    lk = r.get("lookup_kernel")
    if lk:
        out["lookup"]["kernel_vs_xla"] = lk.get("speedup_vs_xla")
        out["lookup"]["kernel_spread"] = lk.get("pallas_spread")
    lk8 = r.get("lookup_kernel_f8")
    if lk8:
        out["lookup"]["kernel_f8_vs_xla"] = lk8.get("speedup_vs_xla")
        out["lookup"]["kernel_f8_spread"] = lk8.get("pallas_spread")
    ar = r.get("ar")
    if ar:
        ik = ar.get("int8_kernel") or {}
        out["ar"] = {
            "b8": ar.get("bf16_tokens_per_s_b8"),
            "b64": ar.get("bf16_tokens_per_s_b64"),
            "int8_b64": ar.get("int8_tokens_per_s_b64"),
            "int8kv_b64": ar.get("int8kv_tokens_per_s_b64"),
            "int8kv_x": ar.get("int8kv_speedup_b64"),
            "int8w_int8kv_b64": ar.get("int8w_int8kv_tokens_per_s_b64"),
            "int8_kernel_x": ik.get("int8_speedup"),
            "kernel_spread": ik.get("int8_spread"),
        }
    srv = r.get("serving")
    if srv:
        best = srv.get(srv.get("best_mode") or "int8w_int8kv") or {}
        out["serving"] = {
            "best": best.get("tokens_per_s"),
            "mode": srv.get("best_mode"),
            "img_min": best.get("images_per_min"),
            "eff_vs_decode": srv.get("efficiency_vs_decode"),
            "overshoot": best.get("overshoot_frac"),
            "idle": best.get("idle_lane_frac"),
            "host": best.get("host_frac"),
            "k": best.get("steps_per_sync"),
            "bf16": (srv.get("bf16") or {}).get("tokens_per_s"),
            "int8kv": (srv.get("int8kv") or {}).get("tokens_per_s"),
            "int8w_int8kv": (srv.get("int8w_int8kv") or {}).get(
                "tokens_per_s"
            ),
        }
        st = srv.get("staggered")
        if st:
            out["serving"]["staggered"] = {
                "tok_s": st.get("tokens_per_s"),
                "vs_aligned": srv.get("staggered_vs_aligned"),
                "idle": st.get("idle_lane_frac"),
                "overshoot": st.get("overshoot_frac"),
                "host": st.get("host_frac"),
            }
    tr = r.get("train")
    if tr:
        out["train"] = {
            tag: (
                {
                    "img_s": sec.get("img_per_s"),
                    "ms": sec.get("step_ms"),
                    "mfu": sec.get("mfu"),
                    "b": sec.get("batch"),
                    "spread": sec.get("spread"),
                    **(
                        {"tok_s": sec["tokens_per_s"]}
                        if "tokens_per_s" in sec
                        else {}
                    ),
                }
                if "error" not in sec
                else {"error": sec["error"][:60]}
            )
            for tag, sec in tr.items()
        }
    dp = r.get("dataplane")
    if dp:
        out["dataplane"] = {
            "e2e": dp.get("img_per_s_e2e"),
            "mode": dp.get("e2e_mode"),
            "pipe": dp.get("img_per_s_e2e_pipelined"),
            "seq": dp.get("img_per_s_e2e_sequential"),
            "decode": dp.get("img_per_s_decode_only"),
            "upload": dp.get("img_per_s_upload_only"),
            "upload_mb_s": dp.get("upload_mb_s"),
            "upload_mb_s_pristine": dp.get("upload_mb_s_pristine"),
            "compute": dp.get("img_per_s_compute_only"),
            "threads": dp.get("decode_threads"),
        }
    if r.get("skipped"):
        out["skipped"] = sorted(r["skipped"])
    if r.get("errors"):
        out["errors"] = {
            k: v[:60] for k, v in r["errors"].items()
        }
    if r.get("section_s"):
        out["section_s"] = r["section_s"]
    out["elapsed_s"] = r.get("elapsed_s")
    return out


def _default_lookup_is_pallas(d: int = DIM) -> bool:
    """What `nearest_codes` resolves to at code dim d (ops/vq_lookup.py)."""
    from vector_quantization_tpu.ops.vq_lookup import _default_use_pallas

    return _default_use_pallas(d)


if __name__ == "__main__":
    main()
