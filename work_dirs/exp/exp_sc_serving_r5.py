"""r5: shared-column engine measurement (VERDICT r4 #2).

Three configs at the production recipe (int8w+int8kv, 64 slots, CFG):
  aligned_sc    — full waves through the shared-column engine
  staggered_sc  — staggered arrivals (16 up front, 8/sync) same engine
  staggered_pr  — same arrivals through the per-row scatter path
                  (aligned=False): the r4 code's behavior == the ablation
Prints one JSON line per config as it completes.
"""

import json
import sys
import time

sys.path.append("/root/repo")  # append, not prepend: PYTHONPATH=/root/repo
# shadows a module the axon TPU plugin imports and kills the backend

import jax.numpy as jnp

import bench
from vector_quantization_tpu.tasks import serving as srv_mod

_OrigServer = srv_mod.ARServer


class _ScatterServer(_OrigServer):
    def __init__(self, *a, **k):
        k["aligned"] = False
        super().__init__(*a, **k)


def main():
    overhead = bench._rpc_overhead()
    _, fp_params = bench._ar_build(False)
    out = {}
    for name, staggered, forced in (
        ("aligned_sc", False, False),
        ("staggered_sc", True, False),
        ("staggered_pr", True, True),
    ):
        srv_mod.ARServer = _ScatterServer if forced else _OrigServer
        t0 = time.time()
        try:
            out[name] = bench.serving_tokens_per_sec(
                fp_params, overhead, quantize=True,
                cache_dtype=jnp.int8, staggered=staggered,
            )
        except Exception as exc:
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        out[name]["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps({name: out[name]}), flush=True)
    srv_mod.ARServer = _OrigServer
    if "tokens_per_s" in out.get("staggered_sc", {}) and "tokens_per_s" in out.get("aligned_sc", {}):
        print(json.dumps({
            "staggered_vs_aligned": round(
                out["staggered_sc"]["tokens_per_s"]
                / out["aligned_sc"]["tokens_per_s"], 3),
            "sc_vs_perrow_staggered": (
                round(out["staggered_sc"]["tokens_per_s"]
                      / out["staggered_pr"]["tokens_per_s"], 3)
                if "tokens_per_s" in out.get("staggered_pr", {}) else None
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
