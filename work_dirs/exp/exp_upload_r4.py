"""Round-4 host→device upload probe (VERDICT r3 #5).

r4 smoke measured the tunnel at ~9 MB/s single-stream — the hard cap on
the e2e input pipeline (47 img/s at 256px uint8). Probe whether batch
size or concurrent transfer streams change the achieved bandwidth.

Run: python work_dirs/exp/exp_upload_r4.py
"""

import concurrent.futures as cf
import json
import time

import jax
import numpy as np

IMG = 256


def upload_rate(batch: int, n_batches: int, streams: int = 1) -> float:
    data = [
        np.random.default_rng(i).integers(
            0, 256, (batch, IMG, IMG, 3), np.uint8
        )
        for i in range(n_batches)
    ]
    # warmup
    jax.block_until_ready(jax.device_put(data[0]))
    t0 = time.perf_counter()
    if streams == 1:
        bufs = [jax.device_put(d) for d in data]
    else:
        with cf.ThreadPoolExecutor(streams) as ex:
            bufs = list(ex.map(jax.device_put, data))
    jax.block_until_ready(bufs)
    dt = time.perf_counter() - t0
    mb = batch * n_batches * IMG * IMG * 3 / 1e6
    return mb / dt


def main():
    out = {}
    for batch, n in ((8, 16), (32, 8), (128, 4), (256, 2)):
        out[f"b{batch}_s1"] = round(upload_rate(batch, n), 1)
        print(f"b{batch}_s1", out[f"b{batch}_s1"], "MB/s", flush=True)
    for streams in (2, 4):
        out[f"b32_s{streams}"] = round(upload_rate(32, 8, streams), 1)
        print(f"b32_s{streams}", out[f"b32_s{streams}"], "MB/s", flush=True)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
