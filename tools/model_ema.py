#!/usr/bin/env python
"""Extract the EMA shadow weights from a checkpoint into a weights-only
checkpoint (reference ``tools/model_ema.py:8-23``).

    python tools/model_ema.py work_dirs/x/checkpoints/iter_100000 out_dir
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("out")
    args = p.parse_args()

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as saver:
        state = saver.restore(os.path.abspath(args.checkpoint))
        ema = state.get("extra", {}).get("ema_params")
        if ema is None:
            raise SystemExit("checkpoint has no extra/ema_params")
        saver.save(os.path.abspath(args.out), {"params": ema}, force=True)
    print(f"saved EMA params to {args.out}")


if __name__ == "__main__":
    main()
