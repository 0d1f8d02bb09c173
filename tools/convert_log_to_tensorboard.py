#!/usr/bin/env python
"""Regex-parse training text logs back into TensorBoard scalars (reference
``tools/convert_log_to_tensorboard.py:22-80``). Parses the LogCallback
format: ``Iter [i/N] ETA hh:mm:ss k=v k=v ...``.

    python tools/convert_log_to_tensorboard.py LOGFILE OUT_DIR
"""

from __future__ import annotations

import argparse
import re

LINE = re.compile(r"Iter \[(\d+)/(\d+)\] ETA \S+ (.*)")
KV = re.compile(r"(\w+)=([-+0-9.e]+)")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logfile")
    p.add_argument("out_dir")
    p.add_argument("--tag", default="train")
    args = p.parse_args()

    from torch.utils.tensorboard import SummaryWriter

    writer = SummaryWriter(args.out_dir)
    n = 0
    with open(args.logfile) as f:
        for line in f:
            m = LINE.search(line)
            if not m:
                continue
            step = int(m.group(1))
            for key, value in KV.findall(m.group(3)):
                try:
                    writer.add_scalar(f"{args.tag}/{key}", float(value), step)
                    n += 1
                except ValueError:
                    pass
    writer.close()
    print(f"wrote {n} scalars to {args.out_dir}")


if __name__ == "__main__":
    main()
