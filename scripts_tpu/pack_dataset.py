"""Pack per-episode files into one native shard (native/dataset_shard.cpp).

One mmap instead of N file opens at train time; streaming append keeps the
packer's memory flat regardless of dataset size.

Usage: python scripts_tpu/pack_dataset.py --data data/ref500 [--out data/ref500/data.wshard]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waves_jl_tpu.data import load_episode, open_episodes_shard


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    out = args.out or os.path.join(args.data, "data.wshard")

    paths = sorted(
        glob.glob(os.path.join(args.data, "episodes", "episode*.npz"))
        + glob.glob(os.path.join(args.data, "episodes", "episode*.wbin")),
        key=lambda q: int("".join(c for c in os.path.basename(q) if c.isdigit())),
    )
    assert paths, f"no episodes under {args.data}"
    t0 = time.time()
    shard = open_episodes_shard(out)
    for i, pth in enumerate(paths):
        shard.append(load_episode(pth, device=False))
        if (i + 1) % 100 == 0:
            print(f"packed {i + 1}/{len(paths)}", flush=True)
    shard.finish()
    sz = os.path.getsize(out) / 1e9
    print(f"packed {len(paths)} episodes -> {out} ({sz:.2f} GB) "
          f"in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
