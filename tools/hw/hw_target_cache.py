#!/usr/bin/env python
"""Round-5: device-resident perceptual-target cache A/B.

The style/content VGG target pass (reference adain_rp.py:327-329,
recomputed every iteration by the reference loop) is parameter-free;
``rpst.train.target_cache`` caches per-image targets in HBM and the step
gathers them by slot — one VGG loss sweep per step instead of two
forward sweeps + one.  Measure the steady-state (all-hit) folded
flagship train step at b8/b16/b24 against the recompute baseline, plus
the cache stacked on q8... no — the cache SUPERSEDES q8 targets (the
pass q8 quantized no longer runs).  Results land in BASELINE.md.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import bench


def main():
    batches = [int(b) for b in sys.argv[1:]] or [8, 16, 24]
    for b in batches:
        for over, label in (({}, f"b{b}+recompute"),
                            ({"target_cache": 64}, f"b{b}+tcache")):
            try:
                bench.bench_train("folded", b, iters=8, repeats=3,
                                  label=label, **over)
            except Exception as e:
                bench.log(f"[train] {label}: {type(e).__name__}: "
                          f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
