#!/usr/bin/env python
"""Round-5 VERDICT item 3: training amortization past b16.

Serving kept amortizing to b48 (+35% over b8); the r4 training sweep
stopped at b16 (65.8 img/s peak).  Measure the folded flagship train
step at b16/24/32/48 (falling back to remat where memory forces), plus
q8 loss targets at the winning batch.  Results land in BASELINE.md.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import bench


def main():
    import sys as _sys
    only = _sys.argv[1] if len(_sys.argv) > 1 else "plain"
    if only == "plain":
        rows = [("folded", b, {}, f"b{b}") for b in (32, 48, 64)]
    elif only == "q8tgt":
        rows = [("folded", b, {"train_q8_targets": True}, f"b{b}+q8tgt")
                for b in (24, 32)]
    elif only == "remat":
        rows = [("folded", b, {"remat": True}, f"b{b}+remat")
                for b in (24, 32, 48)]
    elif only == "accum":
        rows = [("folded", b, {"grad_accum": k}, f"b{b}+accum{k}")
                for b, k in ((32, 2), (48, 3), (64, 4), (96, 6))]
    else:
        raise SystemExit(f"unknown mode {only}")
    for strat, batch, over, label in rows:
        try:
            bench.bench_train(strat, batch, iters=6, repeats=2,
                              label=label, **over)
        except Exception as e:
            bench.log(f"[train] {label}: {type(e).__name__}: "
                      f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
