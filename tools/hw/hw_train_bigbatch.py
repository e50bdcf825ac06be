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
    elif only == "q8tgt_small":
        q8tgt_smallbatch()
        return
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




def q8tgt_smallbatch():
    """A/B the q8-target engine fix at b1/b2 (VERDICT r5 item 3): the
    policy gate TRAIN_Q8_TARGETS_MIN_BATCH is lifted for the run so the
    small-batch rows execute; conv_impl='auto' now routes 2N<8 through
    one XLA engine."""
    from rpst import policy
    policy.TRAIN_Q8_TARGETS_MIN_BATCH = 1
    for batch in (1, 2, 4):
        for over, label in (({}, f"b{batch}+bf16tgt"),
                            ({"train_q8_targets": True},
                             f"b{batch}+q8tgt-fixed")):
            try:
                bench.bench_train("folded", batch, iters=8, repeats=3,
                                  label=label, **over)
            except Exception as e:
                bench.log(f"[train] {label}: {type(e).__name__}: "
                          f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
