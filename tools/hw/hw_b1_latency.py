#!/usr/bin/env python
"""Round-5 VERDICT item 6: pin the b1 p50 latency regression (r3 3.6 ms
-> r4 4.7 ms).

The r4 attribution was "slower tunnel session" without a same-session
A/B.  The b1 q8 serving program's engine knobs did NOT change r3->r4
(wide_k gates to batch>=4; dma_depth 2 and ring_dma False are the
defaults in both), so the only candidates are session variance vs a
code-path change.  This rig measures the b1 q8 pass K times spread over
the session (interleaved with a fixed bf16 control program) so variance
and any systematic shift separate.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def main():
    bundle = bench.build("bfloat16")
    samples_q8, samples_folded = [], []
    for k in range(5):
        ips_q8, med_q8 = bench.bench_stylize(bundle, 1, iters=10,
                                             repeats=3, mode="q8")
        ips_f, med_f = bench.bench_stylize(bundle, 1, iters=10,
                                           repeats=3, mode="folded")
        samples_q8.append(med_q8 * 1e3)
        samples_folded.append(med_f * 1e3)
        bench.log(f"[b1lat] sample {k}: q8 {med_q8*1e3:.2f} ms "
                  f"({ips_q8:.1f} img/s), folded-bf16 {med_f*1e3:.2f} ms")
        time.sleep(2)
    q = np.asarray(samples_q8)
    f = np.asarray(samples_folded)
    bench.log(f"[b1lat] q8 ms: min {q.min():.2f} p50 {np.median(q):.2f} "
              f"max {q.max():.2f} spread {(q.max()-q.min())/q.min()*100:.0f}%")
    bench.log(f"[b1lat] folded ms: min {f.min():.2f} p50 "
              f"{np.median(f):.2f} max {f.max():.2f}")


if __name__ == "__main__":
    main()
