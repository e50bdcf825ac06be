"""Flagship batch sweep past 8 (b12/b16/b24) for int8-folded serving.

The folded q8 b8 path sits at ~72% of the bf16-rate MXU floor, with the
residual attributed to per-grid-step overhead / DMA / stores (NOTES.md,
hardware-model revision 2).  If any of that cost is per-row-block or
per-dispatch rather than per-MAC, a larger device batch amortizes it —
the one lever in the b8 headroom hunt not yet swept.  Memory check:
512px folded int8 activations are (N, 256, 256, 128) = 8 MB/img, so
b24 peaks well under the 16 GB HBM even with the bf16 dequant copies.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_batch_sweep.py
"""
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))

import bench

# PJRT client creation hangs indefinitely on a half-open axon tunnel
# (bench.py:368-388) — probe in a subprocess before touching jax.devices().
bench._require_responsive_backend()

import jax

print("devices:", jax.devices(), flush=True)

bundle = bench.build("bfloat16")
for batch in (8, 12, 16, 24):
    try:
        ips, med = bench.bench_stylize(bundle, batch, iters=10, mode="q8")
        print(f"int8-folded batch={batch}: {ips:.1f} img/s "
              f"({med*1e3:.1f} ms/pass)", flush=True)
    except Exception as e:
        print(f"int8-folded batch={batch}: {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)
    finally:
        # Growing per-batch programs accumulate on the tunnel server's heap
        # and later batches OOM spuriously (bench._family_sweep does the
        # same after observing RESOURCE_EXHAUSTED).
        jax.clear_caches()
