"""Flagship q8 b8 bound localization — differential experiments, no
profiler (round-4 VERDICT item 1).

The folded q8 kernel runs ~1.08 ms/layer vs a 0.78 ms bf16-rate floor at
b8 and is provably not MXU-bound (wide-K +3%) nor epilogue-bound (stub
4.7%).  Remaining suspects: per-grid-step overhead, DMA serialization,
store bandwidth.  Each arm below changes exactly one mechanism on the
FULL chained flagship stylize (single-kernel microbenches measure tunnel
dispatch, not kernel time — NOTES.md):

  * base       — production kernel (DMA depth 2, wide-K auto)
  * dma3       — triple-buffered slab DMA (2 slabs in flight): if depth-2
                 DMA serializes behind compute, this recovers it
  * nomxu      — STUB_NOMXU: matmuls skipped (WRONG numerics); the
                 remaining time IS the non-MXU floor (DMA + ring selects
                 + epilogue + stores + grid)
  * epilogue   — TIMING_STUB: epilogue replaced by a cast (re-baseline)

Interpretation: if nomxu-time ≈ base-time − MXU-time, compute and
memory overlap poorly (grid overhead); if nomxu ≪ base − mxu_est, the
kernel is genuinely MXU-limited at its achieved rate.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_q8_bound_hunt.py
"""
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))

import bench

bench._require_responsive_backend()

import jax

from rpst.ops.pallas import folded_conv_q8 as q8mod

print("devices:", jax.devices(), flush=True)

BATCH = 8


def run(tag):
    bundle = bench.build("bfloat16")
    ips, med = bench.bench_stylize(bundle, BATCH, iters=10, mode="q8")
    print(f"{tag}: {ips:.1f} img/s ({med*1e3:.2f} ms/pass)", flush=True)
    jax.clear_caches()
    return ips


base = run("base     (depth2)")

q8mod.RING_DMA_DEFAULT = True
ringd = run("ring_dma (halo rows by DMA, no slab splices)")
q8mod.RING_DMA_DEFAULT = False

q8mod.DMA_DEPTH_DEFAULT = 3
dma3 = run("dma3     (depth3)")
q8mod.DMA_DEPTH_DEFAULT = 2

q8mod.STUB_NOMXU = True
nomxu = run("nomxu    (no matmuls — WRONG numerics)")
q8mod.STUB_NOMXU = False

q8mod.TIMING_STUB = True
epi = run("epilogue (cast-only epilogue — WRONG numerics)")
q8mod.TIMING_STUB = False

# --- block-rows sweep: per-grid-step fixed cost is the prime suspect
# (nomxu floor ~85% of kernel time; HBM bandwidth alone accounts for
# ~17%).  Force BR by bypassing the VMEM-guard shrink — Mosaic itself
# rejects blocks that truly don't fit (compile failure is an answer).
_orig_shrink = q8mod._shrink_block_rows
for br, wk in ((32, False), (32, True), (64, False), (8, True)):
    q8mod._shrink_block_rows = lambda h, w, c4, c4o, isz, block_rows, \
        out_isz=None, min_rows=8, extra_slabs=0, _br=br: \
        (_br if h % _br == 0 else _orig_shrink(h, w, c4, c4o, isz,
                                               block_rows,
                                               out_isz=out_isz,
                                               min_rows=min_rows,
                                               extra_slabs=extra_slabs))
    q8mod.WIDE_K_DEFAULT = wk
    try:
        run(f"BR={br} wide_k={wk}")
    except Exception as e:  # Mosaic VMEM rejection is a data point
        print(f"BR={br} wide_k={wk}: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        jax.clear_caches()
q8mod._shrink_block_rows = _orig_shrink
q8mod.WIDE_K_DEFAULT = "auto"

print(f"summary: base {base:.1f} img/s; "
      f"ring_dma {100*(ringd/base-1):+.1f}%; "
      f"dma3 {100*(dma3/base-1):+.1f}%; "
      f"nomxu {100*(nomxu/base-1):+.1f}%; "
      f"epilogue-stub {100*(epi/base-1):+.1f}%", flush=True)
