"""Standard-layout wide-K A/B (NOTES.md open item): does the K=3*C
lane-stacked contraction help the end-to-end adain/wct int8 serving
paths?  The folded kernel's A/B measured +3% b8 / -7% b1 and shipped
``wide_k='auto'`` (batch >= 4); the standard-layout arm OOM'd before
measurement (pre calibration-cap).  Calibration batches are now capped
at 2, so the arm is runnable.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_stdwidek_ab.py
"""
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))
import jax

print("devices:", jax.devices(), flush=True)

import bench
from rpst.ops.pallas import conv2d_q8 as cq8

for wide in (False, "auto"):
    cq8.WIDE_K_DEFAULT = wide
    print(f"=== WIDE_K_DEFAULT={wide!r} ===", flush=True)
    bench.bench_std_q8("adain", batches=(1, 4))
    bench.bench_std_q8("wct", batches=(1, 4))
print("HW STD WIDE-K AB DONE", flush=True)
