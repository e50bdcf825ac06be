"""On-hw A/B for the LD v1 int8 serving path (ld_adain, 512px):
bf16 family baseline vs stylize_ld_q8 (Pallas 3x3 + XLA int8 7x7).

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld_q8_bench.py
"""
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))
import jax

print("devices:", jax.devices(), flush=True)
import bench

bench.bench_family("ld_adain", batches=(1, 4), hidden_dim=16, rp_blocks=5)
bench.bench_std_q8("ld_adain", batches=(1, 4), hidden_dim=16, rp_blocks=5,
                   use_mask=False)
print("HW LD Q8 BENCH DONE", flush=True)
