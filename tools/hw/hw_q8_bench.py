"""On-hardware throughput for the round-3 q8 families vs their bf16
family baselines, 512px. Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_q8_bench.py
"""
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))
import jax

print("devices:", jax.devices(), flush=True)
import bench

# bf16 family baselines for same-day A/B
for fam, kw in [("sanet", {}), ("dynamic_sanet", {}),
                ("src", dict(hidden_dim=32)),
                ("mrf", dict(hidden_dim=32, rp_blocks=5)),
                ("seg_adain", {})]:
    bench.bench_family(fam, **kw)
# q8 counterparts
bench.bench_vgg_q8("sanet")
bench.bench_vgg_q8("dynamic_sanet")
bench.bench_vgg_q8("src", hidden_dim=32)
bench.bench_std_q8("mrf", hidden_dim=32, rp_blocks=5)
bench.bench_std_q8("seg_adain")
bench.bench_engine_q8("mst", enc_stack_way="constant", rp_blocks=5,
                      hidden_dim=32, stylized_layers=1,
                      exec_strategy="folded")
bench.bench_family("spade")
bench.bench_engine_q8("spade")
print("HW Q8 BENCH DONE", flush=True)
