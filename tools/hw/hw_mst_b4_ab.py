"""mst folded-engine A/B at batch 4 (gate-change follow-up).

The 2026-08-19 b4 A/B (hw_b4_pallas_ab.py) moved the ``use_pallas='auto'``
gate to N <= 4 based on multi_adain / sel / ccam, but ``stylize_mst_folded``
rides the same gate and was NOT in that A/B — and mst showed no b4
pathology in the sweep (157.4 b1 -> 164.4 b4 on the XLA arm).  Measure
both engines at b4 (b8 control) so the gate isn't a blind regression
for mst.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_mst_b4_ab.py
"""
import sys
from functools import partial
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

import bench
from rpst.config import load_config
from rpst.models import build_model, fast_path

CFG = dict(img_size=512, compute_dtype="bfloat16", enc_stack_way="constant",
           rp_blocks=5, hidden_dim=32, inception_num=0, attention="none",
           exec_strategy="folded")


def run(batch, use_pallas):
    cfg = load_config(dict(network="mst", **CFG))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    content = jnp.zeros((batch, 512, 512, 3), jnp.float32)
    variables = jax.jit(partial(bundle.model.init, train=False))(
        rng, content, content)
    fn = lambda v, c, s: fast_path.stylize_mst_folded(
        v, c, s, use_pallas=use_pallas)
    per = bench._bench_chained(fn, variables, content, content, iters=10)
    print(f"mst b{batch} use_pallas={use_pallas}: "
          f"{batch/per:.2f} img/s ({per*1e3:.1f} ms/pass)", flush=True)
    jax.clear_caches()


for batch in (4, 8):
    for up in (False, True):
        try:
            run(batch, up)
        except Exception as e:
            print(f"mst b{batch} up={up}: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
print("HW MST B4 AB DONE", flush=True)
