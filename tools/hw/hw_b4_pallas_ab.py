"""Folded-path engine A/B at batch 4 (the unmeasured middle of the
use_pallas='auto' gate).

The gate picks the fused Pallas kernel at N <= 2 and the XLA ring path
otherwise (crossover measured at b1/b2 vs b8 in round 2).  The
2026-08-19 sweep shows sel 179.6 b1 -> 118.2 b4 and ccam 173.3 -> 100.5
— per-image time GROWS 1.5-1.7x from b1 to b4, while b8 measured 393
(sel, round 2) — i.e. the XLA arm has an N=4 pathology the gate
currently walks straight into.  Measure both engines at b4 (and b8 as a
control) for multi_adain / sel / ccam.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_b4_pallas_ab.py
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


def run(network, batch, use_pallas):
    cfg = load_config(dict(network=network, **CFG,
                           **({"stylized_layers": 5}
                              if network == "ccam" else {})))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    content = jnp.zeros((batch, 512, 512, 3), jnp.float32)
    style = content
    variables = jax.jit(partial(bundle.model.init, train=False))(
        rng, content, style)
    if network == "multi_adain":
        fn = lambda v, c, s: fast_path.stylize_multi_adain_folded(
            v["params"], c, s, use_pallas=use_pallas)
    elif network == "sel_multi_adain":
        fn = lambda v, c, s: fast_path.stylize_sel_multi_adain_folded(
            v, c, s, use_pallas=use_pallas)
    else:
        fn = lambda v, c, s: fast_path.stylize_ccam_folded(
            v, c, s, stylized_layers=5, use_pallas=use_pallas)
    per = bench._bench_chained(fn, variables, content, style, iters=10)
    print(f"{network} b{batch} use_pallas={use_pallas}: "
          f"{batch/per:.2f} img/s ({per*1e3:.1f} ms/pass)", flush=True)
    jax.clear_caches()


for network in ("sel_multi_adain", "multi_adain", "ccam"):
    for batch in (4, 8):
        for up in (False, True):
            try:
                run(network, batch, up)
            except Exception as e:
                print(f"{network} b{batch} up={up}: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
print("HW B4 PALLAS AB DONE", flush=True)
