"""ld_adain2 2N-encode A/B (the b4 < b1 inversion, sweep 2026-08-19:
b1 26.8 vs b4 20.8 img/s).

Variant 1 fixed the same inversion class by batching content+style into
one 2N pass through the shared encoder (exact — no batch-coupled ops);
v2 shares v1's single-fused-stream topology but was never measured with
the batching (v3/v4 measured the OPPOSITE and v5 flipped after the
NonOverlapConvTranspose rewrite, so the gate stayed variant-1-only).

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld2_2n_ab.py
"""
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

import bench
from rpst.config import load_config
from rpst.models import build_model

cfg = load_config(dict(network="ld_adain2", img_size=512,
                       compute_dtype="bfloat16", hidden_dim=8,
                       ld_layer_num=5))
bundle = build_model(cfg)
rng = jax.random.PRNGKey(0)


def _encode_2n(mdl, content, style):
    n = content.shape[0]
    feats = mdl.encode_intermediate(jnp.concatenate([content, style], 0))
    cf = [f[:n] for f in feats]
    sf = [f[n:] for f in feats]
    return mdl.decode(cf, sf)


for batch in (1, 4):
    content = jnp.zeros((batch, 512, 512, 3), jnp.float32)
    style = content
    variables = jax.jit(lambda r, c, s: bundle.model.init(
        r, c, s, train=False))(rng, content, style)

    def apply_base(v, c, s):
        return bundle.model.apply(v, c, s, test_mode=True)

    def apply_2n(v, c, s):
        return bundle.model.apply(v, c, s, method=_encode_2n)

    for name, fn in (("base", apply_base), ("2n", apply_2n)):
        per = bench._bench_chained(fn, variables, content, style, iters=10)
        print(f"ld_adain2 {name} b{batch}: {batch/per:.2f} img/s "
              f"({per*1e3:.1f} ms/pass)", flush=True)
    jax.clear_caches()
print("HW LD2 2N AB DONE", flush=True)
