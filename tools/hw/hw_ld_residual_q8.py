"""LD v3-v5 residual int8 A/B (round-4 VERDICT item 8).

The remaining un-quantized LD candidates: the v5 non-overlap upsampler
projections (contraction K = hidden, 8-16) and the v3-v5 pooled-branch
3x3 convs (K*K*C = 72-144).  Both sit FAR below the measured int8
fast-rate windows (XLA conv K*K*C >= ~5k; Mosaic dot K >= 256 —
BASELINE.md hardware-model revision 2), so the prediction is a wash or a
loss (quantize/dequantize overhead, no MXU-rate win).  This runner
measures it: full-model stylize A/B per variant with the dynamic-int8
module flags (models/ld_adain.py NONOVERLAP_INT8 / VGGISH_INT8),
chained-fori_loop timing.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld_residual_q8.py
"""
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))

import bench

bench._require_responsive_backend()

import jax
import jax.numpy as jnp
import numpy as np

from rpst import models as _models
from rpst.config import load_config
from rpst.models import build_model, ld_adain

print("devices:", jax.devices(), flush=True)


def time_variant(net, batches=(1, 4)):
    cfg = load_config(dict(network=net, img_size=512, hidden_dim=16,
                           ld_layer_num=5, stylized_layers=5,
                           compute_dtype="bfloat16"))
    bundle = build_model(cfg)
    for batch in batches:
        content, style = bench._rand_pair(batch, 512)
        key = jax.random.PRNGKey(0)
        variables = bundle.model.init(key, content, style, train=False)

        def apply(v, c, s):
            return bundle.model.apply(v, c, s, train=False,
                                      test_mode=True)

        per = bench._bench_chained(apply, variables, content, style,
                                   iters=10)
        print(f"  {net} b{batch}: {batch/per:.2f} img/s "
              f"({per*1e3:.1f} ms/pass)", flush=True)
    jax.clear_caches()


for net in ("ld_adain3", "ld_adain4", "ld_adain5"):
    print(f"== {net} baseline (bf16 residuals)", flush=True)
    time_variant(net)

ld_adain.VGGISH_INT8 = True
for net in ("ld_adain3", "ld_adain4"):
    print(f"== {net} pooled-branch int8", flush=True)
    time_variant(net)
ld_adain.VGGISH_INT8 = False

ld_adain.NONOVERLAP_INT8 = True
print("== ld_adain5 upsampler int8", flush=True)
time_variant("ld_adain5")
ld_adain.NONOVERLAP_INT8 = True
ld_adain.VGGISH_INT8 = True
print("== ld_adain5 both int8", flush=True)
time_variant("ld_adain5")
ld_adain.NONOVERLAP_INT8 = False
ld_adain.VGGISH_INT8 = False
print("done", flush=True)
