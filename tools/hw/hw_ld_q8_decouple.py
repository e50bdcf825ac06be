"""Test the layout-conflict hypothesis for the LD q8 b1 collapse: the
same int8 tensor feeds a Mosaic custom call (Pallas 3x3) and an XLA
int8 conv (7x7); if their layout constraints conflict, XLA may relayout
the big activation on every layer.  Arm D gives each consumer its OWN
int8 tensor (bit-identical: int8 codes survive a deq->requant round
trip exactly) behind an optimization_barrier.

Run serialized:
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld_q8_decouple.py
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

from bench import _bench_chained, _rand_pair
from rpst.config import load_config
from rpst.models import build_model
from rpst.models import fast_path_q8 as q8

cfg = load_config(dict(network="ld_adain", img_size=512, hidden_dim=16,
                       rp_blocks=5, use_mask=False,
                       compute_dtype="bfloat16"))
bundle = build_model(cfg)
rng = jax.random.PRNGKey(0)

_orig_xla = q8._xla_conv_q8


def _xla_decoupled(x_q, x_s, k, b, dtype, out_scale=None, alpha=0.2):
    x_q = jax.lax.optimization_barrier(x_q)
    return _orig_xla(x_q, x_s, k, b, dtype, out_scale=out_scale,
                     alpha=alpha)


for tag, fn in (("A shared ", _orig_xla), ("D barrier", _xla_decoupled)):
    q8._xla_conv_q8 = fn
    try:
        for batch in (1, 2, 4):
            content, style = _rand_pair(batch, 512)
            variables = jax.jit(partial(bundle.model.init, train=False))(
                rng, content, style)
            params = variables["params"]
            scales = q8.calibrate_ld_q8(params, content, style,
                                        stylized_layers=cfg.stylized_layers)

            def apply(params, c, s):
                # pin the mixed engine (conv_impl='auto' postdates this
                # experiment and would reroute small batches XLA-only)
                return q8.stylize_ld_q8(params, scales, c, s,
                                        stylized_layers=cfg.stylized_layers,
                                        conv_impl="pallas")

            per = _bench_chained(apply, params, content, style, iters=10)
            print(f"{tag} b{batch}: {batch/per:.2f} img/s "
                  f"({per*1e3:.1f} ms)", flush=True)
    finally:
        q8._xla_conv_q8 = _orig_xla
print("HW LD DECOUPLE DONE", flush=True)
