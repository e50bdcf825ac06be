"""Measure the XLA-only int8 LD arm — the layout-mix fix candidate.

Root cause of the small-batch collapse (hw_ld_q8_bisect/suspects + HLO
dump /tmp/ld_full_hlo.txt): Pallas custom calls constrain operands to
row-major {3,2,1,0:T(8,128)(4,1)} while XLA's int8 convs prefer
{3,0,2,1:T(2,128)}; at small batch XLA materializes transposing
relayout copies at every boundary (s32[2,512,512,256] = 536 MB among
them).  At n>=8 the chosen layouts agree and full q8 is fast.

Arm X: every LD conv (3x3 smalls, 7x7 bigs, 3x3 decs) through
_xla_conv_q8 — zero Mosaic calls, zero relayouts.  Compare vs
bf16 (74 ms b1) and bigs-only int8 (63 ms b1).

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld_q8_xlaonly.py
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

for batch in (1, 2, 4):
    # measured via the _make_conv_q_std monkeypatch originally; the
    # result shipped as conv_impl='xla', so drive that directly now
    content, style = _rand_pair(batch, 512)
    variables = jax.jit(partial(bundle.model.init, train=False))(
        rng, content, style)
    params = variables["params"]
    scales = q8.calibrate_ld_q8(params, content, style,
                                stylized_layers=cfg.stylized_layers)

    def apply(params, c, s):
        return q8.stylize_ld_q8(params, scales, c, s,
                                stylized_layers=cfg.stylized_layers,
                                conv_impl="xla")

    per = _bench_chained(apply, params, content, style, iters=10)
    print(f"X xla-only b{batch}: {batch/per:.2f} img/s "
          f"({per*1e3:.1f} ms)", flush=True)

# bf16 reference at b2 (the one unmeasured comparison point)
content, style = _rand_pair(2, 512)
variables = jax.jit(partial(bundle.model.init, train=False))(
    rng, content, style)


def apply_bf16(v, c, s):
    return bundle.stylize(v, None, c, s)


per = _bench_chained(apply_bf16, variables, content, style, iters=10)
print(f"bf16 ref    b2: {2/per:.2f} img/s ({per*1e3:.1f} ms)", flush=True)
print("HW LD XLAONLY DONE", flush=True)
