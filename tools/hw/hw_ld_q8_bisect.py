"""Bisect the LD full-q8 small-batch penalty by truncating the forward
pass: every component microbenches fast at n=2 (hw_ld_q8_fix.py), the
fresh-copy arm falsified operand-layout sharing, yet the composed
program costs 210 ms where components sum to ~60.  Time prefixes of the
exact shipping pass (encode to layer 3 / 4, + dec0, + dec1, full) and
find where the wall time jumps.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_ld_q8_bisect.py
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
from rpst.ops.stats import adaptive_instance_normalization as adain

cfg = load_config(dict(network="ld_adain", img_size=512, hidden_dim=16,
                       rp_blocks=5, use_mask=False,
                       compute_dtype="bfloat16"))
bundle = build_model(cfg)
rng = jax.random.PRNGKey(0)
DT = jnp.bfloat16


def trunc_pass(params, content, style, st, upto: str):
    """Prefix of fast_path_q8._ld_q8_pass (same ops, same order);
    ``upto`` in enc3|enc4|dec0|dec1|full."""
    conv_q = q8._make_conv_q_std(DT, 16, False, "reflect", alpha=0.2)
    enc, dec = q8._ld_stacks(params)
    L = len(enc)
    n = content.shape[0]
    stop_layer = {"enc3": 3, "enc4": 4}.get(upto, 4)

    def elig(i):
        (ks, _), (kg, _) = enc[i]
        return q8._q8_eligible(ks) and q8._q8_eligible(kg)

    x = jnp.concatenate([content, style], axis=0).astype(DT)
    x_q8, x_s = False, None
    feats = []
    for i in range(L):
        if i > stop_layer:
            break
        (ks, bs_), (kg, bg) = enc[i]
        if elig(i):
            if not x_q8:
                s = st.take(x)
                if not st.recording:
                    x, x_s = q8.quantize_activations(x, s), s
            chain = i + 1 < L and elig(i + 1)
            if st.recording:
                sm = q8._lrelu_conv(x, ks, bs_, DT)
                bg_o = q8._lrelu_conv(x, kg, bg, DT)
                x = jnp.concatenate([sm, bg_o], axis=-1)
                if chain:
                    st.take(x)
                x_q8, x_s = chain, None
                feats.append((x, None))
            else:
                out_s = st.take(None) if chain else None
                sm = conv_q(x, x_s, ks, bs_, out_scale=out_s)
                bg_o = q8._xla_conv_q8(x, x_s, kg, bg, DT, out_scale=out_s)
                x = jnp.concatenate([sm, bg_o], axis=-1)
                x_q8, x_s = chain, out_s
                feats.append((x, out_s))
        else:
            if not st.recording and x_s is not None:
                x = q8._deq(x, x_s, DT)
            x_q8, x_s = False, None
            sm = q8._lrelu_conv(x, ks, bs_, DT)
            bg_o = q8._lrelu_conv(x, kg, bg, DT)
            x = jnp.concatenate([sm, bg_o], axis=-1)
            feats.append((x, None))
    if upto in ("enc3", "enc4"):
        t, s = feats[-1]
        return t.astype(jnp.float32) if s is None else q8._deq(
            t, s, jnp.float32)

    def fsplit(i):
        t, s = feats[i]
        f = t if s is None else q8._deq(t, s, DT)
        return f[:n], f[n:]

    def dec_apply(x, k, b):
        if q8._q8_eligible(k):
            s = st.take(x)
            if not st.recording:
                return conv_q(q8.quantize_activations(x, s), s, k, b)
        return q8._lrelu_conv(x, k, b, DT)

    cf, sf = fsplit(L - 1)
    stylized = dec_apply(adain(cf, sf).astype(DT), *dec[0])
    if upto == "dec0":
        return stylized.astype(jnp.float32)
    ndec = {"dec1": 1, "full": L - 1}[upto]
    for i in range(ndec):
        _, sfi = fsplit(L - 2 - i)
        if i < cfg.stylized_layers - 1:
            stylized = stylized + adain(stylized, sfi).astype(DT)
        stylized = dec_apply(stylized, *dec[i + 1])
        if upto == "dec1" and i == 0:
            return stylized.astype(jnp.float32)
    return stylized.astype(jnp.float32)


content, style = _rand_pair(1, 512)
variables = jax.jit(partial(bundle.model.init, train=False))(
    rng, content, style)
params = variables["params"]
scales = q8.calibrate_ld_q8(params, content, style,
                            stylized_layers=cfg.stylized_layers)

for upto in ("enc3", "enc4", "dec0", "dec1", "full"):
    def apply(params, c, s, _u=upto):
        st = q8._ScaleStream(scales["act_scales"])
        return trunc_pass(params, c, s, st, _u)

    per = _bench_chained(apply, params, content, style, iters=10)
    print(f"{upto:5s} b1: {per*1e3:.1f} ms", flush=True)
print("HW LD BISECT DONE", flush=True)
