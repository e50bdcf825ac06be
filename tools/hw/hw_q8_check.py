"""On-hardware PSNR spot checks for the round-3 q8 serving paths.

Run on the real TPU once the axon tunnel is back:
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_q8_check.py
"""
import sys
sys.path.insert(0, "src")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

from rpst.config import load_config
from rpst.models import build_model, fast_path_q8 as q8
from rpst.nn.vgg import init_vgg_params


def psnr(got, ref):
    mse = float(np.mean((got - ref) ** 2))
    span = float(ref.max() - ref.min()) or 1.0
    return 10 * np.log10(span * span / max(mse, 1e-12))


rngn = np.random.default_rng(0)
IMG = 128

CASES = [
    ("sanet", dict(network="sanet"), "sanet"),
    ("dynamic_sanet", dict(network="dynamic_sanet", ada_module="aea"),
     "sanet"),
    ("src", dict(network="src", hidden_dim=32), "src"),
    ("mrf", dict(network="mrf", hidden_dim=32, rp_blocks=5), "mrf"),
    ("seg_adain", dict(network="seg_adain", hidden_dim=32), "seg"),
    ("mst", dict(network="mst", enc_stack_way="constant", rp_blocks=3,
                 hidden_dim=32, stylized_layers=1, n_clusters=2), "mst"),
    ("spade", dict(network="spade", hidden_dim=32, rp_blocks=5), "spade"),
    ("ld_adain", dict(network="ld_adain", hidden_dim=16, rp_blocks=5,
                      use_mask=False), "ld"),
]

for name, cfgd, kind in CASES:
    try:
        cfg = load_config(dict(img_size=IMG, compute_dtype="bfloat16",
                               **cfgd))
        bundle = build_model(cfg)
        key = jax.random.PRNGKey(0)
        c = jnp.asarray(rngn.random((1, IMG, IMG, 3), np.float32))
        s = jnp.asarray(rngn.random((1, IMG, IMG, 3), np.float32))
        _, vgg_vars = init_vgg_params(key, num_stages=bundle.vgg_stages)
        variables = bundle.init(key, c, s, vgg_vars)
        params = variables["params"]
        ref = np.asarray(jax.jit(
            lambda v, g, a, b: bundle.stylize(v, g, a, b))(
                variables, vgg_vars, c, s)).astype(np.float32)

        if kind == "sanet":
            ad = name == "dynamic_sanet"
            scales = q8.calibrate_sanet_q8(variables, vgg_vars, c, s,
                                           adaptive=ad,
                                           ada_module=cfg.ada_module)
            fn = partial(q8.stylize_sanet_q8, variables, vgg_vars, scales,
                         adaptive=ad, ada_module=cfg.ada_module)
        elif kind == "src":
            scales = q8.calibrate_src_q8(params, vgg_vars, c, s)
            fn = partial(q8.stylize_src_q8, params, vgg_vars, scales)
        elif kind == "mrf":
            scales = q8.calibrate_mrf_q8(params, c, s)
            fn = partial(q8.stylize_mrf_q8, params, scales)
        elif kind == "seg":
            scales = q8.calibrate_adain_q8(params["adain_rp"], c, s)
            fn = partial(q8.stylize_adain_q8, params["adain_rp"], scales)
        elif kind == "mst":
            scales = q8.calibrate_mst_q8(params, c, s, stylized_layers=1,
                                         n_clusters=2)
            fn = partial(q8.stylize_mst_folded_q8, params, scales,
                         stylized_layers=1, n_clusters=2)
        elif kind == "ld":
            scales = q8.calibrate_ld_q8(params, c, s,
                                        stylized_layers=cfg.stylized_layers)
            # check BOTH conv engines on hw (auto gates on batch)
            fn = partial(q8.stylize_ld_q8, params, scales,
                         stylized_layers=cfg.stylized_layers,
                         conv_impl="pallas")
            got_x = np.asarray(jax.jit(partial(
                q8.stylize_ld_q8, params, scales,
                stylized_layers=cfg.stylized_layers,
                conv_impl="xla"))(c, s))
            print(f"{name}[xla]: on-hw q8 PSNR {psnr(got_x, ref):.1f} dB",
                  flush=True)
        else:
            scales = q8.calibrate_spade_q8(params, c, s)
            fn = partial(q8.stylize_spade_q8, params, scales, ndf=cfg.ndf,
                         spade_norm=cfg.spade_norm)
        got = np.asarray(jax.jit(fn)(c, s))
        p = psnr(got, ref)
        print(f"{name}: on-hw q8 PSNR {p:.1f} dB "
              f"({len(scales['act_scales'])} scales)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
print("HW Q8 CHECK DONE", flush=True)
