#!/usr/bin/env python
"""Per-family FLOPs denominators for BASELINE.md / bench.py.

The reference publishes no numbers (BASELINE.md), so every family's
``vs_baseline`` uses a FLOPs-derived V100 estimate: XLA's own cost
analysis of the family's stylize computation at 512px batch 1, divided
into an optimistic V100 effective rate (15.7 fp32 TFLOPs x ~35%
end-to-end efficiency for eager PyTorch ≈ 5.5 TFLOP/s — the same
assumption documented for the flagship in BASELINE.md).

Run on the CPU backend (compile-only; nothing executes):
    JAX_PLATFORMS=cpu python tools/flops_estimate.py
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import jax
import jax.numpy as jnp

V100_EFFECTIVE_TFLOPS = 15.7 * 0.35  # ≈ 5.5

FAMILIES = {
    # the bench.py --all configurations
    "multi_adain": dict(network="multi_adain", enc_stack_way="constant",
                        rp_blocks=5, hidden_dim=32),
    "adain": dict(network="adain", rp_blocks=5, hidden_dim=32),
    "wct": dict(network="wct", rp_blocks=5, hidden_dim=16,
                enc_stack_way="deeper"),
    "sanet": dict(network="sanet"),
    "dynamic_sanet": dict(network="dynamic_sanet"),
    "sel_multi_adain": dict(network="sel_multi_adain",
                            enc_stack_way="constant", rp_blocks=5,
                            hidden_dim=32),
    "ccam": dict(network="ccam", enc_stack_way="constant", rp_blocks=5,
                 hidden_dim=32),
    # remaining families at their reference-config shapes (config/rl/*)
    "mst": dict(network="mst", enc_stack_way="constant", rp_blocks=5,
                hidden_dim=32, stylized_layers=1),
    "ld_adain": dict(network="ld_adain", hidden_dim=16, ld_layer_num=5,
                     stylized_layers=5),
    "ld_adain2": dict(network="ld_adain2", hidden_dim=8, ld_layer_num=5),
    "ld_adain3": dict(network="ld_adain3", hidden_dim=32, ld_layer_num=5,
                      stylized_layers=5),
    "ld_adain4": dict(network="ld_adain4", hidden_dim=32, ld_layer_num=5),
    "ld_adain5": dict(network="ld_adain5", hidden_dim=32, ld_layer_num=5),
    "src": dict(network="src", hidden_dim=32),
    "mrf": dict(network="mrf"),
    "spade": dict(network="spade"),
    "seg_adain": dict(network="seg_adain"),
}


def stylize_flops(name: str, img: int = 512) -> float:
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params

    cfg = load_config(dict(img_size=img, **FAMILIES[name]))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    c = jnp.zeros((1, img, img, 3), jnp.float32)
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    variables = bundle.init(rng, c, c, vgg_vars)

    def fn(variables, vgg_vars, c, s):
        return bundle.stylize(variables, vgg_vars, c, s)

    lowered = jax.jit(fn).lower(variables, vgg_vars, c, c)
    # pre-optimization HLO cost analysis: flops counting without the
    # (expensive at 512px) backend compile; falls back to compiling
    cost = lowered.cost_analysis()
    if not cost or "flops" not in (cost[0] if isinstance(cost, list)
                                   else cost):
        cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    return float(cost["flops"])


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or FAMILIES
    print(f"{'family':<16} {'GFLOP/img (512px)':>18} {'V100 est img/s':>16}")
    for name in names:
        f = stylize_flops(name)
        est = V100_EFFECTIVE_TFLOPS * 1e12 / f
        print(f"{name:<16} {f / 1e9:>18.1f} {est:>16.2f}")


if __name__ == "__main__":
    main()
