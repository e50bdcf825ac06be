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

    compiled = jax.jit(fn).lower(variables, vgg_vars, c, c).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    return float(cost["flops"])


def main():
    print(f"{'family':<16} {'GFLOP/img (512px)':>18} {'V100 est img/s':>16}")
    for name in FAMILIES:
        f = stylize_flops(name)
        est = V100_EFFECTIVE_TFLOPS * 1e12 / f
        print(f"{name:<16} {f / 1e9:>18.1f} {est:>16.2f}")


if __name__ == "__main__":
    main()
