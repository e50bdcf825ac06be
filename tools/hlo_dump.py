"""Dump the optimized HLO (+ cost analysis) of a serving program.

The diagnostic that cracked the LD q8 small-batch collapse (BASELINE.md
"LD v1 int8 serving"): when a program runs far below its own cost
model, the compiled HLO shows why — layout wars between Mosaic custom
calls (row-major operand constraints) and XLA convs (conv-preferred
{3,0,2,1:T(2,128)} at small batch) appear as big transposing `copy`
ops; space-to-batch rewrites appear as convs with `0b1f` dim_labels.

Usage (on the real chip via the axon tunnel, or CPU):
    PYTHONPATH=/root/.axon_site:src python tools/hlo_dump.py \
        --network ld_adain --mode q8 --batch 1 --img 512 \
        --out /tmp/hlo.txt [--set hidden_dim=16 ...]

Then grep the dump for:
    'copy('          relayout copies (look at shapes x layouts)
    'dim_labels=0b1f' space-to-batch rewritten convs
    'custom-call'     Mosaic kernels + their operand layout constraints
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "src"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default="multi_adain")
    ap.add_argument("--mode", default="standard",
                    choices=["standard", "folded", "q8"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--out", default="/tmp/hlo.txt")
    ap.add_argument("--set", nargs="*", default=[],
                    help="config overrides key=val")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rpst.config import load_config
    from rpst.models import build_model

    over = dict(network=args.network, img_size=args.img)
    for kv in getattr(args, "set"):
        k, v = kv.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                v = {"true": True, "false": False}.get(v.lower(), v)
        over[k] = v
    cfg = load_config(over)
    bundle = build_model(cfg)

    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.random((args.batch, args.img, args.img, 3),
                               np.float32))
    s = jnp.asarray(rng.random((args.batch, args.img, args.img, 3),
                               np.float32))
    from rpst.nn.vgg import init_vgg_params
    _, vgg_vars = init_vgg_params(jax.random.PRNGKey(1),
                                  num_stages=bundle.vgg_stages)
    variables = bundle.init(jax.random.PRNGKey(0), c, s, vgg_vars)

    if args.mode == "q8":
        from rpst.serving import calibrate_scales, make_run_impl
        scales = calibrate_scales(bundle, cfg, variables, vgg_vars, c, s)
        run = make_run_impl(bundle, cfg, "q8", scales, vgg_vars,
                            q8_interpret=jax.default_backend() == "cpu")
        fn = lambda c, s: run(variables, c, s)
    else:
        fn = lambda c, s: bundle.stylize(variables, vgg_vars, c, s)

    comp = jax.jit(fn).lower(c, s).compile()
    txt = comp.as_text()
    Path(args.out).write_text(txt)
    print(f"wrote {len(txt)} chars -> {args.out}")
    try:
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        for k in ("flops", "bytes accessed"):
            if k in ca:
                print(f"cost {k}: {ca[k]:.3e}")
    except Exception as e:  # cost analysis is backend-best-effort
        print("cost_analysis unavailable:", e)
    n_copy = txt.count(" copy(")
    n_s2b = txt.count("dim_labels=0b1f")
    n_cc = txt.count("tpu_custom_call")
    print(f"copies: {n_copy}  space-to-batch convs: {n_s2b}  "
          f"mosaic custom calls: {n_cc}")


if __name__ == "__main__":
    main()
