#!/usr/bin/env python
"""Batch-inference driver — drop-in CLI equivalent of the reference
``test.py`` (with its ``iterations=i`` NameError fixed — the committed
reference driver cannot run past setup; SURVEY §2.3).

Usage: ``python test.py --config <yaml>`` — stylizes the configured test
set and writes ``{content}-{style}-cat.png`` (3-panel) + the stylized PNG
under ``<output>/test/test_output/``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "src"))

import jax
import jax.numpy as jnp
import numpy as np

from rpst.config import load_config
from rpst.data import build_test_dataset, iter_batches
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params, load_vgg_params
from rpst.train import create_train_state, latest_step, restore_checkpoint
from rpst.train.metrics import logger, save_image, save_image_row
from rpst.train.step import make_stylize_fn


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="config/TrainConfig.yaml")
    parser.add_argument("--set", nargs="*", default=[])
    args = parser.parse_args()
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        import yaml as _yaml
        overrides[k] = _yaml.safe_load(v)
    cfg = load_config(args.config, overrides)

    output = Path(cfg.output)
    out_dir = output / "test" / "test_output"
    out_dir.mkdir(exist_ok=True, parents=True)

    bundle = build_model(cfg)
    if cfg.vgg and Path(cfg.vgg).exists():
        _, vgg_vars = load_vgg_params(cfg.vgg, num_stages=bundle.vgg_stages)
    else:
        _, vgg_vars = init_vgg_params(jax.random.PRNGKey(cfg.seed + 1),
                                      num_stages=bundle.vgg_stages)
        logger.warning("VGG weights not found — random init")

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((cfg.batch_size, cfg.img_size, cfg.img_size, 3))
    state, _ = create_train_state(bundle, rng, sample, sample, vgg_vars)

    ckpt = cfg.checkpoint_path or None
    if not ckpt:
        step = latest_step(output / "checkpoints")
        ckpt = output / "checkpoints" / str(step) if step else None
    if ckpt and Path(ckpt).exists():
        state = restore_checkpoint(ckpt, state)
        logger.info(f"Loaded checkpoint from {ckpt} (step {int(state.step)})")
    else:
        logger.warning("No checkpoint found — stylizing with random weights")

    variables = {"params": state.params, **state.extra}
    stylize = make_stylize_fn(bundle)

    test_ds = build_test_dataset(cfg)
    for idx, (content, style, c_names, s_names, c_m, s_m) in enumerate(
            iter_batches(test_ds, cfg.batch_size)):
        use_mask = bool(cfg.use_mask) and c_m is not None
        if cfg.network == "dynamic_sanet":
            # dump the adaptive attention claim maps like the reference
            # test() (sanet.py:334-366)
            stylized, aux = jax.jit(bundle.stylize_with_aux)(
                variables, vgg_vars, jnp.asarray(content),
                jnp.asarray(style))
            from rpst.viz import save_claim_maps
            save_claim_maps(jax.device_get(aux["relu5_1"]), output,
                            iterations=int(state.step), bid=idx)
        else:
            stylized = stylize(variables, vgg_vars, jnp.asarray(content),
                               jnp.asarray(style),
                               jnp.asarray(c_m) if use_mask else None,
                               jnp.asarray(s_m) if use_mask else None)
        stylized = np.asarray(stylized)
        for b, (cn, sn) in enumerate(zip(c_names, s_names)):
            save_image_row([content[b], style[b], stylized[b]],
                           out_dir / f"{cn}-{sn}-cat.png")
            save_image(stylized[b], out_dir / f"{cn}-{sn}.png")
            logger.info(f"Proceed {cn}-{sn}.")


if __name__ == "__main__":
    main()
