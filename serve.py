#!/usr/bin/env python
"""Production serving driver: stylize a folder of content images against a
style image (or folder) through the fastest execution path.

The reference has no serving story (training-time eval dumps only); this
driver targets deployment: checkpoint load once, jit once, stream batches
at a fixed image size, pick the execution strategy by flag:

  * ``--mode q8``      int8 PTQ (fastest; 2x MXU rate on v5e; calibrates
                       on the first batch, ~51-59 dB PSNR vs bf16),
  * ``--mode folded``  exact bf16 space-to-depth execution,
  * ``--mode standard``the plain model path (any network).

q8/folded require the flagship family (plain multi_adain constant stack);
other networks fall back to standard automatically.

Usage:
  python serve.py --config cfg.yaml --content in/ --style style.png \
      --out stylized/ [--mode q8] [--set key=val ...]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "src"))

import jax
import jax.numpy as jnp
import numpy as np

from rpst.config import load_config
from rpst.data import ImageFolderDataset
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params, load_vgg_params
from rpst.train import create_train_state, latest_step, restore_checkpoint
from rpst.train.metrics import logger, save_image


def _load_images(path: Path, img_size: int):
    if path.is_dir():
        ds = ImageFolderDataset(path, img_size, fmt="*")
        return [(ds.paths[i].stem, ds[i]) for i in range(len(ds))]
    ds = ImageFolderDataset(path.parent, img_size, fmt=path.name)
    return [(path.stem, ds[0])]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--content", required=True)
    parser.add_argument("--style", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--mode", default="folded",
                        choices=["standard", "folded", "q8"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--set", nargs="*", default=[])
    args = parser.parse_args()
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        import yaml as _yaml
        overrides[k] = _yaml.safe_load(v)
    cfg = load_config(args.config, overrides)

    bundle = build_model(cfg)
    if cfg.vgg and Path(cfg.vgg).exists():
        _, vgg_vars = load_vgg_params(cfg.vgg, num_stages=bundle.vgg_stages)
    else:
        _, vgg_vars = init_vgg_params(jax.random.PRNGKey(cfg.seed + 1),
                                      num_stages=bundle.vgg_stages)

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    state, _ = create_train_state(bundle, rng, sample, sample, vgg_vars)
    ckpt = cfg.checkpoint_path or None
    if not ckpt and cfg.output:
        step = latest_step(Path(cfg.output) / "checkpoints")
        ckpt = Path(cfg.output) / "checkpoints" / str(step) if step else None
    if ckpt and Path(ckpt).exists():
        state = restore_checkpoint(ckpt, state)
        logger.info(f"Loaded checkpoint {ckpt}")
    else:
        logger.warning("No checkpoint — serving randomly initialized params")
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.extra)}

    mode = args.mode
    fast_ok = (bundle.network == "multi_adain"
               and cfg.enc_stack_way != "deeper" and cfg.inception_num == 0
               and cfg.attention == "none" and not cfg.shuffle
               and not cfg.sort and not cfg.use_mask)
    if mode in ("folded", "q8") and not fast_ok:
        logger.warning(f"--mode {mode} needs the plain multi_adain constant "
                       "stack; falling back to standard")
        mode = "standard"

    contents = _load_images(Path(args.content), cfg.img_size)
    styles = _load_images(Path(args.style), cfg.img_size)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    style_img = jnp.asarray(styles[0][1])[None]
    scales = None
    if mode == "q8":
        from rpst.models.fast_path_q8 import calibrate_multi_adain_q8
        calib = jnp.asarray(
            np.stack([img for _, img in contents[:args.batch]]))
        scales = calibrate_multi_adain_q8(
            variables["params"], calib,
            jnp.broadcast_to(style_img, calib.shape))
        logger.info(f"Calibrated {len(scales['act_scales'])} layer scales")

    @jax.jit
    def run(params_and_extra, content, style):
        if mode == "q8":
            from rpst.models.fast_path_q8 import stylize_multi_adain_folded_q8
            return stylize_multi_adain_folded_q8(
                params_and_extra["params"], scales, content, style)
        if mode == "folded":
            from rpst.models.fast_path import stylize_multi_adain_folded
            return stylize_multi_adain_folded(
                params_and_extra["params"], content, style)
        return bundle.stylize(params_and_extra, vgg_vars, content, style)

    n_done, t0 = 0, time.perf_counter()
    for i in range(0, len(contents), args.batch):
        chunk = contents[i:i + args.batch]
        batch = jnp.asarray(np.stack([img for _, img in chunk]))
        style_b = jnp.broadcast_to(style_img, batch.shape)
        out = np.asarray(run(variables, batch, style_b))
        for b, (name, _) in enumerate(chunk):
            save_image(out[b], out_dir / f"{name}-{styles[0][0]}.png")
        n_done += len(chunk)
    dt = time.perf_counter() - t0
    logger.info(f"Stylized {n_done} images in {dt:.2f}s "
                f"({n_done / dt:.1f} img/s incl host IO) -> {out_dir}")


if __name__ == "__main__":
    main()
