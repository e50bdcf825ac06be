#!/usr/bin/env python
"""Production serving driver: stylize a folder of content images against a
style image (or folder) through the fastest execution path.

The reference has no serving story (training-time eval dumps only); this
driver targets deployment: checkpoint load once, jit once, stream batches
at a fixed image size, pick the execution strategy by flag:

  * ``--mode q8``      int8 PTQ (fastest; calibrates on the first batch,
                       ~51-59 dB PSNR vs bf16; throughput mode pairs it
                       with ``--batch 32/48`` — per-dispatch costs keep
                       amortizing past 8: 532 img/s b8 -> 718 b48 at
                       512px, BASELINE.md),
  * ``--mode folded``  exact bf16 space-to-depth execution,
  * ``--mode standard``the plain model path (any network).

folded covers the constant-stack families (multi_adain,
sel_multi_adain, ccam, mst); q8 covers those plus adain, seg_adain, wct,
mrf, spade (wide-channel standard-layout int8 kernel), sanet,
dynamic_sanet, src (chained-int8 VGG encode + int8 mirror decode) and
ld_adain (Pallas 3x3 smalls + XLA int8 7x7 bigs — the 2x-int8-rate
window, fast_path_q8._xla_conv_q8); other networks fall back to
standard automatically.

``--mesh N`` serves data-parallel over the first N devices (batch sharded
on a ``data`` axis; params replicated); ``--mesh data=2,spatial=2`` adds
image-ROW sharding so a single high-resolution request spans several
chips.  multi_adain / sel_multi_adain / ccam (folded) and sanet /
dynamic_sanet (standard) route through hand-placed shard_map paths with
per-shard Pallas kernels (models/fast_path_spatial.py — ppermute halos,
psum'd statistics, all-gathered style keys for attention); other
families take XLA's GSPMD partitioning of the standard program (the
stride-1 conv halo exchanges derive from the sharding annotations —
same machinery as training's spatial axis, dist/mesh.py).  mst's
graph-cut host callback cannot shard spatially — serve it with a
data-only mesh.
Host IO (decode + PNG encode) overlaps device compute via async dispatch:
batch t+1 is decoded and dispatched before batch t's outputs are fetched.

``--daemon`` switches from the one-shot folder sweep to a persistent
line-JSON TCP loop with DYNAMIC REQUEST BATCHING (rpst/serving.py):
concurrent single-image requests coalesce into fixed-shape device
batches — full batches amortize per-dispatch latency ~8x on the
flagship (BASELINE.md b1 vs b8) — with a ``--max-wait-ms`` window
bounding added latency when traffic is sparse.

Usage:
  python serve.py --config cfg.yaml --content in/ --style style.png \
      --out stylized/ [--mode q8] [--mesh 4] [--set key=val ...]
  python serve.py ... --daemon [--port N] [--max-wait-ms 5]
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
from rpst.serving import (DynamicBatcher, calibrate_scales, make_run_impl,
                          resolve_mode, serve_daemon)
from rpst.train import create_train_state, latest_step, restore_checkpoint
from rpst.train.metrics import logger, save_image


def _f32_to_u8(arr):
    from rpst.data.transforms import to_u8
    return to_u8(arr)


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
                        choices=["standard", "folded", "q8", "auto"],
                        help="execution strategy; 'auto' picks the "
                        "fastest path this network supports "
                        "(q8 > folded > standard)")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--mesh", type=str, default="1",
                        help="device mesh: N (data-parallel over N devices) "
                        "or axis=size pairs like 'data=2,spatial=2' — a "
                        "'spatial' axis shards image ROWS so one high-res "
                        "image can use several chips (XLA inserts the "
                        "stride-1 conv halo exchanges from the shardings)")
    parser.add_argument("--daemon", action="store_true",
                        help="serve a line-JSON TCP loop with dynamic "
                        "request batching instead of sweeping --content "
                        "once (--content still seeds q8 calibration; "
                        "protocol: rpst/serving.py docstring)")
    parser.add_argument("--port", type=int, default=0,
                        help="daemon TCP port (0 = ephemeral; the bound "
                        "port is logged as 'DAEMON LISTENING host:port')")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="daemon batching window: the first queued "
                        "request waits at most this long for the batch "
                        "to fill before dispatching")
    parser.add_argument("--set", nargs="*", default=[])
    args = parser.parse_args()
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        import yaml as _yaml
        overrides[k] = _yaml.safe_load(v)
    if args.mode != "standard":
        # route stylize through the folded fast paths the bundle supports
        overrides.setdefault("exec_strategy", "folded")
    if args.mesh.isdigit():
        mesh_shape = {"data": int(args.mesh)}
    else:
        mesh_shape = {k: int(v) for k, v in
                      (kv.split("=", 1) for kv in args.mesh.split(","))}
        assert set(mesh_shape) <= {"data", "spatial"}, mesh_shape
        mesh_shape.setdefault("data", 1)
    n_mesh_dev = 1
    for s in mesh_shape.values():
        n_mesh_dev *= s
    if n_mesh_dev > 1:
        # Mosaic (Pallas) custom calls have no SPMD partitioning rule —
        # folded serving over a mesh must take the XLA ring conv path
        overrides.setdefault("folded_infer_pallas", False)
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

    mode = resolve_mode(bundle, args.mode, batch=args.batch)
    # On the CPU backend (tests, dry runs) the int8 Pallas kernels run in
    # interpret mode; on TPU they compile natively.
    q8_interpret = jax.default_backend() == "cpu"

    data_par = mesh_shape.get("data", 1)
    spatial_par = mesh_shape.get("spatial", 1)

    mesh = None
    if n_mesh_dev > 1 and mode == "q8":
        # the int8 path runs hand-written Pallas kernels, which the SPMD
        # partitioner can't split across a mesh; folded XLA partitions fine
        logger.warning("--mesh with --mode q8 is unsupported (Pallas "
                       "kernels don't partition); using folded bf16")
        mode = "folded"
    if n_mesh_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rpst.dist import make_mesh
        devices = jax.devices()[:n_mesh_dev]
        assert len(devices) == n_mesh_dev, (
            f"--mesh {args.mesh} needs {n_mesh_dev} devices but only "
            f"{len(jax.devices())} exist")
        assert args.batch % data_par == 0, "--batch must divide by data axis"
        if spatial_par > 1:
            assert cfg.img_size % spatial_par == 0, \
                "img_size must divide by the spatial axis"
            assert bundle.network != "mst", (
                "mst's graph-cut host callback cannot shard spatially; "
                "use a data-only mesh (--mesh N)")
        mesh = make_mesh(mesh_shape, devices)
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        vgg_vars = jax.device_put(vgg_vars, NamedSharding(mesh, P()))
        logger.info(f"Serving over mesh {mesh_shape} "
                    f"({'rows sharded, ' if spatial_par > 1 else ''}"
                    f"batch sharded {data_par}-way)")

    contents = _load_images(Path(args.content), cfg.img_size)
    styles = _load_images(Path(args.style), cfg.img_size)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    style_img = jnp.asarray(styles[0][1])[None]
    scales = None
    if mode == "q8":
        # per-tensor absmax needs few images; calibrating on a large
        # serving batch (--batch 32/48 throughput mode) would make
        # calibration peak memory exceed serving peak memory
        calib = jnp.asarray(
            np.stack([img for _, img in
                      contents[:min(args.batch, 8)]]))
        calib_style = jnp.broadcast_to(style_img, calib.shape)
        scales = calibrate_scales(bundle, cfg, variables, vgg_vars,
                                  calib, calib_style)
        logger.info(f"Calibrated {len(scales['act_scales'])} layer scales")

    _run_impl = make_run_impl(bundle, cfg, mode, scales, vgg_vars,
                              q8_interpret=q8_interpret)
    if (mesh is not None and spatial_par > 1 and mode == "folded"
            and bundle.network in ("multi_adain", "sel_multi_adain",
                                   "ccam")):
        # one shard_map over the spatial axis: ppermute halo rows + psum'd
        # AdaIN stats / SE pools / CCAM energies, per-shard Pallas kernels
        # (Mosaic custom calls can't be SPMD-partitioned, but under
        # shard_map they never need to be)
        from rpst.models import fast_path_spatial as fps
        _dtypef = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                   else jnp.float32)
        if bundle.network == "multi_adain":
            _run_impl = lambda v, c, s: \
                fps.stylize_multi_adain_folded_spatial(
                    v["params"], c, s, mesh, dtype=_dtypef)
        elif bundle.network == "sel_multi_adain":
            _run_impl = lambda v, c, s: \
                fps.stylize_sel_multi_adain_folded_spatial(
                    v, c, s, mesh, dtype=_dtypef)
        else:
            _run_impl = lambda v, c, s: fps.stylize_ccam_folded_spatial(
                v, c, s, mesh, stylized_layers=cfg.stylized_layers,
                dtype=_dtypef)
        logger.info("spatial mesh: shard_map folded stylize (halo "
                    "exchange + per-shard fused kernels)")
    elif (mesh is not None and spatial_par > 1 and mode == "standard"
            and bundle.network in ("sanet", "dynamic_sanet")):
        # shard_map SANet: halo VGG encode, per-shard flash attention on
        # local query rows vs all-gathered style keys/values (the Pallas
        # attention kernel GSPMD cannot partition), halo mirror decode
        from rpst.models.fast_path_spatial import stylize_sanet_spatial
        _dtypef = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                   else jnp.float32)
        _adaptive = bundle.network == "dynamic_sanet"
        _run_impl = lambda v, c, s: stylize_sanet_spatial(
            v, vgg_vars, c, s, mesh, adaptive=_adaptive,
            ada_module=cfg.ada_module, dtype=_dtypef)
        logger.info("spatial mesh: shard_map sanet stylize (halo VGG "
                    "encode + per-shard flash attention)")

    def _run_u8(variables, content, style):
        """uint8 transfer boundary: images cross host<->device as uint8
        (4x less PCIe/tunnel traffic than f32 — measured dominating the
        daemon's per-batch time through the axon tunnel). Bit-identical
        to the host-side math: u8/255 division and the save-side
        clip*255+0.5 floor run in f32 either way, so output PNG bytes
        are unchanged."""
        c = content.astype(jnp.float32) / 255.0
        s = style.astype(jnp.float32) / 255.0
        y = _run_impl(variables, c, s)
        y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0) * 255.0 + 0.5
        return y.astype(jnp.uint8)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        img_spec = P("data", "spatial") if spatial_par > 1 else P("data")
        run = jax.jit(_run_u8,
                      in_shardings=(NamedSharding(mesh, P()),
                                    NamedSharding(mesh, img_spec),
                                    NamedSharding(mesh, img_spec)),
                      out_shardings=NamedSharding(mesh, img_spec))
    else:
        run = jax.jit(_run_u8)

    style_u8 = _f32_to_u8(np.asarray(styles[0][1]))
    if args.daemon:
        batcher = DynamicBatcher(
            lambda c, s: run(variables, c, s),
            batch_size=args.batch, max_wait_ms=args.max_wait_ms)
        try:
            serve_daemon(batcher, cfg.img_size, out_dir, port=args.port,
                         default_style=style_u8, to_u8=_f32_to_u8)
        finally:
            batcher.close()
        return

    style_img_u8 = jnp.asarray(style_u8)[None]

    def _dispatch(chunk):
        """Decode + device_put + async dispatch; pad short batches so the
        mesh-sharded jit sees one static shape."""
        batch = _f32_to_u8(np.stack([img for _, img in chunk]))
        pad = 0
        if mesh is not None and len(chunk) % data_par:
            pad = data_par - len(chunk) % data_par
            batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
        b = jnp.asarray(batch)
        return run(variables, b, jnp.broadcast_to(style_img_u8, b.shape)), pad

    def _flush(chunk, out, pad):
        arr = np.asarray(out)  # blocks until the device finishes
        if pad:
            arr = arr[:len(chunk)]
        for b, (name, _) in enumerate(chunk):
            save_image(arr[b], out_dir / f"{name}-{styles[0][0]}.png")

    # double-buffered loop: batch t+1 decodes/dispatches while t computes
    n_done, t0, pending = 0, time.perf_counter(), None
    for i in range(0, len(contents), args.batch):
        chunk = contents[i:i + args.batch]
        out, pad = _dispatch(chunk)
        if pending is not None:
            _flush(*pending)
            n_done += len(pending[0])
        pending = (chunk, out, pad)
    if pending is not None:
        _flush(*pending)
        n_done += len(pending[0])
    dt = time.perf_counter() - t0
    logger.info(f"Stylized {n_done} images in {dt:.2f}s "
                f"({n_done / dt:.1f} img/s incl host IO) -> {out_dir}")


if __name__ == "__main__":
    main()
