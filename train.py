#!/usr/bin/env python
"""Training driver — drop-in CLI equivalent of the reference ``train.py``.

Same flag (``--config <yaml>``), same YAML files (config/rl|v100 load
verbatim), same output tree (``<output>/{logs,checkpoints,test}``), same
cadence keys (log_iter/test_iter/snapshot_save_iter), same loss mixing and
lr schedule.  Differences by design:

  * runs on TPU via JAX; the model, optimizer, and loss are one jitted SPMD
    program (multi-device via ``mesh_shape`` in the config),
  * checkpoints are unified orbax pytrees {params, opt_state, step, rng}
    (the reference saves bare weight dicts and parses the resume step from
    the filename — SURVEY §2.3),
  * errors are not swallowed per-iteration (the reference wraps every step
    in try/except-continue, train.py:179,229-231).
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
from rpst.data import ImageFolderDataset, InfiniteLoader, build_test_dataset, \
    iter_batches
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params, load_vgg_params
from rpst.train import (MetricWriter, create_train_state, latest_step,
                        make_train_step, restore_checkpoint, save_checkpoint)
from rpst.train.metrics import logger, save_image, save_image_row
from rpst.train.step import make_stylize_fn
from rpst.dist import (gather_replicated, is_main_process, make_mesh,
                       make_sharded_train_step, put_tree, replicate,
                       setup_distributed, shard_batch, tp_shardings)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="config/TrainConfig.yaml",
                        help="Config of training RPNet.")
    parser.add_argument("--set", nargs="*", default=[],
                        help="key=value config overrides")
    args = parser.parse_args()
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        import yaml as _yaml
        overrides[k] = _yaml.safe_load(v)
    cfg = load_config(args.config, overrides)

    # multi-host: join the slice-wide run BEFORE any other jax use (SURVEY
    # §2.4 "per-host input feeding"). Each host then loads a disjoint shard
    # of the global batch; process 0 owns all host-side writes.
    if cfg.distributed:
        setup_distributed(cfg.coordinator_address, cfg.num_processes,
                          cfg.process_id)
    main_proc = is_main_process()
    n_proc = jax.process_count()
    assert cfg.batch_size % n_proc == 0, \
        f"batch_size {cfg.batch_size} not divisible by {n_proc} processes"
    local_batch = cfg.batch_size // n_proc

    output = Path(cfg.output)
    if main_proc:
        for sub in ("logs", "checkpoints", "test"):
            (output / sub).mkdir(exist_ok=True, parents=True)
    writer = MetricWriter(output) if main_proc else None

    # Mosaic (Pallas) custom calls carry no SPMD partitioning rule, so a
    # >1-device mesh can't GSPMD-partition the fused folded kernels.  The
    # flagship folded config instead runs them PER SHARD inside one
    # shard_map (halo exchange + psum'd stats in fwd AND bwd —
    # models/fast_path_spatial.py, selected by make_sharded_train_step);
    # any other folded config falls back to the XLA ring conv, which
    # partitions fine.
    n_mesh_dev = (int(np.prod(list(cfg.mesh_shape.values())))
                  if cfg.mesh_shape
                  else jax.device_count() if n_proc > 1 else 1)
    bundle = build_model(cfg)
    if n_mesh_dev > 1 and cfg.get("folded_train_pallas", False):
        axes = set(cfg.mesh_shape) if cfg.mesh_shape else {"data"}
        if (bundle.network in ("multi_adain", "ccam", "sel_multi_adain")
                and bundle.folded_infer()
                and axes <= {"data", "spatial"}):
            logger.info("Multi-device mesh: folded training runs the "
                        "fused Pallas kernels per shard via shard_map "
                        "(adjoint halo exchange in the backward)")
        else:
            cfg = cfg.replace(folded_train_pallas=False)
            bundle = build_model(cfg)
            logger.info("Multi-device mesh: folded training uses the XLA "
                        "ring conv path (Pallas kernels don't "
                        "SPMD-partition for this config)")
    if cfg.vgg and Path(cfg.vgg).exists():
        _, vgg_vars = load_vgg_params(cfg.vgg, num_stages=bundle.vgg_stages)
        logger.info(f"Loaded VGG weights from {cfg.vgg}")
    else:
        _, vgg_vars = init_vgg_params(jax.random.PRNGKey(cfg.seed + 1),
                                      num_stages=bundle.vgg_stages)
        logger.warning(
            f"VGG weights {cfg.vgg!r} not found — using random init "
            f"(perceptual losses will be meaningless; fine for smoke runs)")

    # --- data -------------------------------------------------------------
    # label-supervised path (network=seg_adain): a Cityscapes side-by-side
    # dir yields (content, label) pairs; the label feeds the seg CE loss
    # (the path the reference wrote but left unreachable —
    # seg_adain_rp.py:87-96, datasets/cityspaces.py:28-84)
    seg_training = bool(cfg.network == "seg_adain" and cfg.seg_dir)

    # device-resident perceptual-target cache (train/target_cache.py):
    # skips the no-grad style/content VGG pass on every revisited image.
    # Single-device folded families only — the spatial shard_map path
    # computes its loss inside shard_map, and grad_accum microbatching
    # of cached targets is unimplemented.
    use_tcache = bool(cfg.get("target_cache", 0)) \
        and not (cfg.mesh_shape or n_proc > 1) \
        and not seg_training and bundle.folded_infer() \
        and cfg.img_size % 8 == 0 and int(cfg.get("grad_accum", 1)) == 1
    if cfg.get("target_cache", 0) and not use_tcache:
        logger.warning("target_cache ignored: needs a single-device "
                       "folded-family run with grad_accum=1")
    if seg_training:
        from rpst.data import CityscapesDataset
        content_ds = CityscapesDataset(cfg.seg_dir, cfg.img_size)
    else:
        content_ds = ImageFolderDataset(cfg.content_dir, cfg.img_size, fmt="*")
    style_ds = ImageFolderDataset(cfg.style_dir, cfg.img_size, fmt="*/*")
    if len(style_ds) == 0:  # reference uses '*/*' for wikiart subdirs
        style_ds = ImageFolderDataset(cfg.style_dir, cfg.img_size, fmt="*")
    assert len(content_ds) > 0, f"no content images in {cfg.content_dir}"
    assert len(style_ds) > 0, f"no style images in {cfg.style_dir}"
    # per-host feeding: every process draws a disjoint strided shard of the
    # SAME shuffled stream (seeds match across hosts), so the union of the
    # per-host batches equals the single-host stream
    content_iter = InfiniteLoader(content_ds, local_batch,
                                  cfg.num_workers, seed=cfg.seed,
                                  shard_index=jax.process_index(),
                                  shard_count=n_proc,
                                  with_indices=use_tcache)
    style_iter = InfiniteLoader(style_ds, local_batch, cfg.num_workers,
                                seed=cfg.seed + 1,
                                shard_index=jax.process_index(),
                                shard_count=n_proc,
                                with_indices=use_tcache)
    test_ds = build_test_dataset(cfg) if cfg.test_dir else None

    # --- state ------------------------------------------------------------
    rng = jax.random.PRNGKey(cfg.seed)
    sample_c = jnp.zeros((cfg.batch_size, cfg.img_size, cfg.img_size, 3))
    freeze = ("encoder",) if (cfg.network == "wct" and cfg.resume) else ()
    state, tx = create_train_state(bundle, rng, sample_c, sample_c, vgg_vars,
                                   freeze_prefixes=freeze)

    begin = 0
    if cfg.resume:
        ckpt = cfg.checkpoint_path or None
        if not ckpt:
            step = latest_step(output / "checkpoints")
            ckpt = output / "checkpoints" / str(step) if step else None
        if ckpt and Path(ckpt).exists():
            state = restore_checkpoint(ckpt, state)
            begin = int(state.step)
            logger.info(f"Loaded checkpoint from {ckpt} (step {begin})")
        else:
            logger.warning(f"resume requested but no checkpoint at {ckpt}")

    mesh, spatial, state_sharding = None, False, None
    if cfg.mesh_shape or n_proc > 1:
        # multi-process always runs under a global mesh (default: pure DP
        # over every chip of the slice)
        mesh = make_mesh(cfg.mesh_shape)
        spatial = "spatial" in mesh.axis_names
        if "model" in mesh.axis_names:
            # tensor parallelism: params + Adam moments channel-sharded
            state_sharding = tp_shardings(state, mesh)
            state = put_tree(state, state_sharding)
        else:
            state_sharding = None
            state = replicate(state, mesh)
        vgg_vars = replicate(vgg_vars, mesh)
        train_step = make_sharded_train_step(bundle, tx, mesh,
                                             spatial=spatial,
                                             with_labels=seg_training,
                                             state_sharding=state_sharding)
        logger.info(f"Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    else:
        train_step = make_train_step(bundle, tx, with_labels=seg_training,
                                     with_targets=use_tcache)
    stylize = make_stylize_fn(bundle)

    target_cache = None
    if use_tcache:
        from rpst.train.target_cache import DeviceTargetCache
        target_cache = DeviceTargetCache(
            img_size=cfg.img_size, dtype=bundle._folded_dtype(),
            content_slots=int(cfg.target_cache),
            style_slots=int(cfg.get("target_cache_style_slots", 8192)))
        logger.info(f"target_cache: {target_cache.content_slots} content "
                    f"slots ({target_cache.content_slots * (cfg.img_size // 8) ** 2 * 1024 / 2 ** 20:.0f} MiB HBM), "
                    f"{target_cache.style_slots} style slots — the "
                    "style/content VGG target pass is skipped on hits")

    if cfg.get("train_q8_targets", False) and use_tcache:
        logger.info("train_q8_targets superseded by target_cache (the "
                    "target pass it quantizes is skipped entirely)")
    elif cfg.get("train_q8_targets", False):
        # int8 no-grad VGG loss targets: calibrate activation scales once
        # on a representative batch (the VGG is frozen, so the scales
        # hold for the whole run); only the single-device folded loss
        # consumes them (ModelBundle.loss).  Multi-device routes never
        # do: the spatial shard_map Pallas path computes its loss inside
        # shard_map with bf16 targets, and a GSPMD-partitioned step must
        # not contain the chained-int8 VGG's Mosaic kernels (no SPMD
        # partitioning rule) — so calibration is skipped, not silently
        # ignored (round-4 ADVICE item 1).
        from rpst.dist import spatial_folded_train_ok
        if mesh is not None and not seg_training \
                and spatial_folded_train_ok(bundle, mesh):
            logger.info("train_q8_targets inactive: the spatial shard_map "
                        "Pallas train path keeps bf16 loss targets "
                        "(its loss runs inside shard_map)")
        elif n_mesh_dev > 1:
            logger.warning("train_q8_targets skipped on a multi-device "
                           "GSPMD mesh: the int8 target kernels are "
                           "Mosaic custom calls with no SPMD "
                           "partitioning rule")
        elif bundle.folded_infer() and cfg.img_size % 8 == 0:
            from rpst.models.fast_path_q8 import calibrate_vgg_targets_q8
            calib_c = next(content_iter)
            calib_c = jnp.asarray(calib_c[0] if seg_training else calib_c)
            calib_s = jnp.asarray(next(style_iter))
            bundle.q8_target_scales = calibrate_vgg_targets_q8(
                vgg_vars, calib_c, calib_s)
            logger.info("train_q8_targets: calibrated "
                        f"{len(bundle.q8_target_scales['act_scales'])} "
                        "VGG target scales (int8 no-grad loss targets)")
        else:
            logger.warning("train_q8_targets ignored: needs a folded "
                           "family config and img_size % 8 == 0")

    def run_test_dump(iteration: int):
        params, extra = state.params, state.extra
        if mesh is not None and n_proc > 1 and state_sharding is not None:
            # TP leaves live sharded across hosts — device_get on process
            # 0 alone would touch non-addressable shards. All processes
            # enter together and all-gather collectively; only process 0
            # proceeds to the host-side writes.
            params = gather_replicated(params, mesh)
            if extra:
                extra = gather_replicated(extra, mesh)
        if not main_proc:
            return
        out_dir = output / "test" / f"{iteration}"
        out_dir.mkdir(exist_ok=True, parents=True)
        variables = {"params": jax.device_get(params),
                     **jax.device_get(extra)}
        for content, style, c_names, s_names, c_m, s_m in iter_batches(
                test_ds, cfg.batch_size):
            use_mask = bool(cfg.use_mask) and c_m is not None
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

    # --- hot loop (train.py:177-231) ---------------------------------------
    from rpst.train.fault import CheckpointOnSignal
    from rpst.train.profiler import StepTimer, start_trace, stop_trace
    # async-aware throughput: per-step wall time under async dispatch
    # measures dispatch rate, not device progress (profiler.py docstring)
    timer = StepTimer(sync_every=max(cfg.log_iter, 10))
    profiling = False
    with CheckpointOnSignal() as stop:
        for i in range(1, cfg.max_iter):
            start = time.time()
            if cfg.profile_iter and main_proc:
                if i == cfg.profile_iter:
                    start_trace(str(output / "logs" / "trace"))
                    profiling = True
                elif profiling and i >= cfg.profile_iter + cfg.profile_steps:
                    jax.block_until_ready(loss_dict)
                    stop_trace()
                    profiling = False
                    logger.info(f"Wrote device trace for steps "
                                f"{cfg.profile_iter}.."
                                f"{i - 1} -> {output / 'logs' / 'trace'}")
            content_label = None
            if seg_training:
                content_np, label_np = next(content_iter)
                content = jnp.asarray(content_np)
                content_label = jnp.asarray(label_np)
            elif use_tcache:
                c_idx, content_np = next(content_iter)
                content = jnp.asarray(content_np)
            else:
                content = jnp.asarray(next(content_iter))
            if use_tcache:
                s_idx, style_np = next(style_iter)
                style = jnp.asarray(style_np)
            else:
                style = jnp.asarray(next(style_iter))
            if mesh is not None:
                content = shard_batch(content, mesh, spatial=spatial)
                style = shard_batch(style, mesh, spatial=spatial)
                if content_label is not None:
                    content_label = shard_batch(content_label, mesh,
                                                spatial=spatial)
            if seg_training:
                state, loss_dict = train_step(state, vgg_vars, content,
                                              style, content_label)
            elif use_tcache:
                t = target_cache.targets_for_batch(vgg_vars, style, content,
                                                   s_idx, c_idx)
                state, loss_dict = train_step(state, vgg_vars, content,
                                              style, t)
            else:
                state, loss_dict = train_step(state, vgg_vars, content, style)

            timer.tick(loss_dict)
            if i % cfg.log_iter == 0 and main_proc:
                loss_dict = jax.device_get(loss_dict)
                writer.write(begin + i, loss_dict)
                elapsed = round(time.time() - start, 2)
                rate = timer.steps_per_sec
                rate_str = (f", img/s {rate * cfg.batch_size:.2f}"
                            if rate == rate else "")
                loss_str = "".join(f", {k} {float(v)}"
                                   for k, v in loss_dict.items())
                if use_tcache:
                    tc = target_cache.stats()
                    loss_str += (f", tcache_hit_steps {tc['hit_steps']}"
                                 f"/{tc['hit_steps'] + tc['miss_steps']}")
                logger.info(f"Iterations {begin + i}, "
                            f"elapsed time: {elapsed}{rate_str}{loss_str}")

            if test_ds is not None and i % cfg.test_iter == 0:
                # all processes enter (the TP gather inside is collective);
                # non-main processes return before any host writes
                run_test_dump(begin + i)

            # preemption: multi-process runs must AGREE on checkpoint/stop
            # iterations (saving is collective), so the local SIGTERM flag
            # is synchronized at log_iter boundaries
            stop_now = stop.requested
            if n_proc > 1:
                if i % cfg.log_iter == 0:
                    from jax.experimental import multihost_utils
                    stop_now = bool(multihost_utils.process_allgather(
                        np.asarray(stop.requested, np.int32)).max())
                else:
                    stop_now = False

            if (i % cfg.snapshot_save_iter == 0 or (i + 1) == cfg.max_iter
                    or stop_now):
                # collective in multi-process: every process calls save
                # (orbax writes each shard from the host that owns it and
                # synchronizes internally)
                path = save_checkpoint(output / "checkpoints", state)
                if main_proc:
                    logger.info(f"Saved checkpoint {path}")
            if stop_now:
                if main_proc:
                    logger.info("Preemption signal received — checkpointed, "
                                "exiting cleanly")
                break

    if profiling:  # max_iter/preemption landed inside the trace window
        stop_trace()
    content_iter.close()
    style_iter.close()
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
