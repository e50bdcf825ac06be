"""Device meshes and sharded training — the layer the reference never had.

The reference is strictly single-process, single-GPU (SURVEY §2.4: no
DDP/collectives anywhere; launchers pin one CUDA device).  Here scaling is
first-class and idiomatic TPU:

  * a ``jax.sharding.Mesh`` over the slice, with axes
      - ``data``    — batch (data parallel); gradients all-reduce over ICI
        automatically via jit's SPMD partitioner,
      - ``spatial`` — optional image-height sharding (the image analogue of
        sequence/context parallelism): stride-1 RP convs need halo
        exchange at shard edges, which XLA inserts as collective-permutes
        from the sharding annotations alone;
  * parameters and optimizer state replicated by default (these models
    are tiny; activations dominate — SURVEY §5 "long-context" note), with
    optional tensor parallelism over a ``model`` axis (``tp_shardings``):
    conv channels Megatron-column-sharded via param PartitionSpecs, the
    SPMD partitioner inserting the channel collectives;
  * one ``jit`` holding loss, grads, Adam, so the whole step is a single
    SPMD program with fused collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_distributed(coordinator_address: str = "", num_processes: int = -1,
                      process_id: int = -1) -> None:
    """Join a multi-process (multi-host) run via jax.distributed.

    One process per host of a TPU slice; on TPU pods all three arguments
    auto-detect from the pod metadata, so call sites can pass the config
    keys straight through.  Idempotent.  After this returns,
    ``jax.devices()`` is the GLOBAL device list and meshes built from it
    span the slice; batches must then enter through ``shard_batch``, which
    assembles global arrays from per-host data.  (The reference is
    single-process by construction — SURVEY §2.4.)"""
    # NB: must not touch jax.process_count()/jax.devices() here — any
    # backend query initializes XLA and makes initialize() illegal
    if jax._src.distributed.global_state.client is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes and num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id is not None and process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_main_process() -> bool:
    """True on the process that owns host-side writes (checkpoints,
    metrics, eval dumps) — process 0, or any process in single-host runs."""
    return jax.process_index() == 0


def make_mesh(mesh_shape=None, devices=None) -> Mesh:
    """mesh_shape: dict like {'data': 8} or {'data': 4, 'spatial': 2};
    None uses all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = {"data": len(devices)}
    names = tuple(mesh_shape.keys())
    sizes = tuple(mesh_shape.values())
    assert int(np.prod(sizes)) == len(devices), (mesh_shape, len(devices))
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def put_tree(tree, shardings):
    """device_put a pytree with per-leaf (or one broadcast) sharding,
    multi-process safe.

    Single-process: plain ``jax.device_put``.  Multi-process: device_put
    cannot target non-addressable devices, so each leaf is assembled with
    ``jax.make_array_from_callback`` — every process holds the full
    host-local value (state is computed identically on all processes) and
    contributes the slices its local devices own.  Works for replicated
    AND channel-sharded (TP) specs alike."""
    one = isinstance(shardings, jax.sharding.Sharding)
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    if one:
        return jax.tree.map(lambda x: put(x, shardings), tree)
    return jax.tree.map(put, tree, shardings)


def replicate(tree, mesh: Mesh):
    return put_tree(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Shard NHWC image batches: N over 'data', optionally H over 'spatial'.

    Multi-process: each host passes its PER-HOST slice of the batch (fed
    by the sharded ``InfiniteSampler``) and a global array is assembled
    across hosts — local data lands on local devices, zero cross-host
    copies.  Single-process: a plain device_put."""
    sharding = NamedSharding(
        mesh, P("data", "spatial") if spatial and "spatial" in mesh.axis_names
        else P("data"))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(batch))
    return jax.device_put(batch, sharding)


def _tp_leaf_spec(x, tp: int, min_channels: int):
    """Channel PartitionSpec for one param/opt-state leaf under TP.

    Megatron-style column parallelism adapted to convs: shard the output-
    channel (last) dim of conv kernels and the channel dim of per-channel
    vectors (biases, norm scales, Adam moments mirror these shapes) over
    the ``model`` axis.  The SPMD partitioner propagates the sharding into
    the conv and inserts the activation collectives (all-gather on the
    channel dim before the next full-channel conv) over ICI — the
    reference has no TP at all (SURVEY §2.4: "optional channel-sharded
    conv via pjit param specs")."""
    shape = getattr(x, "shape", ())
    if len(shape) == 4 and shape[-1] % tp == 0 and shape[-1] >= min_channels:
        return P(None, None, None, "model")
    if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= min_channels:
        return P("model")
    return P()


def tp_shardings(tree, mesh: Mesh, min_channels: int = 32):
    """Pytree of NamedShardings channel-sharding ``tree`` over ``model``."""
    tp = mesh.shape["model"]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _tp_leaf_spec(x, tp, min_channels)),
        tree)


def gather_replicated(tree, mesh: Mesh):
    """All-gather every sharded leaf so each process holds full values
    (jit identity with replicated out_shardings).  Needed before host-side
    checkpoint writes when params are TP-sharded across hosts; in
    multi-process runs EVERY process must call this together (it executes
    collectives)."""
    repl = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: repl, tree)
    return jax.jit(lambda t: t, out_shardings=shardings)(tree)


def shard_params_tp(tree, mesh: Mesh, min_channels: int = 32):
    """device_put ``tree`` (TrainState / params) with TP channel sharding."""
    return jax.device_put(tree, tp_shardings(tree, mesh, min_channels))


def spatial_folded_train_ok(bundle, mesh: Mesh) -> bool:
    """True when the folded train step can run its fused Pallas kernels
    per shard via shard_map on this mesh: halo exchange + psum'd stats
    in forward AND backward (models/fast_path_spatial.py) — the flagship
    multi_adain, ccam (extra state is just the registered scale params),
    and sel_multi_adain (train-mode BatchNorm batch stats psum over the
    mesh; running-stat updates return replicated).  mst stays on the XLA
    path (graph-cut host callback can't shard spatially).  Needs
    replicated params (no ``model``/TP axis); any other folded
    configuration on a >1-device mesh falls back to the XLA ring conv
    (Mosaic custom calls carry no SPMD partitioning rule)."""
    spatial = dict(mesh.shape).get("spatial", 1)
    return (bundle.network in ("multi_adain", "ccam", "sel_multi_adain")
            and bundle.folded_infer()
            and bool(bundle.cfg.get("folded_train_pallas", False))
            and "model" not in mesh.axis_names
            # three VGG pools + >= 2 relu4_1 rows per spatial shard
            and bundle.cfg.img_size % (16 * spatial) == 0)


def make_sharded_train_step(bundle, tx, mesh: Mesh, spatial: bool = False,
                            with_labels: bool = False, state_sharding=None):
    """Data/spatial/tensor-parallel version of ``train.step.make_train_step``.

    For TP, pass ``state_sharding=tp_shardings(state, mesh)`` (requires a
    ``model`` mesh axis): trainable params and their optimizer moments
    live channel-sharded (see ``_tp_leaf_spec``); the train step consumes
    and produces them sharded, so weight memory and the update math scale
    1/tp per device.

    When ``spatial_folded_train_ok`` holds, the loss+grads run as ONE
    shard_map with per-shard fused Pallas kernels (fwd + custom-VJP bwd,
    adjoint halo rows over ppermute) instead of GSPMD of the XLA path."""
    repl = NamedSharding(mesh, P())
    state_shard = repl if state_sharding is None else state_sharding
    img_spec = (P("data", "spatial")
                if spatial and "spatial" in mesh.axis_names else P("data"))
    data = NamedSharding(mesh, img_spec)
    use_spatial_pallas = (not with_labels
                         and spatial_folded_train_ok(bundle, mesh))

    import optax
    from ..ops.engine import gspmd_trace
    n_mesh_dev = int(mesh.devices.size)

    def step_fn(state, vgg_vars, content, style, content_label=None):
        # mark the trace so engine gates (flash attention, folded conv,
        # q8 loss targets) never auto-select Mosaic kernels inside this
        # GSPMD program; the spatial shard_map branch below calls its
        # per-shard Pallas kernels directly and is unaffected
        with gspmd_trace(n_mesh_dev):
            return _step_fn_body(state, vgg_vars, content, style,
                                 content_label)

    def _step_fn_body(state, vgg_vars, content, style, content_label=None):
        if use_spatial_pallas:
            from ..models import fast_path_spatial as fps
            cfg = bundle.cfg
            muts = {}
            if bundle.network == "ccam":
                _, parts, grads = fps.loss_and_grads_ccam_folded_spatial(
                    state.params, vgg_vars["params"], content, style,
                    mesh, stylized_layers=cfg.stylized_layers,
                    content_weight=cfg.content_weight,
                    style_weight=cfg.style_weight,
                    dtype=bundle._folded_dtype())
            elif bundle.network == "sel_multi_adain":
                _, parts, grads, muts = \
                    fps.loss_and_grads_sel_folded_spatial(
                        state.params, state.extra["batch_stats"],
                        vgg_vars["params"], content, style, mesh,
                        content_weight=cfg.content_weight,
                        style_weight=cfg.style_weight,
                        dtype=bundle._folded_dtype())
            else:
                _, parts, grads = \
                    fps.loss_and_grads_multi_adain_folded_spatial(
                        state.params, vgg_vars["params"], content, style,
                        mesh, content_weight=cfg.content_weight,
                        style_weight=cfg.style_weight,
                        dtype=bundle._folded_dtype())
        else:
            def loss_fn(params, extra, c, s, lab):
                total, (parts, muts) = bundle.loss(
                    {"params": params, **extra}, vgg_vars, c, s,
                    train=True, content_label=lab)
                return total, (parts, muts)

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            accum = int(bundle.cfg.get("grad_accum", 1))
            if accum > 1:
                # microbatches split on the batch axis keep the data
                # sharding: each scan step is a smaller GSPMD program
                # over the same mesh (train/step.py::_accumulate_grads)
                from ..train.step import _accumulate_grads
                _, parts, muts, grads = _accumulate_grads(
                    grad_fn, state, accum, content, style, content_label)
            else:
                (_, (parts, muts)), grads = grad_fn(
                    state.params, state.extra, content, style,
                    content_label)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = dict(state.extra)
        extra.update(muts)
        new_state = state.replace(step=state.step + 1, params=params,
                                  extra=extra, opt_state=opt_state)
        return new_state, parts

    if with_labels:
        # labels shard like the batch on the data axis (N, H, W)
        label_spec = (P("data", "spatial") if spatial
                      and "spatial" in mesh.axis_names else P("data"))
        return jax.jit(step_fn,
                       in_shardings=(state_shard, repl, data, data,
                                     NamedSharding(mesh, label_spec)),
                       out_shardings=(state_shard, repl),
                       donate_argnums=(0,))
    return jax.jit(lambda state, vgg_vars, c, s: step_fn(state, vgg_vars, c, s),
                   in_shardings=(state_shard, repl, data, data),
                   out_shardings=(state_shard, repl),
                   donate_argnums=(0,))
