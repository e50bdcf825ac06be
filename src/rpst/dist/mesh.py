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


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Shard NHWC image batches: N over 'data', optionally H over 'spatial'."""
    spec = (P("data", "spatial") if spatial and "spatial" in mesh.axis_names
            else P("data"))
    return jax.device_put(batch, NamedSharding(mesh, spec))


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


def shard_params_tp(tree, mesh: Mesh, min_channels: int = 32):
    """device_put ``tree`` (TrainState / params) with TP channel sharding."""
    return jax.device_put(tree, tp_shardings(tree, mesh, min_channels))


def make_sharded_train_step(bundle, tx, mesh: Mesh, spatial: bool = False,
                            with_labels: bool = False, state_sharding=None):
    """Data/spatial/tensor-parallel version of ``train.step.make_train_step``.

    For TP, pass ``state_sharding=tp_shardings(state, mesh)`` (requires a
    ``model`` mesh axis): trainable params and their optimizer moments
    live channel-sharded (see ``_tp_leaf_spec``); the train step consumes
    and produces them sharded, so weight memory and the update math scale
    1/tp per device."""
    repl = NamedSharding(mesh, P())
    state_shard = repl if state_sharding is None else state_sharding
    img_spec = (P("data", "spatial")
                if spatial and "spatial" in mesh.axis_names else P("data"))
    data = NamedSharding(mesh, img_spec)

    import optax

    def step_fn(state, vgg_vars, content, style, content_label=None):
        def loss_fn(params):
            total, (parts, muts) = bundle.loss(
                {"params": params, **state.extra}, vgg_vars, content, style,
                train=True, content_label=content_label)
            return total, (parts, muts)

        (_, (parts, muts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
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
