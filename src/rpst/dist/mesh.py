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
  * parameters and optimizer state replicated (these models are tiny;
    activations dominate — SURVEY §5 "long-context" note);
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


def make_sharded_train_step(bundle, tx, mesh: Mesh, spatial: bool = False,
                            with_labels: bool = False):
    """Data/spatial-parallel version of ``train.step.make_train_step``."""
    repl = NamedSharding(mesh, P())
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
                       in_shardings=(repl, repl, data, data,
                                     NamedSharding(mesh, label_spec)),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,))
    return jax.jit(lambda state, vgg_vars, c, s: step_fn(state, vgg_vars, c, s),
                   in_shardings=(repl, repl, data, data),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))
