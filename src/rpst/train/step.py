"""Jitted training step: grad + Adam + the reference lr schedule.

The reference optimizes with ``torch.optim.Adam(params, lr)`` at default
betas (ignoring its own config's beta1/beta2 — train.py:172) and rescales
the lr before every step to ``lr / (1 + lr_decay * i)`` with ``i`` starting
at 1 (train.py:57-61, 182).  Reproduced exactly with an optax schedule.

Everything (loss, grads, optimizer, batch-stat updates) happens inside one
``jit``; VGG parameters enter as arguments so the compiled step is
constant-free and reusable across weight sets.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import ModelBundle


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    extra: Any  # non-trainable collections (batch_stats), possibly {}
    opt_state: Any
    rng: jnp.ndarray


def reference_lr_schedule(lr: float, lr_decay: float):
    """lr / (1 + decay * i), i = 1-based step count (train.py:57-61)."""
    def schedule(count):
        return lr / (1.0 + lr_decay * (count + 1.0))
    return schedule


def make_optimizer(cfg, freeze_prefixes: Tuple[str, ...] = ()):
    tx = optax.adam(reference_lr_schedule(cfg.lr, cfg.lr_decay))
    if freeze_prefixes:
        # WCT resume freezes the encoder loaded from an AdaIN checkpoint
        # (wct_rp.py:67-72): route frozen subtrees to zero updates.
        def label_fn(params):
            def label(path, _):
                top = path[0].key if hasattr(path[0], "key") else str(path[0])
                return "frozen" if top in freeze_prefixes else "train"
            return jax.tree_util.tree_map_with_path(label, params)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn)
    return tx


def create_train_state(bundle: ModelBundle, rng, sample_content, sample_style,
                       vgg_vars, freeze_prefixes: Tuple[str, ...] = ()):
    init_rng, state_rng = jax.random.split(rng)
    variables = bundle.init(init_rng, sample_content, sample_style, vgg_vars)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(bundle.cfg, freeze_prefixes)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      extra=extra, opt_state=tx.init(params),
                      rng=state_rng), tx


def _accumulate_grads(grad_fn, state, accum: int, content, style,
                      content_label=None):
    """Gradient accumulation: split the batch into ``accum`` equal
    microbatches, run them sequentially under ``lax.scan`` (one live
    microbatch of activations at a time — effective-batch scaling past
    the activation-memory wall), average losses and gradients, and
    thread mutable collections (BN stats) through the scan carry so
    running statistics update exactly as ``accum`` sequential steps
    would.  The averaged gradient equals the full-batch gradient because
    every loss is a batch mean over equal-sized chunks."""
    n = content.shape[0]
    assert n % accum == 0, (
        f"batch {n} not divisible by grad_accum {accum}")
    mb = n // accum
    cs = content.reshape(accum, mb, *content.shape[1:])
    ss = style.reshape(accum, mb, *style.shape[1:])
    xs = (cs, ss)
    if content_label is not None:
        xs = xs + (content_label.reshape(accum, mb,
                                         *content_label.shape[1:]),)

    def body(carry, mbatch):
        extra, gsum, psum, tsum = carry
        c, s = mbatch[0], mbatch[1]
        lab = mbatch[2] if len(mbatch) > 2 else None
        (total, (parts, muts)), grads = grad_fn(state.params, extra,
                                                c, s, lab)
        new_extra = dict(extra)
        new_extra.update(muts)
        gsum = jax.tree.map(jnp.add, gsum, grads)
        psum = {k: psum[k] + parts[k] for k in psum}
        return (new_extra, gsum, psum, tsum + total), None

    # probe one microbatch abstractly for the parts/grads structure
    shapes = jax.eval_shape(
        lambda p, e, c, s, lab: grad_fn(p, e, c, s, lab),
        state.params, state.extra, cs[0], ss[0],
        xs[2][0] if len(xs) > 2 else None)
    (_, (parts_shape, _)), grads_shape = shapes
    gsum0 = jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype),
                         grads_shape)
    psum0 = {k: jnp.zeros(v.shape, v.dtype)
             for k, v in parts_shape.items()}
    (extra, gsum, psum, tsum), _ = jax.lax.scan(
        body, (dict(state.extra), gsum0, psum0, jnp.float32(0.0)), xs)
    inv = 1.0 / accum
    grads = jax.tree.map(lambda g: g * inv, gsum)
    parts = {k: v * inv for k, v in psum.items()}
    return tsum * inv, parts, dict(extra), grads


def make_train_step(bundle: ModelBundle, tx, skip_nonfinite: bool = True,
                    with_labels: bool = False,
                    with_targets: bool = False) -> Callable:
    """Build the jitted step: (state, vgg_vars, content, style[, label]) →
    (new_state, loss_dict).

    ``with_labels`` adds a content_label argument (int NHW) for the
    segmentation-supervised path (network=seg_adain + Cityscapes data).

    ``with_targets`` adds a precomputed-loss-targets argument (the
    (t_stats, t_relu4) pytree from ``train.target_cache``), routed into
    ``ModelBundle.loss(targets=...)`` so the step skips the no-grad
    style/content VGG target pass.  Mutually exclusive with grad_accum
    (the cache keys are per-image; microbatching them is unimplemented).

    ``skip_nonfinite`` is the principled version of the reference's
    blanket per-iteration ``try/except: pass`` (train.py:179,229-231): a
    non-finite loss or gradient skips the whole update in-graph (params
    unchanged) and reports ``skipped=1`` in the loss dict instead of
    silently diverging or swallowing errors."""

    remat = bool(bundle.cfg.get("remat", False))
    accum = int(bundle.cfg.get("grad_accum", 1))
    assert not (with_targets and accum > 1), \
        "target caching and grad_accum are mutually exclusive"
    assert not (with_targets and with_labels), \
        "target caching is for the perceptual-loss families"

    def step_fn(state: TrainState, vgg_vars, content, style,
                content_label=None, targets=None):
        def loss_fn(params, extra, c, s, lab):
            total, (parts, muts) = bundle.loss(
                {"params": params, **extra}, vgg_vars, c, s,
                train=True, content_label=lab, targets=targets)
            return total, (parts, muts)

        if remat:
            # Rematerialize the forward pass on the backward sweep: the RP
            # nets keep full 512² resolution at every layer, so activation
            # memory (not weights) is the training scaling wall (SURVEY §5)
            # — trade FLOPs for HBM.
            loss_fn = jax.checkpoint(loss_fn)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if accum > 1:
            total, parts, muts, grads = _accumulate_grads(
                grad_fn, state, accum, content, style, content_label)
        else:
            (total, (parts, muts)), grads = grad_fn(
                state.params, state.extra, content, style, content_label)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = dict(state.extra)
        extra.update(muts)
        new_state = state.replace(step=state.step + 1, params=params,
                                  extra=extra, opt_state=opt_state)
        if skip_nonfinite:
            from .fault import apply_update_if_finite
            guarded, skipped = apply_update_if_finite(
                state.replace(step=state.step + 1), new_state, total, grads)
            new_state = guarded
            parts = dict(parts)
            parts["skipped"] = skipped.astype(jnp.float32)
        return new_state, parts

    if with_labels:
        return jax.jit(step_fn, donate_argnums=(0,))
    if with_targets:
        return jax.jit(
            lambda state, vgg_vars, c, s, t: step_fn(state, vgg_vars, c, s,
                                                     targets=t),
            donate_argnums=(0,))
    return jax.jit(lambda state, vgg_vars, c, s: step_fn(state, vgg_vars, c, s),
                   donate_argnums=(0,))


def make_stylize_fn(bundle: ModelBundle) -> Callable:
    """Jitted inference fn with optional masks (static presence)."""

    @jax.jit
    def stylize(params_and_extra, vgg_vars, content, style):
        return bundle.stylize(params_and_extra, vgg_vars, content, style)

    @jax.jit
    def stylize_masked(params_and_extra, vgg_vars, content, style,
                       c_labels, s_labels):
        return bundle.stylize(params_and_extra, vgg_vars, content, style,
                              c_labels=c_labels, s_labels=s_labels)

    def fn(variables, vgg_vars, content, style, c_labels=None, s_labels=None):
        if c_labels is None:
            return stylize(variables, vgg_vars, content, style)
        return stylize_masked(variables, vgg_vars, content, style,
                              c_labels, s_labels)

    return fn
