"""Device-resident cache of perceptual-loss targets.

The reference's training loop (train.py:177-231 with the loss assembled in
adain_rp.py:321-345) re-encodes BOTH loss-target images through the frozen
VGG on every iteration: the style image only to take per-scale (mean, std)
pairs, the content image only to take its relu4_1 feature map.  Neither
depends on trainable parameters, and over a 160k-iteration run each image
is revisited ~epochs times with identical preprocessing (resize-only,
datasets/base.py) — so the target pass is recomputed work on every epoch
after the first.

This cache stores per-image targets IN HBM and gathers them by slot index
inside the jitted train step:

  * style entry:  4 stage (mean, std) pairs  — (64+128+256+512)*2 f32
                  = 7.7 KB/image (a style corpus of 80k images fits in
                  0.6 GB; default slots hold 8k),
  * content entry: relu4_1 (H/8, W/8, 512) bf16 = 4.2 MB/image @512px
                  (slots are the HBM knob: 256 slots = 1.1 GB).

Steady state (all batch keys cached) the step launches ONE VGG loss sweep
— the gradient-carrying stylized pass — and two index gathers; no
host<->device target traffic at all (the cache never leaves the device,
which also makes it immune to slow PCIe/tunnel links).  Any miss falls
back to the exact uncached computation for the whole batch (one fixed
shape -> one compiled program) plus a cheap donated scatter, so a
cold/thrashing cache costs ~nothing over the baseline step.

Keys are dataset indices (the loaders are deterministic: sampler index ->
path -> resize, no random augmentation), evicted LRU.  Cached values
round-trip bit-exactly (arrays are stored in the dtypes the loss consumes:
f32 stats, folded-dtype relu4), so loss and gradients equal the recompute
path to the last bit — pinned in tests/test_target_cache.py.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

STAGE_CHANNELS = (64, 128, 256, 512)


@jax.jit
def _gather(cache, idx):
    return jax.tree.map(lambda a: a[idx], cache)


@partial(jax.jit, donate_argnums=(0,))
def _scatter(cache, idx, vals):
    return jax.tree.map(lambda a, v: a.at[idx].set(v.astype(a.dtype)),
                        cache, vals)


class DeviceTargetCache:
    """LRU slot cache for folded-family perceptual-loss targets."""

    def __init__(self, img_size: int, dtype: Any = jnp.bfloat16,
                 content_slots: int = 256, style_slots: int = 8192):
        assert img_size % 8 == 0, "folded targets need img_size % 8 == 0"
        h8 = img_size // 8
        self.dtype = dtype
        self.content_slots = int(content_slots)
        self.style_slots = int(style_slots)
        self._c_cache = jnp.zeros((self.content_slots, h8, h8, 512), dtype)
        self._s_cache = {
            "m": [jnp.zeros((self.style_slots, c), jnp.float32)
                  for c in STAGE_CHANNELS],
            "s": [jnp.zeros((self.style_slots, c), jnp.float32)
                  for c in STAGE_CHANNELS]}
        self._c_map: "OrderedDict[Any, int]" = OrderedDict()
        self._s_map: "OrderedDict[Any, int]" = OrderedDict()
        self.hit_steps = 0
        self.miss_steps = 0
        self._compute = jax.jit(self._compute_impl)

    def _compute_impl(self, vgg_vars, sc):
        from ..nn.vgg_folded import vgg_perceptual_stats
        return vgg_perceptual_stats(vgg_vars, sc, self.dtype)

    # -- host-side slot bookkeeping ------------------------------------
    @staticmethod
    def _touch(lru: OrderedDict, key) -> int:
        lru.move_to_end(key)
        return lru[key]

    @staticmethod
    def _assign(lru: OrderedDict, key, capacity: int) -> int:
        if key in lru:
            lru.move_to_end(key)
            return lru[key]
        if len(lru) < capacity:
            slot = len(lru)
        else:
            _, slot = lru.popitem(last=False)  # evict LRU, reuse its slot
        lru[key] = slot
        return slot

    # ------------------------------------------------------------------
    def targets_for_batch(self, vgg_vars, style, content,
                          s_keys: Sequence, c_keys: Sequence
                          ) -> Tuple[List[Tuple[jnp.ndarray, jnp.ndarray]],
                                     jnp.ndarray]:
        """(t_stats, t_relu4) for this batch — gathered from cache when
        every key hits, else recomputed for the whole batch (exact
        baseline cost) and inserted."""
        if (all(k in self._s_map for k in s_keys)
                and all(k in self._c_map for k in c_keys)):
            self.hit_steps += 1
            s_idx = jnp.asarray([self._touch(self._s_map, k)
                                 for k in s_keys], jnp.int32)
            c_idx = jnp.asarray([self._touch(self._c_map, k)
                                 for k in c_keys], jnp.int32)
            sv = _gather(self._s_cache, s_idx)
            t_relu4 = _gather(self._c_cache, c_idx)
            return list(zip(sv["m"], sv["s"])), t_relu4

        self.miss_steps += 1
        n = style.shape[0]
        sc = jax.lax.stop_gradient(jnp.concatenate([style, content], 0))
        stats, relu4 = self._compute(vgg_vars, sc)
        t_stats = [(m[:n], s[:n]) for m, s in stats]
        t_relu4 = relu4[n:]
        s_idx = jnp.asarray([self._assign(self._s_map, k, self.style_slots)
                             for k in s_keys], jnp.int32)
        c_idx = jnp.asarray([self._assign(self._c_map, k, self.content_slots)
                             for k in c_keys], jnp.int32)
        self._s_cache = _scatter(
            self._s_cache, s_idx,
            {"m": [m for m, _ in t_stats], "s": [s for _, s in t_stats]})
        self._c_cache = _scatter(self._c_cache, c_idx, t_relu4)
        return t_stats, t_relu4

    def stats(self) -> Dict[str, int]:
        return {"hit_steps": self.hit_steps, "miss_steps": self.miss_steps,
                "content_cached": len(self._c_map),
                "style_cached": len(self._s_map)}
