"""rpst — a TPU-native arbitrary style-transfer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
LuletterSoul/RP-Style-Transfer (resolution-preserving arbitrary style
transfer): RP encoder/decoder stacks, the feature-statistics transform
family (AdaIN, WCT, SANet attention, MRF patch matching, SPADE, MST
graph-cut matching), a frozen VGG-19 perceptual loss, and the training
/ evaluation drivers — re-designed TPU-first:

  * NHWC layouts and XLA-friendly static shapes throughout,
  * fused/blockwise Pallas kernels for the hot ops,
  * SPMD scaling via ``jax.sharding`` meshes (data + spatial parallel),
  * a host-side input pipeline feeding the chips.

Layer map (mirrors SURVEY.md §7):
  ops/    — L1 pure functional primitives (stats, WCT, attention, ...)
  nn/     — L2a flax building blocks (conv blocks, RP stacks, VGG-19)
  models/ — L2b one module per style-transfer method
  data/   — L3 host input pipeline
  train/  — L4 train/eval loops, checkpointing, metrics
  dist/   — device meshes and shardings
  config/ — typed config, drop-in compatible with the reference YAMLs
"""

__version__ = "0.1.0"
