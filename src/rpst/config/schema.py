"""Typed configuration, drop-in compatible with the reference YAML files.

The reference loads flat untyped YAML (``train.py:70-71`` in the reference)
and indexes it by string key with no defaults, so configs missing a key
crash at use time (e.g. ``opt['use_mask']``).  Here every key consumed
anywhere in the reference drivers/models gets a typed default, so all 36
``config/rl|v100/*.yaml`` files load verbatim, and missing keys degrade to
the behavior the reference exhibits on its *runnable* configs.

Key inventory (reference consumption sites):
  network                train.py:94-125 registry dispatch
  rp_blocks/hidden_dim   adain_rp.py:46-62 RP stack construction
  enc_stack_way          adain_rp.py:152-168 deeper/constant stacks
  inception_num          adain_rp.py:154 (1x1 conv stacks inside blocks)
  attention              adain_rp.py:165 -> base.py:177-184 (se/sk/none)
  shuffle/shuffle_layers adain_rp.py:147-148, 304-311 channel shuffle
  sort                   adain_rp.py:149, 230-249 attention-weight sort
  stylized_layers        adain_rp.py:151, 409, 443, 497 fusion depth
  ld_layer_num           adain_rp.py:496 dual-branch layer count
  k                      mrf_rp.py:74 top-k affinity
  ndf / spade_norm       spade_rp.py:183 decoder width / norm type
  ada_module             sanet.py:292 ('aea' | 'relu')
  start_iter/img_size    sanet.py:197, 279-292 (SANet builds HW-sized MLPs)
  lr/lr_decay            train.py:57-61 lr = lr / (1 + lr_decay * step)
  content_weight/style_weight/mrf_weight/l_identity{1,2}_weight  loss mixing
  use_mask               model.test(...) segment-masked AdaIN switch
  resume/checkpoint_path adain_rp.py:178-185, wct_rp.py:67-72
  class_num/seg_hidden_dim  seg_adain_rp.py:32
  test_dataset/test_dir/content_dir/style_dir/output/num_workers  data/driver
  max_iter/batch_size/test_iter/log_iter/snapshot_save_iter       driver cadence
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

# Defaults cover every key the reference reads anywhere; values chosen so
# each reference YAML behaves identically to how it behaves in the
# reference (keys the reference YAMLs always set are just passthrough).
DEFAULTS: Dict[str, Any] = {
    # --- logging cadence ---
    "snapshot_save_iter": 10000,
    "image_save_iter": 1,
    "log_iter": 1,
    "test_iter": 10000,
    # capture a jax.profiler device trace spanning ``profile_steps``
    # steps starting at iteration ``profile_iter`` (0 = off); written to
    # <output>/logs/trace for TensorBoard/xprof (SURVEY §5: the
    # reference's only observability is wall-clock prints)
    "profile_iter": 0,
    "profile_steps": 3,
    # --- optimization ---
    "max_iter": 1_000_000,
    "batch_size": 1,
    "lr": 1e-4,
    "lr_decay": 0.0,  # TrainConfig.yaml has no lr_decay; 0 keeps lr constant
    "content_weight": 1.0,
    "style_weight": 1.0,
    "mrf_weight": 0.0,
    "l_identity1_weight": 50.0,
    "l_identity2_weight": 1.0,
    # dead keys in the reference (never consumed by its train.py) — parsed,
    # kept for YAML compat, unused: weight_decay, beta1, beta2, init,
    # lr_policy, step_size, gamma.
    "weight_decay": 0.0,
    "beta1": 0.9,
    "beta2": 0.999,
    "init": "torch",
    "lr_policy": "step",
    "step_size": 10000,
    "gamma": 0.5,
    # --- model ---
    "network": "multi_adain",
    "vgg": "",  # path to vgg weights (torch .pth or converted .npz); "" = random init
    "rp_blocks": 5,
    "in_dim": 3,
    "hidden_dim": 32,
    "inception_num": 0,
    "enc_stack_way": "constant",
    "attention": "none",
    "shuffle": False,
    "shuffle_layers": 1,
    "sort": False,
    "stylized_layers": None,  # None -> rp_blocks (fuse at every scale)
    "ld_layer_num": None,  # None -> rp_blocks
    "k": 5,
    "fusion_block": 5,
    "spade_block": 5,
    "spade": True,
    "spade_norm": "instance",
    "ndf": 2,
    "ada_module": "aea",
    "start_iter": 0,
    # --- segmentation ---
    "class_num": 19,
    "seg_hidden_dim": 32,
    # weight on the segmentation CE loss for network=seg_adain.  The
    # reference wrote but commented out this path (seg_adain_rp.py:87-96);
    # here it is runnable end-to-end: a label-bearing dataset (seg_dir,
    # Cityscapes side-by-side layout) feeds content_label into the loss.
    "seg_loss_weight": 1.0,
    # --- data ---
    "num_workers": 8,
    "img_size": 512,
    "content_dir": "",
    "style_dir": "",
    "test_dir": "",
    "seg_dir": "",
    "output": "output/run",
    "checkpoint_path": "",
    "resume": False,
    "use_mask": False,
    "test_dataset": "paired",
    # --- rpst-only extensions (not present in reference YAMLs) ---
    "seed": 0,
    "compute_dtype": "float32",  # 'float32' | 'bfloat16' for conv compute
    "mesh_shape": None,  # e.g. {'data': 8}; None = single device
    # --- multi-host (one process per host of a slice; SURVEY §2.4
    # "per-host input feeding") ---
    "distributed": False,  # call jax.distributed.initialize() before use
    "coordinator_address": "",  # "" = auto-detect (TPU pod metadata)
    "num_processes": -1,  # -1 = auto-detect
    "process_id": -1,  # -1 = auto-detect
    "wct_dtype": "float32",  # reference uses float64 on GPU; TPU default f32
    "wct_method": "closed-form",  # 'closed-form' (Lu, reference default) | 'original' (Li)
    "n_clusters": 3,  # MST k-means cluster count (utils/mst.py:129)
    "mst_lambda": 0.0,  # MST pairwise Potts weight (reference lam=0, adain_rp.py:434)
    "max_seg_labels": 64,  # static label universe for masked AdaIN
    "remat": False,  # rematerialize forward on backward (activation memory)
    # microbatch count for gradient accumulation: the per-step batch is
    # split into this many equal chunks run sequentially (lax.scan),
    # gradients averaged, ONE optimizer update — effective-batch scaling
    # past the activation-memory wall without remat's recompute cost
    # (train/step.py::make_train_step)
    "grad_accum": 1,
    "train_q8_targets": False,  # int8 no-grad VGG loss targets (folded
    #   families; calibrated on the first batch — models/__init__.py)
    # 'standard' | 'folded': folded = space-to-depth execution of the RP
    # conv stacks (exact, ~4x less HBM traffic at hidden_dim<=32; only for
    # plain multi_adain constant stacks — see rpst.models.fast_path)
    "exec_strategy": "standard",
    # 0 = dense (HW, HW) MRF affinity; >0 = streamed row chunks of that
    # size (O(chunk*HW) memory — for >512px inputs)
    "mrf_chunk": 0,
    # route the folded TRAINING forward/backward through the fused Pallas
    # conv kernel pair (custom VJP) instead of the XLA ring path.
    # Measured (512px, v5e): wins at every batch — b1 28.4->31.7,
    # b4 36.8->42.0, b8 60.1->60.6 img/s — so it defaults on.
    "folded_train_pallas": True,
    # folded INFERENCE conv execution: 'auto' = the measured per-shape
    # winner between the fused Pallas kernel and the XLA ring path
    # (fast_path._conv_lrelu); False forces XLA — required under a
    # >1-device mesh, where Mosaic custom calls can't SPMD-partition
    # (serve.py sets this when --mesh spans several devices)
    "folded_infer_pallas": "auto",
    # dynamic_sanet adaptive-attention execution: 'never' = dense
    # (HWc, HWs) parity path, 'always' = streamed blockwise path
    # (O(HW·C) memory — required beyond 512px), 'auto' = blockwise on
    # TPU for HW >= 1024 rows (see rpst.ops.adaptive_attention)
    "adaptive_blockwise": "auto",
}


@dataclasses.dataclass
class Config:
    """Validated view over a flat config dict (attribute + item access)."""

    _raw: Dict[str, Any]

    def __getitem__(self, key: str) -> Any:
        return self._raw[key]

    def __contains__(self, key: str) -> bool:
        return key in self._raw

    def get(self, key: str, default: Any = None) -> Any:
        return self._raw.get(key, default)

    def __getattr__(self, key: str) -> Any:
        raw = object.__getattribute__(self, "_raw")
        if key in raw:
            return raw[key]
        raise AttributeError(key)

    def as_dict(self) -> Dict[str, Any]:
        return dict(self._raw)

    def replace(self, **kwargs: Any) -> "Config":
        new = dict(self._raw)
        new.update(kwargs)
        return Config(new)


_VALID_NETWORKS = (
    "src", "adain", "multi_adain", "sel_multi_adain", "wct", "ccam", "mst",
    "ld_adain", "ld_adain2", "ld_adain3", "ld_adain4", "ld_adain5",
    "dynamic_sanet", "sanet", "mrf", "spade", "seg_adain",
)


def _validate(cfg: Dict[str, Any]) -> None:
    if cfg["network"] not in _VALID_NETWORKS:
        raise ValueError(
            f"unknown network {cfg['network']!r}; expected one of {_VALID_NETWORKS}")
    if cfg["rp_blocks"] < 2:
        # reference asserts rp_blocks - 2 >= 0 (adain_rp.py:46)
        raise ValueError("rp_blocks must be >= 2")
    if cfg["enc_stack_way"] not in ("deeper", "constant", "adain", "NONE",
                                    "shallower", "dec_shallower"):
        raise ValueError(f"unknown enc_stack_way {cfg['enc_stack_way']!r}")
    if cfg["ada_module"] not in ("aea", "relu"):
        raise ValueError(f"unknown ada_module {cfg['ada_module']!r}")
    if cfg["adaptive_blockwise"] not in ("auto", "always", "never"):
        raise ValueError(
            f"unknown adaptive_blockwise {cfg['adaptive_blockwise']!r}")
    if cfg["attention"] not in ("none", "se", "sk", False, None):
        raise ValueError(f"unknown attention {cfg['attention']!r}")


def load_config(path_or_dict, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a config from a YAML path (reference format) or a dict.

    Unknown keys are preserved (the reference ignores extra keys too);
    missing keys take DEFAULTS. ``stylized_layers``/``ld_layer_num`` default
    to ``rp_blocks`` when unset, matching the only runnable reference
    configurations.
    """
    if isinstance(path_or_dict, (str, Path)):
        with open(path_or_dict) as f:
            user = yaml.safe_load(f) or {}
    else:
        user = dict(path_or_dict)

    cfg = dict(DEFAULTS)
    cfg.update({k: v for k, v in user.items() if v is not None})
    if overrides:
        cfg.update(overrides)

    if cfg["stylized_layers"] is None:
        cfg["stylized_layers"] = cfg["rp_blocks"]
    if cfg["ld_layer_num"] is None:
        cfg["ld_layer_num"] = cfg["rp_blocks"]
    if cfg["attention"] in (False, None):
        cfg["attention"] = "none"

    _validate(cfg)
    return Config(cfg)
