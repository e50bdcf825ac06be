"""Model registry: one entry per reference network name.

The reference dispatches on ``opt['network']`` through a 16-way if/elif
(``train.py:94-125``); here a table.  Unlike the reference's accidental
class shadowing (``network/__init__.py`` star-import order makes
``seg_adain_rp.AdaINRPNet`` temporarily shadow the real one — SURVEY §2.3),
exports are explicit.

Each entry builds a :class:`ModelBundle` exposing a uniform functional
surface for the drivers:
  * ``init(rng, content, style)``            → variables
  * ``loss(variables, vgg_vars, c, s, rngs)`` → (total, (loss_dict, muts))
  * ``stylize(variables, vgg_vars, c, s, ...)`` → image  (the reference's
    ``network.test`` path, with masks when the method supports them)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..nn.vgg import VGG19Encoder
from .adain_rp import AdaINRP, CCAMRP, MSTRP, MultiScaleAdaINRP, SELastRP
from .base import perceptual_rp_losses
from .ld_adain import LDAdaINRP
from .mrf_rp import MRFRP
from .sanet import SAModel
from .seg_adain import SegAdaINRP
from .spade_rp import SpadeRP
from .src_adain import SourceNet
from .wct_rp import WCTRP

__all__ = ["build_model", "ModelBundle", "AdaINRP", "MultiScaleAdaINRP",
           "CCAMRP", "SELastRP", "MSTRP", "LDAdaINRP", "WCTRP", "MRFRP",
           "SpadeRP", "SourceNet", "SAModel", "SegAdaINRP"]

# networks whose stylize() consumes VGG feature lists instead of images
_FEAT_MODELS = ("src", "sanet", "dynamic_sanet")
# networks that accept test-time extras (masks / shuffle)
_TEST_MODE_MODELS = ("multi_adain", "sel_multi_adain", "ccam", "mst",
                     "ld_adain", "ld_adain2", "ld_adain3", "ld_adain4",
                     "ld_adain5")


@dataclasses.dataclass
class ModelBundle:
    network: str
    model: Any
    vgg: VGG19Encoder
    vgg_stages: int
    cfg: Config
    # activation scales for int8 no-grad VGG loss targets
    # (``train_q8_targets``; set by train.py after calibrating on the
    # first batch — fast_path_q8.calibrate_vgg_targets_q8)
    q8_target_scales: Optional[Dict[str, Any]] = None

    # ------------------------------------------------------------------
    def folded_exec(self) -> bool:
        """True when cfg asks for (and the model supports) folded
        space-to-depth execution: plain multi_adain constant stacks —
        exact same params/outputs, ~4x less HBM traffic (fast_path.py)."""
        c = self.cfg
        return (c.get("exec_strategy", "standard") == "folded"
                and self.network == "multi_adain"
                and self._folded_stack_ok())

    def _folded_stack_ok(self) -> bool:
        c = self.cfg
        return (c.enc_stack_way != "deeper"
                and c.inception_num == 0 and c.attention == "none"
                and not c.shuffle and not c.sort and not c.use_mask)

    def folded_infer(self) -> bool:
        """Folded execution additionally covers sel_multi_adain, ccam and
        mst (SE bottleneck — eval running stats or train batch stats —
        CCAM residuals, and the MST transform via a deepest-scale raster
        round trip all fold exactly; fast_path.py), for both stylize and
        the training loss."""
        if self.folded_exec():
            return True
        c = self.cfg
        return (c.get("exec_strategy", "standard") == "folded"
                and self.network in ("sel_multi_adain", "ccam", "mst")
                and self._folded_stack_ok())

    def q8_infer(self) -> bool:
        """Families with an int8 PTQ serving path (fast_path_q8.py):
        the folded constant-stack families, the adain/wct wide-channel
        standard-layout path, and the VGG-based families (chained-int8
        VGG encode + int8 mirror decode, attention transform bf16) —
        all on ops/pallas/conv2d_q8 or folded_conv_q8."""
        if self.network == "adain":
            return not self.cfg.use_mask
        if self.network == "wct":
            return True
        if self.network in ("sanet", "dynamic_sanet"):
            # the q8 VGG encode pools with exact 2x2/2 halving
            # (_maxpool2x_any) where the bf16 path pools ceil-mode: four
            # pools to relu5_1 need img_size % 16 == 0 (else AssertionError
            # at trace time) — odd sizes serve standard/bf16 instead
            return self.cfg.img_size % 16 == 0
        if self.network == "mrf":
            return True
        if self.network == "seg_adain":
            # SegAdaINRP's stylize forward IS AdaINRP (masks only enter
            # its optional training seg loss) — reuse the adain q8 path
            # on the nested ``adain_rp`` param subtree
            return True
        if self.network == "src":
            # three exact 2x2/2 pools to relu4_1 (see sanet note above)
            return not self.cfg.use_mask and self.cfg.img_size % 8 == 0
        if self.network == "spade":
            # int8 encoders + bf16 SPADE generator; the syncbatch variant
            # carries batch_stats the serving path doesn't thread
            return self.cfg.spade_norm == "instance"
        if self.network == "ld_adain":
            # LD v1: dual-branch layers whose width hidden*2^i hits 128
            # lanes run int8 (3x3 small via the Pallas kernel, 7x7 big
            # via XLA's int8 conv — the 2x-rate window, fast_path_q8.
            # _xla_conv_q8); require at least the deepest layer aligned
            # (its input width is hidden*2^(L-1) for L >= 2; at L == 1
            # the only layer reads the 3-channel image, never eligible).
            # The q8 pass reads only PadConv_0 from each block, so any
            # inception 1x1 stack must be absent. v3-v5 stay bf16
            # (constant-width stacks never reach 128 lanes).
            return (not self.cfg.use_mask
                    and self.cfg.inception_num == 0
                    and self.cfg.ld_layer_num >= 2
                    and (self.cfg.hidden_dim
                         * 2 ** (self.cfg.ld_layer_num - 1)) % 128 == 0)
        if self.network == "ld_adain2":
            # LD v2: same doubling widths as v1; at the aligned layers the
            # 3x3 small AND the big branch's two full-res 3x3 relu convs
            # run int8 (fast_path_q8.stylize_ld2_q8). The q8 maxpool is
            # the exact 2x2/2 form — needs an even image size (the bf16
            # path pools SAME/ceil and takes any size).
            return (not self.cfg.use_mask
                    and self.cfg.inception_num == 0
                    and self.cfg.img_size % 2 == 0
                    and self.cfg.ld_layer_num >= 2
                    and (self.cfg.hidden_dim
                         * 2 ** (self.cfg.ld_layer_num - 1)) % 128 == 0)
        # folded int8 kernels need 128-lane alignment (4*hidden_dim);
        # narrower stacks should serve folded bf16 instead
        return (self.network in ("multi_adain", "sel_multi_adain", "ccam",
                                 "mst")
                and self._folded_stack_ok()
                and (self.cfg.hidden_dim * 4) % 128 == 0)

    def q8_recommended(self, batch: Optional[int] = None) -> bool:
        """q8 paths ``--mode auto`` should pick: those measured faster
        than the family's best bf16 path on TPU v5e AT THIS BATCH —
        the measured crossover table (``rpst.policy.Q8_WIN_RANGE``,
        BASELINE.md winners per family × batch: e.g. ld_adain2 q8 loses
        at b1 and wins from b2; dynamic_sanet/src cross at b4; mst's q8
        win inverts ABOVE b3 where the folded bf16 engine wins; spade and
        ccam never win).  ``--mode q8`` still serves any q8_infer family
        explicitly."""
        from ..policy import q8_preferred
        return self.q8_infer() and q8_preferred(self.network, batch)

    def _folded_dtype(self):
        return (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                else jnp.float32)

    # ------------------------------------------------------------------
    def init(self, rng, content, style, vgg_vars):
        if self.network in _FEAT_MODELS:
            feats = self.vgg.apply(vgg_vars, content)
            sfeats = self.vgg.apply(vgg_vars, style)
            return self.model.init(rng, feats, sfeats)
        if (self.network == "seg_adain"
                and self.cfg.get("seg_loss_weight", 1.0) > 0):
            # init through the loss so the seg head's params are created
            # (flax materializes params lazily on first call)
            dummy_label = jnp.zeros(content.shape[:3], jnp.int32)
            return self.model.init(
                rng, self._vgg_features(vgg_vars), content, style,
                train=True, content_label=dummy_label,
                method=self.model.loss)
        return self.model.init(rng, content, style, train=True)

    # ------------------------------------------------------------------
    def _vgg_features(self, vgg_vars):
        return lambda x: self.vgg.apply(vgg_vars, x)

    def _mix(self, parts: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        total = (c.content_weight * parts["content_loss"]
                 + c.style_weight * parts["style_loss"])
        if "mrf_loss" in parts:
            total = total + c.mrf_weight * parts["mrf_loss"]
        if "l_identity1_loss" in parts:
            total = total + (c.l_identity1_weight * parts["l_identity1_loss"]
                             + c.l_identity2_weight * parts["l_identity2_loss"])
        if "seg_loss" in parts:
            total = total + (c.get("seg_loss_weight", 1.0)
                             * parts["seg_loss"])
        return total

    def loss(self, variables, vgg_vars, content, style,
             train: bool = True,
             content_label=None,
             targets=None) -> Tuple[jnp.ndarray, Tuple[Dict, Dict]]:
        vgg_features = self._vgg_features(vgg_vars)
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        model = self.model

        if self.network in ("mrf",) + _FEAT_MODELS or self.network == "seg_adain":
            # model-specific loss methods
            kwargs = {}
            if self.network == "seg_adain":
                kwargs["content_label"] = content_label
            out = model.apply(variables, vgg_features, content, style,
                              train=train, method=model.loss,
                              mutable=mutable, **kwargs)
            parts, muts = out if mutable else (out, {})
        elif self.folded_infer():
            # folded-domain forward (exact; differentiable — the fused
            # Pallas kernels carry a custom-VJP backward pair, gated by
            # ``folded_train_pallas``), and the perceptual loss through
            # the folded VGG path (stages 1-2 space-to-depth — same math,
            # ~half the HBM traffic of the dominant loss backward; see
            # rpst/nn/vgg_folded.py)
            from ..nn.vgg_folded import perceptual_rp_losses_folded
            from .fast_path import (stylize_ccam_folded,
                                    stylize_mst_folded,
                                    stylize_multi_adain_folded,
                                    stylize_sel_multi_adain_folded,
                                    stylize_sel_multi_adain_folded_train)
            muts = {}
            up = self.cfg.get("folded_train_pallas", False)
            if self.network == "sel_multi_adain":
                if train:
                    stylized, muts = stylize_sel_multi_adain_folded_train(
                        variables, content, style,
                        dtype=self._folded_dtype(), use_pallas=up)
                    if not mutable:
                        muts = {}
                else:
                    stylized = stylize_sel_multi_adain_folded(
                        variables, content, style,
                        dtype=self._folded_dtype(), use_pallas=up)
            elif self.network == "ccam":
                # no batch-coupled state under the folded gate; the CCAM
                # einsums and scale params differentiate directly
                stylized = stylize_ccam_folded(
                    variables, content, style,
                    stylized_layers=self.cfg.stylized_layers,
                    dtype=self._folded_dtype(), use_pallas=up)
            elif self.network == "mst":
                stylized = stylize_mst_folded(
                    variables, content, style,
                    stylized_layers=self.cfg.stylized_layers,
                    n_clusters=self.cfg.n_clusters,
                    mst_lambda=self.cfg.mst_lambda,
                    dtype=self._folded_dtype(), use_pallas=up)
            else:
                stylized = stylize_multi_adain_folded(
                    variables["params"], content, style,
                    dtype=self._folded_dtype(),
                    use_pallas=self.cfg.get("folded_train_pallas", False))
            from ..ops.engine import gspmd_devices
            from ..policy import TRAIN_Q8_TARGETS_MIN_BATCH
            if targets is not None:
                # precomputed loss targets (train/target_cache.py): the
                # step's only VGG loss sweep is the gradient-carrying
                # stylized pass
                from ..nn.vgg_folded import (
                    perceptual_rp_losses_folded_pretargets)
                t_stats, t_relu4 = targets
                parts, _ = perceptual_rp_losses_folded_pretargets(
                    vgg_vars, stylized, t_stats, t_relu4,
                    self.cfg.content_weight, self.cfg.style_weight,
                    dtype=self._folded_dtype())
            elif (self.cfg.get("train_q8_targets", False)
                    and self.q8_target_scales is not None
                    and self.cfg.img_size % 8 == 0
                    and content.shape[0] >= TRAIN_Q8_TARGETS_MIN_BATCH
                    # the chained-int8 VGG runs Mosaic kernels on TPU —
                    # never inside a >1-device GSPMD program (no SPMD
                    # partitioning rule; round-4 ADVICE item 1)
                    and gspmd_devices() <= 1):
                # no-grad style/content target forwards through the
                # chained-int8 VGG (round-4 item 2); the stylized pass —
                # the only one carrying gradients — stays folded bf16
                from ..nn.vgg_folded import perceptual_rp_losses_q8targets
                parts, _ = perceptual_rp_losses_q8targets(
                    vgg_vars, self.q8_target_scales, stylized, style,
                    content, self.cfg.content_weight,
                    self.cfg.style_weight, dtype=self._folded_dtype(),
                    interpret=jax.default_backend() == "cpu")
            else:
                parts, _ = perceptual_rp_losses_folded(
                    vgg_vars, stylized, style, content,
                    self.cfg.content_weight, self.cfg.style_weight,
                    dtype=self._folded_dtype())
        else:
            out = model.apply(variables, content, style, train=train,
                              mutable=mutable)
            stylized, muts = out if mutable else (out, {})
            parts, _ = perceptual_rp_losses(
                vgg_features, stylized, style, content,
                self.cfg.content_weight, self.cfg.style_weight)
            parts = {k: v for k, v in parts.items() if k != "total_loss"}
        total = self._mix(parts)
        parts = dict(parts)
        parts["total_loss"] = total
        return total, (parts, muts)

    # ------------------------------------------------------------------
    def stylize_with_aux(self, variables, vgg_vars, content, style):
        """Stylize and return visualization aux (adaptive-SANet claim maps;
        the reference dumps these in test(), sanet.py:334-366)."""
        if self.network == "dynamic_sanet":
            cf = self.vgg.apply(vgg_vars, content)
            sf = self.vgg.apply(vgg_vars, style)
            return self.model.apply(variables, cf, sf,
                                    method=self.model.stylize_with_aux)
        return self.stylize(variables, vgg_vars, content, style), {}

    def stylize(self, variables, vgg_vars, content, style,
                c_labels=None, s_labels=None):
        """Inference path — the reference's ``network.test``."""
        model = self.model
        if self.folded_infer() and c_labels is None:
            from .fast_path import (stylize_ccam_folded,
                                    stylize_mst_folded,
                                    stylize_multi_adain_folded,
                                    stylize_sel_multi_adain_folded)
            # 'auto' picks the measured per-shape winner on single chips;
            # serve.py forces False under a >1-device mesh (Mosaic custom
            # calls carry no SPMD partitioning rule — the XLA ring conv
            # partitions fine)
            up = self.cfg.get("folded_infer_pallas", "auto")
            if self.network == "sel_multi_adain":
                return stylize_sel_multi_adain_folded(
                    variables, content, style, dtype=self._folded_dtype(),
                    use_pallas=up)
            if self.network == "ccam":
                return stylize_ccam_folded(
                    variables, content, style,
                    stylized_layers=self.cfg.stylized_layers,
                    dtype=self._folded_dtype(), use_pallas=up)
            if self.network == "mst":
                return stylize_mst_folded(
                    variables, content, style,
                    stylized_layers=self.cfg.stylized_layers,
                    n_clusters=self.cfg.n_clusters,
                    mst_lambda=self.cfg.mst_lambda,
                    dtype=self._folded_dtype(), use_pallas=up)
            return stylize_multi_adain_folded(
                variables["params"], content, style,
                dtype=self._folded_dtype(), use_pallas=up)
        if self.network in _FEAT_MODELS:
            cf = self.vgg.apply(vgg_vars, content)
            sf = self.vgg.apply(vgg_vars, style)
            if self.network == "src":
                return model.apply(variables, cf, sf, c_labels, s_labels,
                                   True)
            return model.apply(variables, cf, sf)
        kwargs = dict(train=False)
        if self.network in _TEST_MODE_MODELS:
            kwargs.update(test_mode=True, c_labels=c_labels,
                          s_labels=s_labels)
        elif self.network in ("adain", "seg_adain"):
            kwargs.update(c_labels=c_labels, s_labels=s_labels)
        return model.apply(variables, content, style, **kwargs)


def build_model(cfg: Config) -> ModelBundle:
    n = cfg.network
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    common = dict(dtype=dtype)

    if n == "adain":
        model = AdaINRP(rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
                        **common)
    elif n == "multi_adain":
        model = MultiScaleAdaINRP(
            rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
            enc_stack_way=_stack_way(cfg), inception_num=cfg.inception_num,
            attention=cfg.attention, shuffle=bool(cfg.shuffle),
            shuffle_layers=cfg.shuffle_layers, sort=bool(cfg.sort),
            use_mask=bool(cfg.use_mask), max_seg_labels=cfg.max_seg_labels,
            **common)
    elif n == "sel_multi_adain":
        model = SELastRP(
            rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
            enc_stack_way=_stack_way(cfg), inception_num=cfg.inception_num,
            attention=cfg.attention, use_mask=bool(cfg.use_mask),
            max_seg_labels=cfg.max_seg_labels, **common)
    elif n == "ccam":
        model = CCAMRP(
            rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
            enc_stack_way=_stack_way(cfg), inception_num=cfg.inception_num,
            attention=cfg.attention, shuffle=bool(cfg.shuffle),
            shuffle_layers=cfg.shuffle_layers, sort=bool(cfg.sort),
            stylized_layers=cfg.stylized_layers,
            use_mask=bool(cfg.use_mask), max_seg_labels=cfg.max_seg_labels,
            **common)
    elif n == "mst":
        model = MSTRP(
            rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
            enc_stack_way=_stack_way(cfg), inception_num=cfg.inception_num,
            attention=cfg.attention, stylized_layers=cfg.stylized_layers,
            n_clusters=cfg.n_clusters, mst_lambda=cfg.mst_lambda,
            **common)
    elif n in ("ld_adain", "ld_adain2", "ld_adain3", "ld_adain4", "ld_adain5"):
        variant = 1 if n == "ld_adain" else int(n[-1])
        model = LDAdaINRP(
            variant=variant, layer_num=cfg.ld_layer_num,
            hidden_dim=cfg.hidden_dim, stylized_layers=cfg.stylized_layers,
            inception_num=cfg.inception_num, use_mask=bool(cfg.use_mask),
            max_seg_labels=cfg.max_seg_labels, **common)
    elif n == "wct":
        model = WCTRP(rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
                      method=cfg.wct_method, wct_dtype=cfg.wct_dtype,
                      **common)
    elif n == "mrf":
        model = MRFRP(rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
                      k=cfg.k, mrf_chunk=cfg.mrf_chunk, **common)
    elif n == "spade":
        model = SpadeRP(rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
                        ndf=cfg.ndf, spade_norm=cfg.spade_norm, **common)
    elif n == "src":
        model = SourceNet(use_mask=bool(cfg.use_mask),
                          max_seg_labels=cfg.max_seg_labels, **common)
    elif n == "sanet":
        model = SAModel(adaptive=False, img_size=cfg.img_size, **common)
    elif n == "dynamic_sanet":
        model = SAModel(adaptive=True, img_size=cfg.img_size,
                        ada_module=cfg.ada_module,
                        blockwise=cfg.get("adaptive_blockwise", "auto"),
                        **common)
    elif n == "seg_adain":
        model = SegAdaINRP(rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
                           class_num=cfg.class_num,
                           seg_hidden_dim=cfg.seg_hidden_dim,
                           seg_loss_weight=cfg.get("seg_loss_weight", 1.0),
                           **common)
    else:
        raise ValueError(f"unknown network {n!r}")

    vgg_stages = 5 if n in ("sanet", "dynamic_sanet") else 4
    vgg = VGG19Encoder(num_stages=vgg_stages, dtype=dtype)
    return ModelBundle(network=n, model=model, vgg=vgg,
                       vgg_stages=vgg_stages, cfg=cfg)


def _stack_way(cfg: Config) -> str:
    way = cfg.enc_stack_way
    # 'adain'/'NONE' appear in reference YAMLs for nets that ignore the key
    return way if way in ("deeper", "constant") else "constant"
