"""Whole-model cross-framework parity vs the ACTUAL reference code.

For every network in the registry, construct the reference torch model
(imported unmodified from /root/reference via tests/reference_oracle.py),
inject IDENTICAL weights from the rpst flax param tree, run both stylize
paths (the reference's ``network.test``) on the same inputs, and require
mean-abs-pixel-error < 1e-2 (BASELINE.md's per-method acceptance bar; in
practice the RP families agree to ~1e-5, WCT to ~1e-3 due to f32 eigh vs
f64 SVD).

Loss parity (``network.forward``'s loss dict vs ``ModelBundle.loss``) is
additionally checked for the distinct loss formulations: the RP perceptual
loss (multi_adain), SANet's identity losses, MRF's top-k affinity loss,
and SourceNet's AdaIN-target content loss.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params

from tests import reference_oracle as ro

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir("/root/reference"),
                       reason="reference checkout not available"),
]


def _setup(cfg_dict, img=16, batch=2, seed=0):
    """Build the rpst bundle + variables + a matching input pair."""
    cfg = load_config(cfg_dict)
    bundle = build_model(cfg)
    rng = np.random.default_rng(seed)
    content = rng.random((batch, img, img, 3), dtype=np.float32)
    style = rng.random((batch, img, img, 3), dtype=np.float32)
    key = jax.random.PRNGKey(seed)
    _, vgg_vars = init_vgg_params(key, num_stages=bundle.vgg_stages)
    variables = bundle.init(key, jnp.asarray(content), jnp.asarray(style),
                            vgg_vars)
    return bundle, variables, vgg_vars, content, style


def _stylize(bundle, variables, vgg_vars, content, style):
    return np.asarray(bundle.stylize(variables, vgg_vars,
                                     jnp.asarray(content),
                                     jnp.asarray(style)))


def _assert_close(got_nhwc, expected_torch, tol=1e-2, tight=1e-3):
    expected = ro.to_nhwc(expected_torch)
    mae = float(np.abs(got_nhwc - expected).mean())
    assert mae < tol, f"mean abs pixel error {mae}"
    if tight is not None:
        np.testing.assert_allclose(got_nhwc, expected, rtol=1e-2, atol=tight)


def _ms_opt(**kw):
    opt = dict(rp_blocks=3, hidden_dim=8, shuffle=False, shuffle_layers=1,
               sort=False, stylized_layers=3, enc_stack_way="constant",
               inception_num=None, attention="none", resume=False,
               use_mask=False, content_weight=1.0, style_weight=1.0)
    opt.update(kw)
    return opt


# ---------------------------------------------------------------------------
# AdaIN RP family
# ---------------------------------------------------------------------------

def test_adain_rp():
    """AdaINRPNet (adain_rp.py:15-138): shared RPSequence enc, AdaIN, dec."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="adain", rp_blocks=4, hidden_dim=8, img_size=16))
    tnet = network.AdaINRPNet(_ms_opt(rp_blocks=4), ro.fresh_vgg())
    p = variables["params"]
    ro.inject_rpseq(tnet.rp_shared_encoder, p["encoder"])
    ro.inject_rpseq(tnet.rp_decoder, p["decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


@pytest.mark.parametrize("way,inception", [("constant", 0), ("deeper", 0),
                                           ("constant", 1)])
def test_multi_adain(way, inception):
    """MultiScaleAdaINRPNet (adain_rp.py:141-345): per-scale content-side
    fusion with residual add; constant + deeper stacks; inception convs."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="multi_adain", rp_blocks=3, hidden_dim=8, img_size=16,
             enc_stack_way=way, inception_num=inception))
    tnet = network.MultiScaleAdaINRPNet(
        _ms_opt(enc_stack_way=way, inception_num=inception or None),
        ro.fresh_vgg())
    p = variables["params"]
    ro.inject_rpstack(tnet.rp_shared_encoder, p["rp_shared_encoder"])
    ro.inject_rpstack(tnet.rp_decoder, p["rp_decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


def test_multi_adain_shuffle():
    """Channel shuffle at test time, layers 0..shuffle_layers
    (adain_rp.py:255-260, 304-311)."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="multi_adain", rp_blocks=3, hidden_dim=8, img_size=16,
             shuffle=True, shuffle_layers=1))
    tnet = network.MultiScaleAdaINRPNet(
        _ms_opt(shuffle=True, shuffle_layers=1), ro.fresh_vgg())
    p = variables["params"]
    ro.inject_rpstack(tnet.rp_shared_encoder, p["rp_shared_encoder"])
    ro.inject_rpstack(tnet.rp_decoder, p["rp_decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


def test_multi_adain_se_sort():
    """SE attention blocks + attention-weight channel sort.  The reference
    reads attention maps cached on the shared encoder (adain_rp.py:240);
    the style image is encoded last, so BOTH feats sort by the style pass's
    attention — preserved quirk."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="multi_adain", rp_blocks=3, hidden_dim=16, img_size=16,
             attention="se", sort=True))
    tnet = network.MultiScaleAdaINRPNet(
        _ms_opt(hidden_dim=16, attention="se", sort=True), ro.fresh_vgg())
    tnet.eval()
    p = variables["params"]
    stats = variables["batch_stats"]
    ro.inject_rpstack(tnet.rp_shared_encoder, p["rp_shared_encoder"],
                      stats["rp_shared_encoder"])
    ro.inject_rpstack(tnet.rp_decoder, p["rp_decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


def test_ccam():
    """CrossChannelAttentionRPNet (adain_rp.py:348-422): running-fusion
    AdaIN + CCAM residual pre-block.  The reference's CCAMDec scale is
    stuck at 0 (unregistered .cuda() param); flax inits scale to 0, so the
    two match exactly at init."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="ccam", rp_blocks=3, hidden_dim=8, img_size=16))
    tnet = network.CrossChannelAttentionRPNet(_ms_opt(), ro.fresh_vgg())
    p = variables["params"]["ms"]
    ro.inject_rpstack(tnet.rp_shared_encoder, p["rp_shared_encoder"])
    ro.inject_rpstack(tnet.rp_decoder, p["rp_decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


def test_sel_multi_adain():
    """SELastMultiScaleAdaINRPNet (adain_rp.py:451-481): running-fusion,
    SE bottleneck on the last fusion, no residual add."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="sel_multi_adain", rp_blocks=3, hidden_dim=16,
             img_size=16))
    tnet = network.SELastMultiScaleAdaINRPNet(_ms_opt(hidden_dim=16),
                                              ro.fresh_vgg())
    tnet.eval()
    p = variables["params"]
    ro.inject_rpstack(tnet.rp_shared_encoder, p["ms"]["rp_shared_encoder"])
    ro.inject_rpstack(tnet.rp_decoder, p["ms"]["rp_decoder"])
    ro.inject_sebottleneck(tnet.attention_block, p["attention_block"],
                           variables["batch_stats"]["attention_block"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


class _RpstKMeans:
    """sklearn-KMeans-shaped shim running rpst's deterministic jit k-means,
    so the reference and rpst cluster identically (sklearn's k-means++ is
    randomly seeded; clustering equivalence is tested separately in
    test_ops_kmeans.py)."""

    def __init__(self, k):
        self.k = k

    def fit(self, X):
        from rpst.ops.kmeans import kmeans
        labels, centers = kmeans(jnp.asarray(np.asarray(X), jnp.float32),
                                 self.k, iters=25)
        self.labels_ = np.asarray(labels)
        self.cluster_centers_ = np.asarray(centers)


def test_mst():
    """GlobalMSTRPNet (adain_rp.py:425-448): k-means + graph-cut matched
    groupwise AdaIN at the deepest scale (lam=0 ⇒ argmin labeling), then
    the multiscale decoder.  Both sides use rpst's deterministic k-means;
    everything else (data term, labeling, groupwise-AdaIN composite,
    decode) runs the reference's own code."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="mst", rp_blocks=3, hidden_dim=8, img_size=16,
             stylized_layers=1))
    tnet = network.GlobalMSTRPNet(_ms_opt(stylized_layers=1), ro.fresh_vgg())
    tnet.mst.device = "cpu"
    tnet.mst.k_means_estimator = _RpstKMeans(3)
    p = variables["params"]["ms"]
    ro.inject_rpstack(tnet.rp_shared_encoder, p["rp_shared_encoder"])
    ro.inject_rpstack(tnet.rp_decoder, p["rp_decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


# ---------------------------------------------------------------------------
# LD (dual-branch) family
# ---------------------------------------------------------------------------

_LD_CLASSES = {1: "LDMSAdaINRPNet", 2: "LDMSAdaINRPNet2",
               3: "LDMSAdaINRPNet3", 4: "LDMSAdaINRPNet4",
               5: "LDMSAdaINRPNet5"}


@pytest.mark.parametrize("variant", [1, 2, 3, 4, 5])
def test_ld_adain(variant):
    """LDMSAdaINRPNet v1-v5 (adain_rp.py:484-858): dual small/big-RF
    branches (7x7 conv | pooled VGG-ish), single vs twin streams, additive
    vs concat decode, interpolate vs ConvTranspose upsampling."""
    network = ro.load_reference()
    name = "ld_adain" if variant == 1 else f"ld_adain{variant}"
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network=name, rp_blocks=3, hidden_dim=4, img_size=16,
             stylized_layers=3))
    tnet = getattr(network, _LD_CLASSES[variant])(
        _ms_opt(hidden_dim=4, ld_layer_num=3), ro.fresh_vgg())
    ro.inject_ld_encoders(tnet, variables["params"],
                          variables.get("batch_stats", {}), variant, 3)
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


# ---------------------------------------------------------------------------
# WCT / MRF / SPADE / SourceNet / seg_adain
# ---------------------------------------------------------------------------

def test_wct():
    """WCTRPNet (wct_rp.py): per-sample f64 SVD whiten/color in the
    reference vs batched f32 eigh here — parity to the 1e-2 pixel bar."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="wct", rp_blocks=3, hidden_dim=4, img_size=16))
    tnet = network.WCTRPNet(_ms_opt(hidden_dim=4), ro.fresh_vgg())
    p = variables["params"]
    ro.inject_rpseq(tnet.rp_shared_encoder, p["encoder"])
    ro.inject_rpseq(tnet.rp_decoder, p["decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)),
                  tight=None)


def test_mrf():
    """MRFRPNet (mrf_rp.py:25-136): twin encoders, concat fuse, decoder."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="mrf", rp_blocks=3, hidden_dim=4, img_size=16, k=3))
    tnet = network.MRFRPNet(_ms_opt(hidden_dim=4, k=3, mrf_weight=1.0),
                            ro.fresh_vgg())
    p = variables["params"]
    ro.inject_rpseq(tnet.rp_content_encoder, p["rp_content_encoder"])
    ro.inject_rpseq(tnet.rp_style_encoder, p["rp_style_encoder"])
    ro.inject_rpseq(tnet.rp_decoder, p["rp_decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


def test_spade():
    """SpadeRPNet (spade_rp.py:148-247): style features decoded
    conditioned on content features through the SPADE generator."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="spade", rp_blocks=3, hidden_dim=4, img_size=16,
             ndf=2, spade_norm="instance"))
    tnet = network.SpadeRPNet(
        dict(rp_blocks=3, hidden_dim=4, ndf=2, spade_norm="instance"),
        ro.fresh_vgg())
    p = variables["params"]
    ro.inject_rpseq(tnet.rp_content_encoder, p["rp_content_encoder"])
    ro.inject_rpseq(tnet.rp_style_encoder, p["rp_style_encoder"])
    ro.inject_spade_decoder(tnet.rp_decoder, p["rp_decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


def test_src():
    """SourceNet (base.py:562-649): frozen VGG + VGG-mirror decoder."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="src", img_size=32), img=32, batch=1)
    tvgg = ro.fresh_vgg()
    ro.inject_vgg(tvgg, vgg_vars["params"], num_stages=4)
    tnet = network.SourceNet(dict(use_mask=False, content_weight=1.0,
                                  style_weight=1.0), tvgg)
    ro.inject_mirror_decoder(tnet.decoder, variables["params"]["decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


def test_seg_adain():
    """seg_adain_rp.AdaINRPNet's test path (seg_adain_rp.py:124-131).
    The reference class crashes on its commented-out class_weights
    (SURVEY §2.3); constructing it requires patching the attribute —
    the runnable intent is the plain shared-encoder AdaIN path."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="seg_adain", rp_blocks=3, hidden_dim=4, img_size=16))
    network.seg_adain_rp.AdaINRPNet.class_weights = None
    tnet = network.seg_adain_rp.AdaINRPNet(
        dict(rp_blocks=3, hidden_dim=4), ro.fresh_vgg())
    p = variables["params"]["adain_rp"]
    ro.inject_rpseq(tnet.rp_shared_encoder, p["encoder"])
    ro.inject_rpseq(tnet.rp_decoder, p["decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


# ---------------------------------------------------------------------------
# SANet family
# ---------------------------------------------------------------------------

def test_sanet():
    """SAModel (sanet.py:196-275): 5-stage VGG, twin SANets at relu4_1 +
    relu5_1 merged by a 3x3 conv, VGG-mirror decoder."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="sanet", img_size=32), img=32, batch=1)
    tvgg = ro.fresh_vgg()
    ro.inject_vgg(tvgg, vgg_vars["params"], num_stages=5)
    tnet = network.SAModel(dict(content_weight=1.0, style_weight=3.0,
                                l_identity1_weight=50.0,
                                l_identity2_weight=1.0), tvgg, 0, 32)
    p = variables["params"]
    ro.inject_transform(tnet.transform, p["transform"])
    ro.inject_mirror_decoder(tnet.decoder, p["decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


@pytest.mark.parametrize("ada_module", ["aea", "relu"])
def test_dynamic_sanet(ada_module, tmp_path):
    """AdaptiveSAModel (sanet.py:278-423): AEA/AEALRelu learned attention
    thresholds over the content-style affinity."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="dynamic_sanet", img_size=64, ada_module=ada_module),
        img=64, batch=1)
    tvgg = ro.fresh_vgg()
    ro.inject_vgg(tvgg, vgg_vars["params"], num_stages=5)
    tnet = network.AdaptiveSAModel(
        dict(content_weight=1.0, style_weight=3.0, l_identity1_weight=50.0,
             l_identity2_weight=1.0, ada_module=ada_module,
             output=str(tmp_path)), tvgg, 0, 64)
    p = variables["params"]
    ro.inject_transform(tnet.transform, p["transform"])
    ro.inject_mirror_decoder(tnet.decoder, p["decoder"])
    got = _stylize(bundle, variables, vgg_vars, c, s)
    _assert_close(got, tnet.test(ro.to_torch(c), ro.to_torch(s)))


# ---------------------------------------------------------------------------
# loss parity — the distinct loss formulations
# ---------------------------------------------------------------------------

def _loss_dict(bundle, variables, vgg_vars, c, s):
    total, (parts, _) = bundle.loss(variables, vgg_vars, jnp.asarray(c),
                                    jnp.asarray(s), train=False)
    return {k: float(v) for k, v in parts.items()}


def _torch_loss_dict(tnet, c, s):
    with torch.no_grad():
        loss_dict, total = tnet(ro.to_torch(c), ro.to_torch(s))
    return {k: float(v) for k, v in loss_dict.items()}


def _assert_losses(got, expected, rtol=2e-3):
    for k, v in expected.items():
        assert k in got, f"missing loss component {k}"
        np.testing.assert_allclose(got[k], v, rtol=rtol, atol=1e-5,
                                   err_msg=k)


def test_multi_adain_loss_parity():
    """Style-stats + relu4_1 content loss (adain_rp.py:321-345) with the
    same injected VGG on both sides."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="multi_adain", rp_blocks=3, hidden_dim=8, img_size=32,
             content_weight=1.0, style_weight=3.0), img=32, batch=1)
    tvgg = ro.fresh_vgg()
    ro.inject_vgg(tvgg, vgg_vars["params"], num_stages=4)
    tnet = network.MultiScaleAdaINRPNet(_ms_opt(style_weight=3.0), tvgg)
    p = variables["params"]
    ro.inject_rpstack(tnet.rp_shared_encoder, p["rp_shared_encoder"])
    ro.inject_rpstack(tnet.rp_decoder, p["rp_decoder"])
    _assert_losses(_loss_dict(bundle, variables, vgg_vars, c, s),
                   _torch_loss_dict(tnet, c, s))


def test_src_loss_parity():
    """SourceNet's AdaIN-target content loss (base.py:629-649)."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="src", img_size=32, content_weight=1.0,
             style_weight=2.0), img=32, batch=1)
    tvgg = ro.fresh_vgg()
    ro.inject_vgg(tvgg, vgg_vars["params"], num_stages=4)
    tnet = network.SourceNet(dict(use_mask=False, content_weight=1.0,
                                  style_weight=2.0), tvgg)
    ro.inject_mirror_decoder(tnet.decoder, variables["params"]["decoder"])
    _assert_losses(_loss_dict(bundle, variables, vgg_vars, c, s),
                   _torch_loss_dict(tnet, c, s))


def test_mrf_loss_parity():
    """MRF top-k affinity loss + cycle losses (mrf_rp.py:109-136), N=1
    (the reference's view(C,-1) scrambles batches for N>1 — fixed here
    via vmap, so parity is defined at N=1)."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="mrf", rp_blocks=3, hidden_dim=4, img_size=32, k=3,
             content_weight=1.0, style_weight=1.0, mrf_weight=1.0),
        img=32, batch=1)
    tvgg = ro.fresh_vgg()
    ro.inject_vgg(tvgg, vgg_vars["params"], num_stages=4)
    tnet = network.MRFRPNet(_ms_opt(hidden_dim=4, k=3, mrf_weight=1.0), tvgg)
    p = variables["params"]
    ro.inject_rpseq(tnet.rp_content_encoder, p["rp_content_encoder"])
    ro.inject_rpseq(tnet.rp_style_encoder, p["rp_style_encoder"])
    ro.inject_rpseq(tnet.rp_decoder, p["rp_decoder"])
    _assert_losses(_loss_dict(bundle, variables, vgg_vars, c, s),
                   _torch_loss_dict(tnet, c, s))


def test_sanet_loss_parity():
    """SANet losses (sanet.py:248-275): normalized content, 5-stage style
    stats, Icc/Iss identity losses."""
    network = ro.load_reference()
    bundle, variables, vgg_vars, c, s = _setup(
        dict(network="sanet", img_size=32, content_weight=1.0,
             style_weight=3.0, l_identity1_weight=50.0,
             l_identity2_weight=1.0), img=32, batch=1)
    tvgg = ro.fresh_vgg()
    ro.inject_vgg(tvgg, vgg_vars["params"], num_stages=5)
    tnet = network.SAModel(dict(content_weight=1.0, style_weight=3.0,
                                l_identity1_weight=50.0,
                                l_identity2_weight=1.0), tvgg, 0, 32)
    p = variables["params"]
    ro.inject_transform(tnet.transform, p["transform"])
    ro.inject_mirror_decoder(tnet.decoder, p["decoder"])
    _assert_losses(_loss_dict(bundle, variables, vgg_vars, c, s),
                   _torch_loss_dict(tnet, c, s))
