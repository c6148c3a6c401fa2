"""Full-model checkpoint conversion: reference EfficientSAM3 state_dict ->
Sam3ImageModel param tree, validated shape-by-shape against model.init.

The reference model is constructed (never forwarded — torchvision is
stubbed) purely to obtain the authoritative checkpoint key space.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from _reference import (
    install_ftfy_stub,
    install_iopath_stub,
    install_omegaconf_stub,
    install_pycocotools_stub,
    install_timm_stub,
    install_torchvision_stub,
    ref_module,
)


@pytest.mark.slow
def test_full_efficientsam3_conversion_shapes():
    install_torchvision_stub()
    install_timm_stub()
    install_ftfy_stub()
    install_iopath_stub()
    install_omegaconf_stub()
    install_pycocotools_stub()
    mb = ref_module("model_builder")
    torch.manual_seed(0)
    ref = mb.build_efficientsam3_image_model(
        bpe_path="/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz",
        device="cpu",
        eval_mode=True,
        load_from_HF=False,
        backbone_type="efficientvit",
        model_name="b0",
        text_encoder_type="MobileCLIP-S0",
        text_encoder_context_length=77,
        enable_inst_interactivity=False,
    )
    sd = {k: v for k, v in ref.state_dict().items()}

    from efficientsam3_tpu.utils.checkpoint import clean_reference_state_dict
    from efficientsam3_tpu.utils.convert_model import convert_image_model

    sd = clean_reference_state_dict(sd)
    params, stats = convert_image_model(
        sd, backbone_type="efficientvit", model_name="b0",
        text_encoder_type="MobileCLIP-S0",
    )

    from efficientsam3_tpu.build import build_efficientsam3_image_model
    from efficientsam3_tpu.models.geometry import Prompt

    model = build_efficientsam3_image_model(
        backbone_type="efficientvit", model_name="b0",
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=77,
        embed_size=8,
    )
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 77), jnp.int32),
            Prompt.empty(1, 2, 2),
        )
    )

    def _shape(v):
        return tuple(v.shape) if hasattr(v, "shape") else np.asarray(v).shape

    ref_flat = {
        jax.tree_util.keystr(p): _shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    got_flat = {
        jax.tree_util.keystr(p): _shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    missing = sorted(set(ref_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(ref_flat))
    mismatched = sorted(
        k for k in set(ref_flat) & set(got_flat) if ref_flat[k] != got_flat[k]
    )
    assert not missing, f"missing {len(missing)}: {missing[:8]}"
    assert not extra, f"extra {len(extra)}: {extra[:8]}"
    assert not mismatched, (
        f"shape mismatches {len(mismatched)}: "
        f"{[(k, ref_flat[k], got_flat[k]) for k in mismatched[:8]]}"
    )

    # batch_stats coverage
    bs_ref = {
        jax.tree_util.keystr(p): _shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    }
    bs_got = {
        jax.tree_util.keystr(p): _shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(stats)
    }
    assert set(bs_ref) == set(bs_got), (
        f"batch_stats diff: missing={sorted(set(bs_ref)-set(bs_got))[:5]} "
        f"extra={sorted(set(bs_got)-set(bs_ref))[:5]}"
    )
