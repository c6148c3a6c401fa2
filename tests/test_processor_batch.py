"""Sam3Processor.set_image_batch: batched grounding through the public API
(reference sam3_image_processor.py set_image_batch / get_masks_batch)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

BPE = "/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz"


@pytest.mark.skipif(not os.path.exists(BPE), reason="bpe asset unavailable")
def test_set_image_batch_matches_single():
    from efficientsam3_tpu.build import build_efficientsam3_image_model
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.processor import Sam3Processor

    model = build_efficientsam3_image_model(
        backbone_type="efficientvit", model_name="b0", embed_size=8,
        text_encoder_type="MobileCLIP-S0", text_encoder_context_length=16,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.zeros((1, 16), jnp.int32),
        Prompt.empty(1, 8, 8),
    )
    proc = Sam3Processor(
        model, variables, resolution=64, confidence_threshold=0.0,
        bpe_path=BPE, context_length=16,
    )

    rs = np.random.RandomState(0)
    im_a = rs.randint(0, 255, (48, 80, 3), np.uint8)
    im_b = rs.randint(0, 255, (96, 40, 3), np.uint8)

    st = proc.set_image_batch([im_a, im_b])
    st = proc.set_text_prompt("cat", st)
    assert st["batch_size"] == 2
    assert isinstance(st["masks"], list) and len(st["masks"]) == 2
    # masks come back at each image's ORIGINAL size
    assert st["masks"][0].shape[1:] == (48, 80)
    assert st["masks"][1].shape[1:] == (96, 40)

    # batched[0] must agree with the single-image path
    st1 = proc.set_image(im_a)
    st1 = proc.set_text_prompt("cat", st1)
    np.testing.assert_allclose(st1["scores"], st["scores"][0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(st1["boxes"], st["boxes"][0], rtol=1e-4, atol=1e-3)
