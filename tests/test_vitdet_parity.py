"""Teacher ViT trunk parity vs the reference vitdet (tiny config)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from _reference import install_timm_stub, ref_module

RNG = np.random.default_rng(31)


def test_vitdet_trunk_parity():
    install_timm_stub()
    vit_mod = ref_module("model.vitdet")
    torch.manual_seed(0)
    # tiny structural twin of the builder config (model_builder.py:70-97):
    # windowed + global blocks, tiled abs pos, interpolated rope, ln_pre
    ref = vit_mod.ViT(
        img_size=64,
        pretrain_img_size=32,
        patch_size=8,
        embed_dim=64,
        depth=2,
        num_heads=4,
        mlp_ratio=4.625,
        norm_layer="LayerNorm",
        drop_path_rate=0.0,
        qkv_bias=True,
        use_abs_pos=True,
        tile_abs_pos=True,
        global_att_blocks=(1,),
        rel_pos_blocks=(),
        use_rope=True,
        use_interp_rope=True,
        window_size=4,
        pretrain_use_cls_token=True,
        retain_cls_token=False,
        ln_pre=True,
        ln_post=False,
        return_interm_layers=False,
        bias_patch_embed=False,
        use_act_checkpoint=False,
    ).eval()
    x = RNG.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))[-1].numpy()  # (1, C, 8, 8)

    from efficientsam3_tpu.models.vitdet import ViTTrunk
    from efficientsam3_tpu.utils.convert_model import convert_vitdet

    sd = {f"v.{k}": v for k, v in ref.state_dict().items()}
    params, _ = convert_vitdet(sd, "v", depth=2)
    mine = ViTTrunk(
        patch_size=8, embed_dim=64, depth=2, num_heads=4, mlp_ratio=4.625,
        window_size=4, global_att_blocks=(1,), pretrain_grid=4,
        drop_path_rate=0.0,
    )
    got = mine.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-3, rtol=1e-3
    )
