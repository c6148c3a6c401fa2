"""RepViT deploy-time reparameterization: fused == train-form at eval."""

import numpy as np

import jax
import jax.numpy as jnp

from efficientsam3_tpu.models.repvit import RepViT, fuse_repvit_params, _m0_9_cfgs


def test_repvit_fuse_equivalence():
    cfgs = tuple(_m0_9_cfgs()[:6])  # covers stride-2, RepVGGDW, SE blocks
    model = RepViT(cfgs=cfgs)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 32, 32, 3))
    variables = model.init(rng, x, train=False)
    # randomize BN stats so fusion is non-trivial
    stats = jax.tree.map(
        lambda v: v + jax.random.uniform(rng, v.shape, minval=0.1, maxval=0.5),
        variables["batch_stats"],
    )
    want = model.apply({"params": variables["params"], "batch_stats": stats}, x)

    fused = fuse_repvit_params(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, stats),
        cfgs,
    )
    deploy = RepViT(cfgs=cfgs, deploy=True)
    got = deploy.apply({"params": fused}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3)
