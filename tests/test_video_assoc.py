"""Video association training: Det2TrkAssoc loss parity vs the reference
torch oracle + frame-pair smoke training (loss decreases)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from _reference import install_torchmetrics_stub, install_triton_focal_stub, ref_module


def _fixture(seed=0, b=3, q_det=7, q_trk=4):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 2, (b, q_det, q_trk + 2)).astype(np.float32)
    ids = -np.ones((b, q_det + q_trk), np.int64)
    # object ids shared between det and trk queries, some new, some fp
    ids[0, 0], ids[0, q_det + 1] = 5, 5      # same object det<->trk
    ids[0, 2] = 9                             # new object
    ids[1, 1], ids[1, q_det + 0] = 3, 3
    ids[1, 3], ids[1, q_det + 2] = 4, 4
    ids[2, q_det + 3] = 7                     # track only (occluded)
    pred_logits = rng.normal(0, 2, (b, q_det, 1)).astype(np.float32)
    is_exh = np.array([True, False, True])
    return logits, ids, pred_logits, is_exh


def test_det2trk_assoc_parity():
    install_torchmetrics_stub()
    install_triton_focal_stub()
    loss_fns = ref_module("train.loss.loss_fns")
    logits, ids, pred_logits, is_exh = _fixture()
    num_boxes = 4.0

    for use_fp, treat_new in ((False, False), (True, False), (True, True)):
        ref = loss_fns.Det2TrkAssoc(
            weight_dict={"loss_det2trk_assoc": 1.0},
            use_fp_loss=use_fp,
            treat_fp_as_new_obj=treat_new,
        )
        with torch.no_grad():
            want = ref.get_loss(
                outputs={
                    "det2trk_assoc_logits": torch.from_numpy(logits),
                    "matched_object_ids": torch.from_numpy(ids),
                    "pred_logits": torch.from_numpy(pred_logits),
                },
                targets={"is_exhaustive": torch.from_numpy(is_exh)},
                indices=None,
                num_boxes=num_boxes,
            )["loss_det2trk_assoc"].item()

        from efficientsam3_tpu.train.losses import det2trk_assoc_loss

        got = float(
            det2trk_assoc_loss(
                jnp.asarray(logits), jnp.asarray(ids), num_boxes,
                pred_logits=jnp.asarray(pred_logits),
                is_exhaustive=jnp.asarray(is_exh),
                use_fp_loss=use_fp, treat_fp_as_new_obj=treat_new,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"fp={use_fp}")


def test_assoc_head_smoke_training():
    """A 2-frame association batch trains: loss decreases (VERDICT item 8)."""
    import optax

    from efficientsam3_tpu.train.video_assoc import (
        AssocHead,
        FramePairDataset,
        assoc_train_step,
    )

    ds = FramePairDataset(d_model=32, seed=1)
    head = AssocHead(d_model=32)
    batch0 = jax.tree.map(jnp.asarray, ds.batch(2))
    params = head.init(
        jax.random.PRNGKey(0), batch0["det_queries"], batch0["trk_queries"]
    )["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = assoc_train_step(head, tx)

    losses = []
    for i in range(40):
        batch = jax.tree.map(jnp.asarray, ds.batch(2))
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), losses[:5] + losses[-5:]
