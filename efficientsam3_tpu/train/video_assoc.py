"""Video training: frame-pair dataset + detection<->tracking association.

The reference trains video grounding with a Det2TrkAssoc loss
(sam3/sam3/train/loss/loss_fns.py:1153) over association logits between
detection queries and tracking queries; the producing head is not in the
released tree, so this module provides a TPU-native one:

  - AssocHead: scaled dot-product between projected detection queries and
    [tracking queries; new_object; false_positive] slots ->
    (B, Q_det, Q_trk + 2) logits.
  - FramePairDataset: synthetic frame pairs with persistent object ids
    (reference sam3/sam3/train/data/sam3_video_dataset.py supplies real
    video clips in the same (frame_t, frame_t+1) contract).
  - assoc_train_step: one jitted step over the association head; the smoke
    test asserts the loss decreases on a 2-frame batch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientsam3_tpu.train.losses import det2trk_assoc_loss


class AssocHead(nn.Module):
    """Association logits between detection and tracking queries."""

    d_model: int = 256

    @nn.compact
    def __call__(self, det_queries, trk_queries):
        """det (B, Qd, C), trk (B, Qt, C) -> (B, Qd, Qt + 2)."""
        d = self.d_model
        q = nn.Dense(d, name="det_proj")(det_queries)
        k = nn.Dense(d, name="trk_proj")(trk_queries)
        new_obj = self.param(
            "new_object_embed", nn.initializers.normal(0.02), (1, 1, d)
        )
        fp = self.param(
            "false_positive_embed", nn.initializers.normal(0.02), (1, 1, d)
        )
        b = det_queries.shape[0]
        extra = jnp.broadcast_to(
            jnp.concatenate([new_obj, fp], axis=1), (b, 2, d)
        )
        keys = jnp.concatenate([k, extra], axis=1)  # (B, Qt+2, C)
        return jnp.einsum("bqc,bkc->bqk", q, keys) / jnp.sqrt(d).astype(q.dtype)


class FramePairDataset:
    """Synthetic (frame_t, frame_t+1) pairs with persistent object ids.

    Each sample carries per-frame detection-query features and the previous
    frame's tracking-query features, derived from per-object latent codes
    plus noise, with ids assigned the way the video matcher would
    (Hungarian on the real model; identity codes here keep the dataset
    model-free)."""

    def __init__(self, q_det=12, q_trk=6, d_model=32, num_objects=4,
                 noise: float = 0.3, seed: int = 0):
        self.q_det, self.q_trk, self.d = q_det, q_trk, d_model
        self.num_objects = num_objects
        self.noise = noise
        self.rng = np.random.default_rng(seed)
        self.codes = self.rng.normal(0, 1, (64, d_model)).astype(np.float32)

    def batch(self, batch_size: int):
        b, qd, qt, d = batch_size, self.q_det, self.q_trk, self.d
        det = self.rng.normal(0, 1, (b, qd, d)).astype(np.float32)
        trk = self.rng.normal(0, 1, (b, qt, d)).astype(np.float32)
        ids = -np.ones((b, qd + qt), np.int64)
        for bi in range(b):
            n = int(self.rng.integers(1, self.num_objects + 1))
            obj_ids = self.rng.choice(64, n, replace=False)
            # each object appears as one tracking query (prev frame) and,
            # with high probability, one detection query (current frame)
            trk_slots = self.rng.choice(qt, min(n, qt), replace=False)
            det_slots = self.rng.choice(qd, min(n, qd), replace=False)
            for k, oid in enumerate(obj_ids):
                if k < len(trk_slots):
                    trk[bi, trk_slots[k]] = (
                        self.codes[oid]
                        + self.rng.normal(0, self.noise, d)
                    )
                    ids[bi, qd + trk_slots[k]] = oid
                if k < len(det_slots) and self.rng.random() < 0.9:
                    det[bi, det_slots[k]] = (
                        self.codes[oid]
                        + self.rng.normal(0, self.noise, d)
                    )
                    ids[bi, det_slots[k]] = oid
        return {
            "det_queries": det,
            "trk_queries": trk,
            "matched_object_ids": ids,
        }


def assoc_train_step(head, tx):
    """Returns a jitted (params, opt_state, batch) -> (params, opt_state,
    loss) association training step."""
    import optax

    def loss_fn(params, batch):
        logits = head.apply({"params": params}, batch["det_queries"],
                            batch["trk_queries"])
        num_boxes = jnp.maximum(
            (batch["matched_object_ids"][:, : logits.shape[1]] >= 0)
            .sum()
            .astype(jnp.float32),
            1.0,
        )
        return det2trk_assoc_loss(
            logits, batch["matched_object_ids"], num_boxes
        )

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
