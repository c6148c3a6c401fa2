"""Sigmoid focal loss (fused-by-XLA elementwise chain).

The reference implements a memory-efficient fused Triton kernel with a
32-slot atomic-add reduction (sam3/sam3/train/loss/sigmoid_focal_loss.py:26)
because eager torch materializes every intermediate. Under jit, XLA fuses
the whole elementwise chain + reduction into one pass over HBM, so the plain
formulation IS the fused kernel on TPU; a custom VJP keeps the backward a
single fused pass as well (no saved intermediates beyond inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Per-element focal loss (no reduction), torchvision semantics
    (reference train/loss/loss_fns.py:126)."""
    return _focal_fwd_impl(logits, targets, alpha, gamma)


def _focal_fwd_impl(logits, targets, alpha, gamma):
    p = jax.nn.sigmoid(logits)
    ce = optax_bce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_bce(logits, targets):
    """Numerically-stable BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _focal_fwd(logits, targets, alpha, gamma):
    return _focal_fwd_impl(logits, targets, alpha, gamma), (logits, targets)


def _focal_bwd(alpha, gamma, res, g):
    logits, targets = res
    # Recompute the chain in one fused pass (cheaper than saving it).
    p = jax.nn.sigmoid(logits)
    ce = optax_bce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    one_m = 1 - p_t
    dce_dx = p - targets
    # d p_t/dx = (2*targets - 1) * p * (1 - p)
    dpt_dx = (2 * targets - 1) * p * (1 - p)
    if gamma == 0.0:
        # the modulating term vanishes analytically; computing it anyway
        # yields 0 * one_m**(-1) = 0 * inf = NaN once a logit saturates
        # (p_t == 1.0 exactly in fp32, |logit| >~ 17) — this was the
        # deterministic grad-NaN in the stage-3 overfit run.
        dloss = dce_dx
    else:
        # guard one_m**(gamma-1) for gamma < 1 at one_m == 0: ce -> 0 there,
        # so the true limit of the term is 0; clamping keeps it finite.
        one_m_safe = jnp.maximum(one_m, jnp.finfo(p.dtype).tiny)
        dloss = (
            one_m**gamma * dce_dx
            - gamma * one_m_safe ** (gamma - 1.0) * dpt_dx * ce
        )
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        dloss = alpha_t * dloss
    return (g * dloss, jnp.zeros_like(targets))


sigmoid_focal_loss.defvjp(_focal_fwd, _focal_bwd)


def dice_loss(pred_logits, targets, eps: float = 1.0):
    """Dice loss over flattened masks (reference loss_fns.py:79)."""
    p = jax.nn.sigmoid(pred_logits).reshape(pred_logits.shape[0], -1)
    t = targets.reshape(targets.shape[0], -1)
    num = 2 * (p * t).sum(-1)
    den = p.sum(-1) + t.sum(-1)
    return 1 - (num + eps) / (den + eps)
