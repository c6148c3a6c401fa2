"""Flash attention (online-softmax) Pallas TPU kernel for the hot paths.

Why this exists: the fusion encoder's 5184-token self-attention and the
tracker's memory cross-attention (5184 queries x ~36k memory keys, single
head, head_dim 256) dominate end-to-end latency. The einsum formulation
materializes the (Lq, Lk) logits to HBM in fp32 for the two-pass softmax —
measured 6.5 ms/layer at the fusion shape on one v5e chip, ~4x the pure
matmul cost; the reference hits the same wall on GPUs and ships FA3 fp8
wrappers (sam3/sam3/perflib/fa3.py). This kernel keeps each logits block in
VMEM, maintains the fp32 running max/denominator online, and never writes
the score matrix — fp32-softmax numerics at bf16-matmul speed.

Design notes (TPU):
  - grid = (B*H, Lq/block_q, Lk/block_k); the kv dimension is the innermost
    ("arbitrary" = sequential) axis, so the fp32 accumulator / running max /
    running sum scratch persists across kv blocks of one (head, q-block).
  - key bias: a (B, Lk) f32 additive vector (0 for valid keys, -1e9 style
    for padding) covers every mask the model uses: text padding in the
    fusion encoder, invalid memory-bank slots in the tracker. Full (Lq, Lk)
    biases (boxRPB in the decoder) stay on the einsum path — their shapes
    are tiny (200 queries).
  - block skipping: a per-(batch, kv-block) validity flag in SMEM gates the
    whole block's matmuls with @pl.when. Early in a video most memory slots
    are padding; the tracker's cross-attention compute drops proportionally
    while shapes stay static (the reference instead reshapes dynamically,
    sam3_tracker_base.py memory concat).
  - probabilities are cast to the value dtype (bf16) before the AV matmul,
    matching the einsum path's `softmax(...).astype(v.dtype)` semantics.
  - backward: jax.custom_vjp re-derives gradients through the reference
    einsum formulation (recompute; no score-matrix residuals saved). Same
    memory behaviour as the previous all-einsum training path.

The wrapper pads Lq/Lk to block multiples (padding keys are masked through
the bias, padded query rows are sliced off) so callers keep arbitrary
lengths (5184 image tokens + 32 text tokens, 7*5184+64 memory tokens, ...).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(kvalid_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
            acc_ref, m_ref, l_ref, *, sm_scale: float, blocks_k: int,
            heads: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # kvalid lives whole in SMEM (scalar control data); index by program id
    @pl.when(kvalid_ref[pl.program_id(0) // heads, ki] != 0)
    def _block():
        q = q_ref[0]  # (blk_q, D) bf16
        k = k_ref[0]  # (blk_k, D) bf16
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, blk_k) f32
        # bias block is (1, 8, blk_k) — 8 replicated sublanes to satisfy the
        # (8, 128) tiling constraint; one row broadcasts over the q block
        s = s * sm_scale + bias_ref[0, 0:1, :]

        m_prev = m_ref[:, :1]  # (blk_q, 1)
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (blk_q, blk_k) f32
        corr = jnp.exp(m_prev - m_new)  # (blk_q, 1)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, D) f32
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == blocks_k - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _flash_fwd(q, k, v, key_bias, sm_scale, block_q, block_k, interpret):
    """q (B,H,Lq,D), k/v (B,H,Lk,D), key_bias (B,Lk) f32 -> (B,H,Lq,D)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    g = b * h

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    lqp, lkp = lq + pad_q, lk + pad_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    key_bias = jnp.pad(
        key_bias.astype(jnp.float32), ((0, 0), (0, pad_k)),
        constant_values=NEG_INF,
    )

    blocks_k = lkp // block_k
    # per-(batch, kv-block) validity: skip blocks whose keys are all masked
    kvalid = jnp.any(
        key_bias.reshape(b, blocks_k, block_k) > NEG_INF / 2, axis=-1
    ).astype(jnp.int32)
    # replicate to 8 sublanes for the VMEM tiling constraint (see _kernel)
    key_bias8 = jnp.broadcast_to(key_bias[:, None, :], (b, 8, lkp))

    qg = q.reshape(g, lqp, d)
    kg = k.reshape(g, lkp, d)
    vg = v.reshape(g, lkp, d)

    grid = (g, lqp // block_q, blocks_k)
    out = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, blocks_k=blocks_k, heads=h
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, 8, block_k), lambda gi, qi, ki: (gi // h, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda gi, qi, ki: (gi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((g, lqp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvalid, qg, kg, vg, key_bias8)

    out = out.reshape(b, h, lqp, d)
    return out[:, :, :lq] if pad_q else out


def _einsum_reference(q, k, v, key_bias, sm_scale):
    """The exact semantics the kernel implements (used for the VJP)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    logits = logits + key_bias.astype(jnp.float32)[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _auto_blocks(lq, lk, d):
    """Measured on v5e at the model's hot shapes (block-size sweeps):
    - small head dims want wide kv blocks to amortize per-grid-step
      overhead (fusion (1,8,5216,32): 512x2048 = 1.16 ms vs 512x512 = 2.28);
    - d=256 self-attention favors 512x1024 (tracker (8,1,5184^2,256):
      1.08 ms);
    - d=256 long-kv cross-attention favors TALL q blocks so each slot's
      ~37 MB of memory keys streams through fewer times (memory
      cross (8,1,5184,36416,256): 11.4 ms at 1312x512 vs 11.8 at 512x1024;
      2624x512 measured 10.7 but compiles at ~131% of the 16 MB VMEM
      budget and OOMs depending on scheduling - not robust)."""
    if d <= 64:
        return 512, 2048
    if lk >= 4 * lq:
        return 1312, 512
    return 512, 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_sdpa(q, k, v, key_bias, sm_scale=None, block_q=None, block_k=None,
               interpret=False):
    """Flash scaled-dot-product attention.

    q (B,H,Lq,D); k, v (B,H,Lk,D); key_bias (B,Lk) additive f32 logits bias
    (use ~-1e9 for masked keys). fp32 online softmax, probs cast to v.dtype
    for the AV matmul (matches models.common.sdpa numerics).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    bq, bk = _auto_blocks(q.shape[-2], k.shape[-2], q.shape[-1])
    return _flash_fwd(q, k, v, key_bias, sm_scale, block_q or bq,
                      block_k or bk, interpret)


def _fwd(q, k, v, key_bias, sm_scale, block_q, block_k, interpret):
    out = flash_sdpa(q, k, v, key_bias, sm_scale, block_q, block_k, interpret)
    return out, (q, k, v, key_bias)


def _bwd(sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, key_bias = res
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _einsum_reference(q_, k_, v_, key_bias, sm_scale),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(key_bias)


flash_sdpa.defvjp(_fwd, _bwd)
