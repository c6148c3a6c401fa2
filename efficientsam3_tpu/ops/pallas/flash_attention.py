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
  - head_dim < 128 (the fusion encoder's 8 heads x 32) dispatches to a
    head-PACKED transposed kernel (_packed_kernel) that keeps all 128 MXU
    contraction lanes live; see its docstring.
  - backward: Pallas dq / dk+dv kernels (_bwd_dq_kernel, _bwd_dkv_kernel)
    recompute P from a saved logsumexp residual, so training never
    materializes the (Lq, Lk) logits in HBM either (the reference ships FA3
    fwd+bwd custom ops for the same reason, sam3/sam3/perflib/fa3.py).
    EFFICIENTSAM3_EINSUM_BWD=1 falls back to einsum-recompute gradients.

The wrapper pads Lq/Lk to block multiples (padding keys are masked through
the bias, padded query rows are sliced off) so callers keep arbitrary
lengths (5184 image tokens + 32 text tokens, 7*5184+64 memory tokens, ...).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(kvalid_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
            acc_ref, m_ref, l_ref, *, sm_scale: float, blocks_k: int,
            heads: int):
    # (keys live on LANES here, so the softmax reductions are cheap
    # cross-lane ops; the ones-column denominator-folding used by the
    # transposed kernels would add a 128-lane tile to V — +50% AV FLOPs at
    # D=256 — for no VPU win. Keep the explicit sums.)
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
        # logsumexp residual for the Pallas backward; NEG_INF rows mark
        # queries whose keys were ALL masked (backward treats p as 0 there)
        m = m_ref[:, :1]
        lse_ref[0] = jnp.where(m > NEG_INF / 2, m + jnp.log(l), NEG_INF)


def _flash_fwd(q, k, v, key_bias, sm_scale, block_q, block_k, interpret,
               return_lse=False):
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
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda gi, qi, ki: (gi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, lqp, d), q.dtype),
            jax.ShapeDtypeStruct((g, lqp, 1), jnp.float32),
        ],
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

    out, lse = out
    out = out.reshape(b, h, lqp, d)[:, :, :lq]
    if return_lse:
        return out, lse.reshape(b, h, lqp)[:, :, :lq]
    return out


def _packed_kernel(kvalid_ref, qt_ref, k_ref, vt_ref, bias_ref, o_ref,
                   lse_ref, acc_ref, m_ref, *, sm_scale: float,
                   blocks_k: int, groups_per_b: int, p: int, d: int):
    """Head-packed transposed flash attention for head_dim < 128.

    At head_dim 32 the MXU's 128-lane contraction is 3/4 idle in the
    straightforward per-head formulation (measured: 1.16 ms/layer at the
    fusion-encoder shape, ~4x the matmul roofline). This kernel packs
    p = 128 // d heads into one full-lane contraction:

      logits (transposed): S_T (p*bk, bq) = K_blk (p*bk, 128) @ Q_T (128, bq)
        where K_blk is block-diagonal -- row block h holds head h's keys in
        feature columns [h*d, (h+1)*d) and zeros elsewhere, so row h*bk+i of
        the product is exactly k_h[i] . q_h[:, :] with all 128 lanes live.
      AV (transposed): per head O_h^T (d, bq) += V_h^T (d, bk) @ P_h^T (bk, bq)
        -- full-lane contraction over bk, and the (d, bq) output wastes no
        lanes (d rows quantize at the 8-sublane granularity, bq fills lanes).

    The online softmax runs over axis 1 of S_T viewed as (p, bk, bq); the
    key bias arrives pre-transposed as a (bk, 1) sublane vector.
    """
    ki = pl.program_id(2)
    bq = o_ref.shape[2]
    bk = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)

    @pl.when(kvalid_ref[pl.program_id(0) // groups_per_b, ki] != 0)
    def _block():
        kb = k_ref[0]  # (bk, 128) bf16, heads dense along features
        qt = qt_ref[0]  # (128, bq)
        # block-diagonal K: row block h <- head h's keys, other features 0
        row_head = jax.lax.broadcasted_iota(jnp.int32, (p * bk, 128), 0) // bk
        col_head = jax.lax.broadcasted_iota(jnp.int32, (p * bk, 128), 1) // d
        k_blk = jnp.where(
            row_head == col_head, pltpu.repeat(kb, p, axis=0), 0
        )
        s_t = jax.lax.dot_general(
            k_blk, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (p*bk, bq) f32; row h*bk+i = logits of key i vs head h queries
        s3 = s_t.reshape(p, bk, bq) * sm_scale + bias_ref[0][None]

        m_prev = m_ref[:, :1, :]  # (p, 1, bq)
        m_cur = jnp.max(s3, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        pm = jnp.exp(s3 - m_new)  # (p, bk, bq) f32
        corr = jnp.exp(m_prev - m_new)  # (p, 1, bq)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        # softmax denominator folded into the AV matmul (8 appended ones
        # rows per head): the explicit (p, bk -> 1, bq) SUBLANE reduction
        # was pure VPU time on a VPU-bound kernel; row d of each head's
        # product is the P column sum
        pmv = pm.astype(vt_ref.dtype)
        vt = vt_ref[0]  # (128, bk)
        ones = jnp.ones((8, bk), vt_ref.dtype)
        for h in range(p):  # p small (4 at d=32); unrolled
            vt_aug = jnp.concatenate([vt[h * d:(h + 1) * d, :], ones], axis=0)
            pv = jax.lax.dot_general(
                vt_aug, pmv[h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d+8, bq)
            acc_ref[h] = acc_ref[h] * corr[h] + pv

    @pl.when(ki == blocks_k - 1)
    def _finalize():
        l = jnp.maximum(acc_ref[:, d:d + 1, :], 1e-30)  # (p, 1, bq)
        o = acc_ref[:, :d, :] / l  # (p, d, bq)
        o_ref[0] = o.reshape(p * d, bq).astype(o_ref.dtype)
        m = m_ref[:, :1, :]
        lse_ref[0] = jnp.where(m > NEG_INF / 2, m + jnp.log(l), NEG_INF)[
            :, 0, :
        ]


def _flash_fwd_packed(q, k, v, key_bias, sm_scale, block_q, block_k,
                      interpret, return_lse=False):
    """Packed-transposed path for d in {16, 32, 64}: see _packed_kernel."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    p = 128 // d
    assert h % p == 0, (h, d)
    g = h // p  # head groups per batch element
    bg = b * g

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
    kvalid = jnp.any(
        key_bias.reshape(b, blocks_k, block_k) > NEG_INF / 2, axis=-1
    ).astype(jnp.int32)
    bias_t = key_bias[:, :, None]  # (B, Lkp, 1) -- kv along sublanes

    # channel-major (transposed) operand layouts; XLA fuses these relayouts
    # with the preceding split_heads transposes
    qt = q.reshape(b, g, p, lqp, d).transpose(0, 1, 2, 4, 3).reshape(
        bg, p * d, lqp
    )
    kd = k.reshape(b, g, p, lkp, d).transpose(0, 1, 3, 2, 4).reshape(
        bg, lkp, p * d
    )
    vt = v.reshape(b, g, p, lkp, d).transpose(0, 1, 2, 4, 3).reshape(
        bg, p * d, lkp
    )

    grid = (bg, lqp // block_q, blocks_k)
    out = pl.pallas_call(
        functools.partial(
            _packed_kernel, sm_scale=sm_scale, blocks_k=blocks_k,
            groups_per_b=g, p=p, d=d,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, p * d, block_q), lambda gi, qi, ki: (gi, 0, qi)),
            pl.BlockSpec((1, block_k, p * d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, p * d, block_k), lambda gi, qi, ki: (gi, 0, ki)),
            pl.BlockSpec(
                (1, block_k, 1),
                lambda gi, qi, ki, g_=g: (gi // g_, ki, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, p * d, block_q), lambda gi, qi, ki: (gi, 0, qi)
            ),
            pl.BlockSpec((1, p, block_q), lambda gi, qi, ki: (gi, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bg, p * d, lqp), q.dtype),
            jax.ShapeDtypeStruct((bg, p, lqp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((p, d + 8, block_q), jnp.float32),  # acc + folded l
            pltpu.VMEM((p, 8, block_q), jnp.float32),  # running max
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvalid, qt, kd, vt, bias_t)

    out, lse = out
    out = out.reshape(b, g, p, d, lqp).transpose(0, 1, 2, 4, 3).reshape(
        b, h, lqp, d
    )[:, :, :lq]
    if return_lse:
        return out, lse.reshape(b, h, lqp)[:, :, :lq]
    return out


def flash_sdpa_packed(q, k, v, key_bias, sm_scale=None, block_q=512,
                      block_k=512, interpret=False):
    """Forward-only packed attention entry (benchmarks and tests)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_fwd_packed(q, k, v, key_bias, sm_scale, block_q, block_k,
                             interpret)


def _memattn_kernel(kvalid_ref, k_ref, qt_ref, vt_ref, bias_ref, o_ref,
                    acc_ref, m_ref, *, sm_scale: float,
                    blocks_k: int, heads: int):
    """Transposed cross-attention with narrow values (dv != dk).

    The tracker's memory attention reads VALUES that live in a 64-dim
    subspace: v = v_proj(x) with x the 64-dim memory tokens, and softmax
    rows sum to 1, so A @ v_proj(x) == v_proj(A @ x) exactly — the 64->256
    expansion commutes out of the attention (applied once per query instead
    of once per key). Attending over RAW 64-dim values cuts the AV matmul
    FLOPs 4x, but a (bq, bk) @ (bk, 64) product would idle half the MXU's
    output lanes — so this kernel runs fully transposed:

      S^T (bk, bq) = K_blk (bk, 256) @ Q^T (256, bq)   -- full 128-lane M/N
      O^T (dv, bq) += [V^T; 1] (dv+8, bk) @ P^T (bk, bq) -- dv on sublanes

    Online softmax reduces over axis 0 (keys on sublanes). The softmax
    DENOMINATOR is folded into the AV matmul as 8 appended ones rows
    (row dv of the product is sum_k P^T): on this shape the kernel is
    VPU-bound, and the explicit (bk -> 1) sublane reduction was ~25% of
    the per-block VPU time — the MXU computes it for free. Denominator
    and numerator then share the same bf16-rounded P (the einsum path
    sums P in f32; ~2^-9 relative difference, inside the bf16 noise
    floor). Forward-only: the cached-bank tracker path is inference-only
    by construction (video/predictor.py).
    """
    ki = pl.program_id(2)
    dv = o_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)

    @pl.when(kvalid_ref[pl.program_id(0) // heads, ki] != 0)
    def _block():
        kb = k_ref[0]  # (bk, dk) bf16
        qt = qt_ref[0]  # (dk, bq)
        bk = kb.shape[0]
        s_t = jax.lax.dot_general(
            kb, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, bq) f32
        s_t = s_t * sm_scale + bias_ref[0]  # bias (bk, 1) broadcasts lanes

        m_prev = m_ref[:1, :]  # (1, bq)
        m_cur = jnp.max(s_t, axis=0, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s_t - m_new)  # (bk, bq) f32
        corr = jnp.exp(m_prev - m_new)  # (1, bq)

        vt_aug = jnp.concatenate(
            [vt_ref[0], jnp.ones((8, bk), vt_ref.dtype)], axis=0
        )  # (dv+8, bk); row dv is the ones row -> P column sums
        pv = jax.lax.dot_general(
            vt_aug, p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (dv+8, bq) f32
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ki == blocks_k - 1)
    def _finalize():
        l = jnp.maximum(acc_ref[dv:dv + 1, :], 1e-30)
        o_ref[0] = (acc_ref[:dv] / l).astype(o_ref.dtype)


def _memattn_kernel_lse(kvalid_ref, k_ref, qt_ref, vt_ref, bias_ref, o_ref,
                        lse_ref, acc_ref, m_ref, *, sm_scale: float,
                        blocks_k: int, heads: int):
    """_memattn_kernel variant that also emits the log-sum-exp per query —
    used to merge the memory-bank segment with the (separately attended)
    object-pointer segment without concatenating pointer keys onto the
    ~148 MB bank per layer (tracker cached path)."""
    _memattn_kernel(
        kvalid_ref, k_ref, qt_ref, vt_ref, bias_ref, o_ref, acc_ref, m_ref,
        sm_scale=sm_scale, blocks_k=blocks_k, heads=heads,
    )
    ki = pl.program_id(2)
    dv = o_ref.shape[1]

    @pl.when(ki == blocks_k - 1)
    def _write_lse():
        m = m_ref[:1, :]
        l = acc_ref[dv:dv + 1, :]
        lse = jnp.where(m > NEG_INF / 2, m + jnp.log(jnp.maximum(l, 1e-30)),
                        NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def padded_bank_len(lk: int) -> int:
    """Key count rounded up so the default block_k tiles it exactly.

    Persistent-key-bank callers (the tracker's cached memory bank) pre-pad
    the key axis ONCE to this length — flash_memattn's per-call block
    padding then becomes a no-op instead of a fresh ~148 MB/layer copy of
    the bank every frame. Pad rows must be masked (key_bias = -inf)."""
    if lk >= 2048:
        return -(-lk // 2048) * 2048
    return -(-lk // 128) * 128


def flash_memattn(q, k, v, key_bias, sm_scale=None, block_q=None,
                  block_k=None, interpret=False, return_lse=False):
    """Forward-only flash attention with dv != dk (see _memattn_kernel).

    q (B,H,Lq,Dk); k (B,H,Lk,Dk); v (B,H,Lk,Dv) with Dv a multiple of 8;
    key_bias (B,Lk) f32. Returns (B,H,Lq,Dv) — callers apply the value
    up-projection afterwards. Fully-masked query rows return 0 (not the
    einsum path's uniform average; such rows are slot-gated everywhere)."""
    b, h, lq, dk = q.shape
    lk, dv = k.shape[2], v.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(dk)
    if block_q is None:
        # bq is the LANE axis of this transposed kernel, so it must stay
        # 128-aligned; pick the candidate with the least query padding
        # (the old fixed 1024 padded the tracker's 5184 queries to 6144 —
        # 18.5% dead lanes; 768 pads to 5376, 3.7%)
        block_q = min((768, 896, 1024), key=lambda bq: (-lq) % bq)
    if block_k is None:
        # wide kv blocks amortize per-grid-step overhead; bounded so the
        # f32 logits block stays within VMEM. Measured at the tracker
        # shape (8, 5184q, 36416kv, dk256/dv64): 2048 -> 7.29 ms vs
        # 512 -> 8.44 at bq=768 (old (1024,512) default: 9.20).
        # bk is the sublane axis of the k block but the LANE axis of the
        # transposed v/o blocks, so candidates must stay multiples of 128;
        # an exact divisor of Lk near 2048 avoids dead padded keys when
        # one exists (e.g. Lk = 32768 -> 2048 exact).
        block_k = 2048 if block_q * 2048 * 4 <= 6_500_000 else 512
        for cand in range(block_k, block_k // 2, -128):
            if lk % cand == 0:
                block_k = cand
                break
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
    kvalid = jnp.any(
        key_bias.reshape(b, blocks_k, block_k) > NEG_INF / 2, axis=-1
    ).astype(jnp.int32)
    bias_t = key_bias[:, :, None]  # (B, Lkp, 1) — keys along sublanes

    qt = q.transpose(0, 1, 3, 2).reshape(g, dk, lqp)
    kg = k.reshape(g, lkp, dk)
    vt = v.transpose(0, 1, 3, 2).reshape(g, dv, lkp)

    grid = (g, lqp // block_q, blocks_k)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, block_k, dk), lambda gi, qi, ki: (gi, ki, 0)),
        pl.BlockSpec((1, dk, block_q), lambda gi, qi, ki: (gi, 0, qi)),
        pl.BlockSpec((1, dv, block_k), lambda gi, qi, ki: (gi, 0, ki)),
        pl.BlockSpec(
            (1, block_k, 1), lambda gi, qi, ki, h_=h: (gi // h_, ki, 0)
        ),
    ]
    scratch = [
        pltpu.VMEM((dv + 8, block_q), jnp.float32),  # acc + folded l
        pltpu.VMEM((8, block_q), jnp.float32),  # running max
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    o_spec = pl.BlockSpec((1, dv, block_q), lambda gi, qi, ki: (gi, 0, qi))
    if return_lse:
        out, lse = pl.pallas_call(
            functools.partial(
                _memattn_kernel_lse, sm_scale=sm_scale, blocks_k=blocks_k,
                heads=h,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                o_spec,
                pl.BlockSpec((1, 8, block_q), lambda gi, qi, ki: (gi, 0, qi)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((g, dv, lqp), q.dtype),
                jax.ShapeDtypeStruct((g, 8, lqp), jnp.float32),
            ),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(kvalid, kg, qt, vt, bias_t)
        return (
            out.reshape(b, h, dv, lqp).transpose(0, 1, 3, 2)[:, :, :lq],
            lse[:, 0].reshape(b, h, lqp)[:, :, :lq],
        )
    out = pl.pallas_call(
        functools.partial(
            _memattn_kernel, sm_scale=sm_scale, blocks_k=blocks_k, heads=h
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((g, dv, lqp), q.dtype),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(kvalid, kg, qt, vt, bias_t)

    return out.reshape(b, h, dv, lqp).transpose(0, 1, 3, 2)[:, :, :lq]


def quantize_rows(x, scale_mul=1.0, eps=1e-8):
    """Symmetric per-row int8 quantization over the last axis.

    Returns (x_i8, scale) with x ~= x_i8 * scale, scale (..., 1) f32
    pre-multiplied by scale_mul (callers fold the softmax temperature in
    so the kernel pays ONE multiply per logit). Zero rows get scale
    scale_mul*eps/127 (harmless: their logits are exactly 0)."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), eps)
    s = amax / 127.0
    xi = jnp.round(xf / s).astype(jnp.int8)
    return xi, s * scale_mul


def _memattn_kernel_q8(kvalid_ref, k_ref, ks_ref, qt_ref, qs_ref, vt_ref,
                       o_ref, acc_ref, m_ref, *, blocks_k: int, heads: int):
    """_memattn_kernel with int8 K and Q^T and per-row f32 scales.

    The QK product runs as an int8 x int8 -> int32 MXU dot (2x the bf16
    rate on v5e, and the key bank streams at half the bytes); logits are
    recovered as s_i32 * (k_scale ⊗ q_scale) with the softmax temperature
    folded into q_scale. Masking rides the KEY SCALE: the wrapper sets
    masked rows' scale to NEG_INF and the kernel uses where(ks < 0, -inf)
    — no separate bias stream. Everything after the logits (online
    softmax, folded denominator, transposed AV in bf16) is identical to
    _memattn_kernel."""
    ki = pl.program_id(2)
    dv = o_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)

    @pl.when(kvalid_ref[pl.program_id(0) // heads, ki] != 0)
    def _block():
        kb = k_ref[0]  # (bk, dk) int8
        qt = qt_ref[0]  # (dk, bq) int8
        ks = ks_ref[0]  # (bk, 1) f32; NEG_INF marks masked/pad rows
        qs = qs_ref[0]  # (1, bq) f32, includes sm_scale
        s_i = jax.lax.dot_general(
            kb, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (bk, bq) i32
        valid = ks > NEG_INF / 2
        s_t = jnp.where(
            valid, s_i.astype(jnp.float32) * jnp.where(valid, ks, 0.0) * qs,
            NEG_INF,
        )

        m_prev = m_ref[:1, :]
        m_cur = jnp.max(s_t, axis=0, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s_t - m_new)
        corr = jnp.exp(m_prev - m_new)
        bk = kb.shape[0]
        vt_aug = jnp.concatenate(
            [vt_ref[0], jnp.ones((8, bk), vt_ref.dtype)], axis=0
        )
        pv = jax.lax.dot_general(
            vt_aug, p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ki == blocks_k - 1)
    def _finalize():
        l = jnp.maximum(acc_ref[dv:dv + 1, :], 1e-30)
        o_ref[0] = (acc_ref[:dv] / l).astype(o_ref.dtype)


def _memattn_kernel_q8_lse(kvalid_ref, k_ref, ks_ref, qt_ref, qs_ref, vt_ref,
                           o_ref, lse_ref, acc_ref, m_ref, *, blocks_k: int,
                           heads: int):
    _memattn_kernel_q8(
        kvalid_ref, k_ref, ks_ref, qt_ref, qs_ref, vt_ref, o_ref, acc_ref,
        m_ref, blocks_k=blocks_k, heads=heads,
    )
    ki = pl.program_id(2)
    dv = o_ref.shape[1]

    @pl.when(ki == blocks_k - 1)
    def _write_lse():
        m = m_ref[:1, :]
        l = acc_ref[dv:dv + 1, :]
        lse = jnp.where(m > NEG_INF / 2, m + jnp.log(jnp.maximum(l, 1e-30)),
                        NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def flash_memattn_q8(q, k_i8, k_scale, v, key_bias, sm_scale=None,
                     block_q=None, block_k=None, interpret=False,
                     return_lse=False):
    """flash_memattn over an int8-quantized key bank (quantize_rows).

    q (B,H,Lq,Dk) float — quantized per query row here (one cheap pass
    over ~5 MB vs the bank's ~37 MB/layer); k_i8 (B,H,Lk,Dk) int8 with
    k_scale (B,Lk) f32 from the caller (the tracker quantizes the
    age-adjusted bank once per frame per layer); v (B,H,Lk,Dv) float raw
    values; key_bias (B,Lk) f32 0/-inf key mask. Lk must already be a
    multiple of the kv block (padded_bank_len) — pad rows masked.

    Opt-in serving mode: logits carry symmetric-int8 error (~1e-2
    relative at the tracker's shapes, see test_flash_attention int8
    cases); the bf16 path stays the default."""
    b, h, lq, dk = q.shape
    lk, dv = k_i8.shape[2], v.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(dk)
    if block_q is None:
        block_q = min((768, 896, 1024), key=lambda bq: (-lq) % bq)
    if block_k is None:
        block_k = 2048 if block_q * 2048 * 4 <= 6_500_000 else 512
        for cand in range(block_k, block_k // 2, -128):
            if lk % cand == 0:
                block_k = cand
                break
    g = b * h
    assert lk % block_k == 0, (
        "flash_memattn_q8 requires a pre-padded key bank (padded_bank_len)"
    )

    pad_q = (-lq) % block_q
    lqp = lq + pad_q
    qi, qs = quantize_rows(q, scale_mul=sm_scale)
    if pad_q:
        qi = jnp.pad(qi, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, pad_q), (0, 0)))

    blocks_k = lk // block_k
    key_bias = key_bias.astype(jnp.float32)
    kvalid = jnp.any(
        key_bias.reshape(b, blocks_k, block_k) > NEG_INF / 2, axis=-1
    ).astype(jnp.int32)
    # fold the key mask into the scale stream: one (B, Lk) f32 input
    ks_m = jnp.where(key_bias > NEG_INF / 2, k_scale, NEG_INF)[:, :, None]

    qt = qi.transpose(0, 1, 3, 2).reshape(g, dk, lqp)
    qs_t = qs.reshape(g, 1, lqp)
    kg = k_i8.reshape(g, lk, dk)
    vt = v.transpose(0, 1, 3, 2).reshape(g, dv, lk)

    grid = (g, lqp // block_q, blocks_k)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, block_k, dk), lambda gi, qi_, ki: (gi, ki, 0)),
        pl.BlockSpec(
            (1, block_k, 1), lambda gi, qi_, ki, h_=h: (gi // h_, ki, 0)
        ),
        pl.BlockSpec((1, dk, block_q), lambda gi, qi_, ki: (gi, 0, qi_)),
        pl.BlockSpec((1, 1, block_q), lambda gi, qi_, ki: (gi, 0, qi_)),
        pl.BlockSpec((1, dv, block_k), lambda gi, qi_, ki: (gi, 0, ki)),
    ]
    scratch = [
        pltpu.VMEM((dv + 8, block_q), jnp.float32),
        pltpu.VMEM((8, block_q), jnp.float32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    o_spec = pl.BlockSpec((1, dv, block_q), lambda gi, qi_, ki: (gi, 0, qi_))
    args = (kvalid, kg, ks_m, qt, qs_t, vt)
    if return_lse:
        out, lse = pl.pallas_call(
            functools.partial(
                _memattn_kernel_q8_lse, blocks_k=blocks_k, heads=h,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                o_spec,
                pl.BlockSpec(
                    (1, 8, block_q), lambda gi, qi_, ki: (gi, 0, qi_)
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((g, dv, lqp), v.dtype),
                jax.ShapeDtypeStruct((g, 8, lqp), jnp.float32),
            ),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(*args)
        return (
            out.reshape(b, h, dv, lqp).transpose(0, 1, 3, 2)[:, :, :lq],
            lse[:, 0].reshape(b, h, lqp)[:, :, :lq],
        )
    out = pl.pallas_call(
        functools.partial(_memattn_kernel_q8, blocks_k=blocks_k, heads=h),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((g, dv, lqp), v.dtype),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, dv, lqp).transpose(0, 1, 3, 2)[:, :, :lq]


def _xattn_rpb_kernel(q_ref, k_ref, v_ref, ey_ref, ex_ref, yoh_ref, xoh_ref,
                      o_ref, acc_ref, m_ref, l_ref, *, sm_scale: float,
                      blocks_k: int):
    """Cross-attention with a DECOMPOSED boxRPB bias (see flash_xattn_rpb).

    The (bq, bk) bias tile is reconstituted in VMEM from the per-query row
    term ey (bq, 128) and column term ex (bq, 128) by two one-hot MXU
    matmuls (exact selection: one nonzero 1.0 per one-hot row). Padded kv
    rows select ey's sentinel lane 127, which the wrapper fills with
    NEG_INF -- key masking costs nothing extra. The full (B, heads, NQ, HW)
    bias never exists in HBM; at batch 8 that tensor is ~532 MB/layer and
    made the decoder 131x slower than batch 1."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # (bq, bk) f32
    # bias tile: ey @ Yoh^T + ex @ Xoh^T (one-hot selection on the MXU;
    # runs at the input dtype -- exact in f32, ~2^-9 relative in bf16)
    bias = jax.lax.dot_general(
        ey_ref[0], yoh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        ex_ref[0], xoh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == blocks_k - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def flash_xattn_rpb(q, k, v, ey, ex, feat_hw, sm_scale=None, block_q=None,
                    block_k=1024, interpret=False):
    """Flash cross-attention with the decoder's boxRPB bias decomposed.

    q (B,H,NQ,D); k, v (B,H,L,D) with L == h*w (row-major image tokens);
    ey (B,H,NQ,h), ex (B,H,NQ,w) f32 additive terms such that
    bias[b,n,q,y*w+x] = ey[b,n,q,y] + ex[b,n,q,x] (the reference's
    _get_rpb_matrix outer sum, sam3/sam3/model/decoder.py:333-415).
    Forward-only (inference); the training path keeps the einsum
    formulation for gradients. fp32 online softmax, probs cast to v.dtype.
    The bias one-hot matmuls run at q.dtype (bf16 in production: ~2^-9
    relative rounding of bias terms; f32 inputs keep selection exact).
    """
    b, hn, lq, d = q.shape
    h_img, w_img = feat_hw
    lk = k.shape[2]
    assert lk == h_img * w_img, (lk, feat_hw)
    assert h_img < 128 and w_img < 128, feat_hw
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if block_q is None:
        # one query block with minimal padding: NQ is 201/402, well under
        # the 512 sweet spot -- padding to 512 would rerun the whole kv
        # stream on dead query rows
        block_q = min(-(-lq // 16) * 16, 512)
    g = b * hn

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    lqp, lkp = lq + pad_q, lk + pad_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        ey = jnp.pad(ey, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        ex = jnp.pad(ex, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    # lane-pad the row/col terms to the 128-lane tile; ey lane 127 holds
    # NEG_INF -- the sentinel selected by padded kv rows (key masking)
    bt = q.dtype
    ey = jnp.pad(ey.astype(jnp.float32), ((0, 0),) * 3 + ((0, 128 - h_img),))
    ex = jnp.pad(ex.astype(jnp.float32), ((0, 0),) * 3 + ((0, 128 - w_img),))
    ey = ey.at[..., 127].set(NEG_INF).astype(bt)
    ex = ex.astype(bt)

    # one-hot row/col selectors (constant-folded under jit); padded kv rows
    # select ey's NEG_INF sentinel lane and an all-zero ex row
    kv_idx = jnp.arange(lkp)
    valid = kv_idx < lk
    yoh = jax.nn.one_hot(
        jnp.where(valid, kv_idx // w_img, 127), 128, dtype=bt
    )
    xoh = jax.nn.one_hot(
        jnp.where(valid, kv_idx % w_img, 128), 128, dtype=bt
    )
    blocks_k = lkp // block_k

    qg = q.reshape(g, lqp, d)
    kg = k.reshape(g, lkp, d)
    vg = v.reshape(g, lkp, d)
    eyg = ey.reshape(g, lqp, 128)
    exg = ex.reshape(g, lqp, 128)

    grid = (g, lqp // block_q, blocks_k)
    out = pl.pallas_call(
        functools.partial(
            _xattn_rpb_kernel, sm_scale=sm_scale, blocks_k=blocks_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, block_q, 128), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, block_q, 128), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((block_k, 128), lambda gi, qi, ki: (ki, 0)),
            pl.BlockSpec((block_k, 128), lambda gi, qi, ki: (ki, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda gi, qi, ki: (gi, qi, 0)
        ),
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
    )(qg, kg, vg, eyg, exg, yoh, xoh)

    return out.reshape(b, hn, lqp, d)[:, :, :lq]


def _bwd_dq_kernel(kvalid_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                   lse_ref, delta_ref, dq_ref, acc_ref, *, sm_scale: float,
                   blocks_k: int, heads: int):
    """dQ = (P ∘ (dO V^T - Δ)) K * scale, accumulated over kv blocks.

    P is recomputed exactly from the saved logsumexp (no running max
    needed: p = exp(s - lse)); Δ = rowsum(dO * O) comes in precomputed.
    Fully-masked kv blocks are skipped (their P column block is 0).
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(kvalid_ref[pl.program_id(0) // heads, ki] != 0)
    def _block():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + bias_ref[0, 0:1, :]
        lse = lse_ref[0]  # (blk_q, 1)
        p = jnp.where(lse > NEG_INF / 2, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_q, blk_k)
        ds = p * (dp - delta_ref[0])
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == blocks_k - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[:] * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(kvalid_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                    lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                    sm_scale: float, blocks_q: int, heads: int):
    """dV = P^T dO; dK = (P ∘ (dO V^T - Δ))^T Q * scale, over q blocks.

    Grid is (batch*heads, kv blocks, q blocks) with q sequential so the
    (blk_k, D) accumulators persist per kv block. Zero-padded dO rows make
    padded queries contribute nothing (Δ = 0, dO = 0)."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(kvalid_ref[pl.program_id(0) // heads, pl.program_id(1)] != 0)
    def _block():
        q = q_ref[0]
        k = k_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + bias_ref[0, 0:1, :]
        lse = lse_ref[0]  # (blk_q, 1)
        p = jnp.where(lse > NEG_INF / 2, jnp.exp(s - lse), 0.0)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk_k, D) = P^T dO
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0])
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == blocks_q - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, key_bias, o, lse, do, sm_scale, block_q, block_k,
               interpret):
    """Pallas backward: returns (dq, dk, dv) without materializing (Lq, Lk)
    logits in HBM (the previous einsum-recompute backward did, which is
    what made full-resolution stage-3 training memory-bound)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    g = b * h

    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    lqp, lkp = lq + pad_q, lk + pad_k
    if pad_q:
        pads = ((0, 0), (0, 0), (0, pad_q), (0, 0))
        q = jnp.pad(q, pads)
        do = jnp.pad(do, pads)
        o = jnp.pad(o, pads)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_q)),
                      constant_values=NEG_INF)
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    key_bias = jnp.pad(
        key_bias.astype(jnp.float32), ((0, 0), (0, pad_k)),
        constant_values=NEG_INF,
    )

    blocks_q = lqp // block_q
    blocks_k = lkp // block_k
    kvalid = jnp.any(
        key_bias.reshape(b, blocks_k, block_k) > NEG_INF / 2, axis=-1
    ).astype(jnp.int32)
    key_bias8 = jnp.broadcast_to(key_bias[:, None, :], (b, 8, lkp))

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (B, H, Lqp)
    qg = q.reshape(g, lqp, d)
    kg = k.reshape(g, lkp, d)
    vg = v.reshape(g, lkp, d)
    dog = do.reshape(g, lqp, d)
    lseg = lse.reshape(g, lqp, 1)
    deltag = delta.reshape(g, lqp, 1)

    def specs(q_of, k_of):
        """Input specs shared by both kernels; q_of/k_of pick which grid
        axis indexes q blocks vs kv blocks."""
        return [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d),
                         lambda gi, i, j: (gi, q_of(i, j), 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda gi, i, j: (gi, k_of(i, j), 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda gi, i, j: (gi, k_of(i, j), 0)),
            pl.BlockSpec((1, 8, block_k),
                         lambda gi, i, j: (gi // h, 0, k_of(i, j))),
            pl.BlockSpec((1, block_q, d),
                         lambda gi, i, j: (gi, q_of(i, j), 0)),
            pl.BlockSpec((1, block_q, 1),
                         lambda gi, i, j: (gi, q_of(i, j), 0)),
            pl.BlockSpec((1, block_q, 1),
                         lambda gi, i, j: (gi, q_of(i, j), 0)),
        ]

    # dq: grid (g, q blocks, kv blocks), kv sequential
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, blocks_k=blocks_k, heads=h
        ),
        grid=(g, blocks_q, blocks_k),
        in_specs=specs(lambda i, j: i, lambda i, j: j),
        out_specs=pl.BlockSpec((1, block_q, d), lambda gi, i, j: (gi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((g, lqp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvalid, qg, kg, vg, key_bias8, dog, lseg, deltag)

    # dk/dv: grid (g, kv blocks, q blocks), q sequential
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, blocks_q=blocks_q, heads=h
        ),
        grid=(g, blocks_k, blocks_q),
        in_specs=specs(lambda i, j: j, lambda i, j: i),
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda gi, i, j: (gi, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda gi, i, j: (gi, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, lkp, d), k.dtype),
            jax.ShapeDtypeStruct((g, lkp, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvalid, qg, kg, vg, key_bias8, dog, lseg, deltag)

    dq = dq.reshape(b, h, lqp, d)[:, :, :lq]
    dk = dk.reshape(b, h, lkp, d)[:, :, :lk]
    dv = dv.reshape(b, h, lkp, d)[:, :, :lk]
    return dq, dk, dv


def _einsum_reference(q, k, v, key_bias, sm_scale):
    """The exact semantics the kernel implements (used for the VJP)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    logits = logits + key_bias.astype(jnp.float32)[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _packed_ok(h, d):
    """Head-packing needs d | 128 and whole head groups."""
    return d in (16, 32, 64) and h % (128 // d) == 0


def _auto_blocks(lq, lk, d, packed=False):
    """Measured on v5e at the model's hot shapes (block-size sweeps):
    - small head dims on the packed-transposed path: 512x256 measured
      0.77-0.80 ms vs 512x512's 0.79-0.82 at the fusion shape
      (1,8,5216,32) -- and the per-head path's 1.29 ms;
    - small head dims on the per-head path want wide kv blocks to amortize
      per-grid-step overhead (fusion (1,8,5216,32): 512x2048 = 1.16 ms vs
      512x512 = 2.28);
    - d=256 self-attention favors 512x1024 (tracker (8,1,5184^2,256):
      1.08 ms);
    - d=256 long-kv cross-attention favors TALL q blocks so each slot's
      ~37 MB of memory keys streams through fewer times (memory
      cross (8,1,5184,36416,256): 11.4 ms at 1312x512 vs 11.8 at 512x1024;
      2624x512 measured 10.7 but compiles at ~131% of the 16 MB VMEM
      budget and OOMs depending on scheduling - not robust)."""
    if packed:
        # r4 re-sweep at the fusion shape (1,8,5184,32): 512x512 = 0.566 ms
        # (the d=32 structural ceiling) vs 512x256 = 1.02, 1024x512 = 0.87
        return 512, 512
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
    h, d = q.shape[1], q.shape[-1]
    packed = (d < 128 and _packed_ok(h, d)
              and not os.environ.get("EFFICIENTSAM3_NO_PACKED"))
    bq, bk = _auto_blocks(q.shape[-2], k.shape[-2], d, packed)
    fwd = _flash_fwd_packed if packed else _flash_fwd
    return fwd(q, k, v, key_bias, sm_scale, block_q or bq,
               block_k or bk, interpret)


def _fwd(q, k, v, key_bias, sm_scale, block_q, block_k, interpret):
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    h, d = q.shape[1], q.shape[-1]
    packed = (d < 128 and _packed_ok(h, d)
              and not os.environ.get("EFFICIENTSAM3_NO_PACKED"))
    bq, bk = _auto_blocks(q.shape[-2], k.shape[-2], d, packed)
    fn = _flash_fwd_packed if packed else _flash_fwd
    out, lse = fn(q, k, v, key_bias, sm_scale, block_q or bq, block_k or bk,
                  interpret, return_lse=True)
    return out, (q, k, v, key_bias, out, lse)


def _bwd(sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, key_bias, out, lse = res
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if os.environ.get("EFFICIENTSAM3_EINSUM_BWD"):
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _einsum_reference(
                q_, k_, v_, key_bias, sm_scale
            ),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _flash_bwd(
            q, k, v, key_bias, out, lse, g, sm_scale,
            min(block_q or 512, 512), min(block_k or 512, 512), interpret,
        )
    return dq, dk, dv, jnp.zeros_like(key_bias)


flash_sdpa.defvjp(_fwd, _bwd)
