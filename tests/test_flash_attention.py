"""Flash attention kernel parity (interpret mode on CPU) vs einsum sdpa."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientsam3_tpu.ops.pallas.flash_attention import (
    NEG_INF,
    _einsum_reference,
    flash_sdpa,
    flash_sdpa_packed,
)

RNG = np.random.default_rng(0)


def _rand(shape, dtype=jnp.float32):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32), dtype)


@pytest.mark.parametrize("b,h,lq,lk,d", [
    (1, 2, 96, 96, 32),     # self-attention, multi-head, padding needed
    (2, 1, 64, 224, 64),    # cross-attention, kv longer than q
])
def test_flash_matches_einsum(b, h, lq, lk, d):
    q, k, v = _rand((b, h, lq, d)), _rand((b, h, lk, d)), _rand((b, h, lk, d))
    bias = np.zeros((b, lk), np.float32)
    bias[:, lk - 17:] = NEG_INF  # padded keys
    bias = jnp.asarray(bias)
    want = _einsum_reference(q, k, v, bias, 1.0 / np.sqrt(d))
    got = flash_sdpa(q, k, v, bias, block_q=32, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_block_skipping():
    """Fully-masked kv blocks are skipped; result equals attention over the
    valid prefix only."""
    b, h, lq, lk, d = 1, 1, 32, 256, 32
    q, k, v = _rand((b, h, lq, d)), _rand((b, h, lk, d)), _rand((b, h, lk, d))
    bias = np.zeros((b, lk), np.float32)
    bias[:, 64:] = NEG_INF  # only the first of four 64-blocks valid
    bias = jnp.asarray(bias)
    got = flash_sdpa(q, k, v, bias, block_q=32, block_k=64, interpret=True)
    want = _einsum_reference(
        q, k[:, :, :64], v[:, :, :64], bias[:, :64], 1.0 / np.sqrt(d)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16_matches_einsum_semantics():
    """bf16 inputs: probs are cast to bf16 before AV exactly like the
    einsum path, so both formulations agree tightly even in bf16."""
    b, h, lq, lk, d = 1, 2, 64, 64, 32
    q = _rand((b, h, lq, d), jnp.bfloat16)
    k = _rand((b, h, lk, d), jnp.bfloat16)
    v = _rand((b, h, lk, d), jnp.bfloat16)
    bias = jnp.zeros((b, lk), jnp.float32)
    want = _einsum_reference(q, k, v, bias, 1.0 / np.sqrt(d))
    got = flash_sdpa(q, k, v, bias, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_flash_grad_matches_einsum():
    b, h, lq, lk, d = 1, 1, 32, 64, 16
    q, k, v = _rand((b, h, lq, d)), _rand((b, h, lk, d)), _rand((b, h, lk, d))
    bias = jnp.zeros((b, lk), jnp.float32)

    def loss_flash(q, k, v):
        o = flash_sdpa(q, k, v, bias, block_q=32, block_k=32, interpret=True)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = _einsum_reference(q, k, v, bias, 1.0 / np.sqrt(d))
        return jnp.sum(o * o)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("b,h,lq,lk,d", [
    (1, 8, 96, 160, 32),    # fusion-encoder head config (4 heads/group)
    (2, 4, 64, 224, 64),    # 2 heads/group, kv longer than q, batch 2
    (1, 8, 64, 96, 16),     # 8 heads/group
])
def test_flash_packed_matches_einsum(b, h, lq, lk, d):
    """Head-packed transposed kernel (full-lane MXU at head_dim < 128)."""
    q, k, v = _rand((b, h, lq, d)), _rand((b, h, lk, d)), _rand((b, h, lk, d))
    bias = np.zeros((b, lk), np.float32)
    bias[:, lk - 17:] = NEG_INF  # padded keys
    bias = jnp.asarray(bias)
    want = _einsum_reference(q, k, v, bias, 1.0 / np.sqrt(d))
    got = flash_sdpa_packed(q, k, v, bias, block_q=32, block_k=64,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # the public entry dispatches head-packable shapes to the same kernel
    via_entry = flash_sdpa(q, k, v, bias, block_q=32, block_k=64,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(via_entry), np.asarray(got),
                               atol=2e-6, rtol=2e-6)


def test_flash_packed_block_skipping():
    b, h, lq, lk, d = 1, 4, 32, 256, 32
    q, k, v = _rand((b, h, lq, d)), _rand((b, h, lk, d)), _rand((b, h, lk, d))
    bias = np.zeros((b, lk), np.float32)
    bias[:, 64:] = NEG_INF
    bias = jnp.asarray(bias)
    got = flash_sdpa_packed(q, k, v, bias, block_q=32, block_k=64,
                            interpret=True)
    want = _einsum_reference(
        q, k[:, :, :64], v[:, :, :64], bias[:, :64], 1.0 / np.sqrt(d)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_packed_bf16_semantics():
    b, h, lq, lk, d = 1, 4, 64, 64, 32
    q = _rand((b, h, lq, d), jnp.bfloat16)
    k = _rand((b, h, lk, d), jnp.bfloat16)
    v = _rand((b, h, lk, d), jnp.bfloat16)
    bias = jnp.zeros((b, lk), jnp.float32)
    want = _einsum_reference(q, k, v, bias, 1.0 / np.sqrt(d))
    got = flash_sdpa_packed(q, k, v, bias, block_q=32, block_k=32,
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("b,h,lq,lk,d", [
    (1, 1, 32, 64, 16),     # per-head fwd path
    (1, 4, 96, 160, 32),    # packed fwd path, padding both axes
    (2, 2, 64, 224, 64),    # packed fwd, kv >> q, batch 2
])
def test_flash_pallas_backward_matches_einsum(b, h, lq, lk, d):
    """The Pallas dq/dkv kernels (logsumexp-residual recompute) agree with
    autodiff through the einsum reference, including masked keys."""
    q, k, v = _rand((b, h, lq, d)), _rand((b, h, lk, d)), _rand((b, h, lk, d))
    bias = np.zeros((b, lk), np.float32)
    bias[:, lk - 33:] = NEG_INF
    bias = jnp.asarray(bias)
    gout = _rand((b, h, lq, d))

    def loss_flash(q, k, v):
        o = flash_sdpa(q, k, v, bias, block_q=32, block_k=64, interpret=True)
        return jnp.sum(o * gout)

    def loss_ref(q, k, v):
        o = _einsum_reference(q, k, v, bias, 1.0 / np.sqrt(d))
        return jnp.sum(o * gout)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


def test_sdpa_flash_routing_rules():
    """Routing: large key-padding-masked shapes are flash-eligible on TPU
    only; biases, small shapes, and full masks stay on the einsum path."""
    from efficientsam3_tpu.models.common import _flash_eligible

    big_q = jnp.zeros((1, 8, 5216, 32), jnp.bfloat16)
    small_q = jnp.zeros((1, 8, 200, 32), jnp.bfloat16)
    kpm = jnp.ones((1, 1, 1, 5216), bool)
    full_mask = jnp.ones((1, 8, 5216, 5216), bool)
    bias = jnp.zeros((1, 8, 5216, 5216))

    on_tpu = jax.default_backend() == "tpu"
    assert _flash_eligible(big_q, big_q, None, None) == on_tpu
    assert _flash_eligible(big_q, big_q, kpm, None) == on_tpu
    # full (Lq, Lk) masks and additive biases: einsum path
    assert not _flash_eligible(big_q, big_q, full_mask, None)
    assert not _flash_eligible(big_q, big_q, None, bias)
    # small score matrices: einsum path
    assert not _flash_eligible(small_q, big_q, None, None)
    # env kill-switch
    import os

    os.environ["EFFICIENTSAM3_NO_FLASH"] = "1"
    try:
        assert not _flash_eligible(big_q, big_q, None, None)
    finally:
        del os.environ["EFFICIENTSAM3_NO_FLASH"]


@pytest.mark.parametrize("b,h,lq,lk,dk,dv", [
    (2, 1, 96, 224, 64, 16),   # cross-attention, narrow values, padding
    (1, 1, 64, 128, 32, 8),
])
def test_flash_memattn_matches_einsum(b, h, lq, lk, dk, dv):
    from efficientsam3_tpu.ops.pallas.flash_attention import flash_memattn

    q, k = _rand((b, h, lq, dk)), _rand((b, h, lk, dk))
    v = _rand((b, h, lk, dv))
    bias = np.zeros((b, lk), np.float32)
    bias[:, lk - 13:] = NEG_INF
    bias = jnp.asarray(bias)
    # einsum reference with narrow v (same semantics: probs cast to v dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dk)
    logits = logits + bias[:, None, None, :]
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    got = flash_memattn(q, k, v, bias, block_q=32, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_memattn_block_skipping_and_bf16():
    from efficientsam3_tpu.ops.pallas.flash_attention import flash_memattn

    b, h, lq, lk, dk, dv = 1, 1, 32, 256, 64, 16
    q = _rand((b, h, lq, dk), jnp.bfloat16)
    k = _rand((b, h, lk, dk), jnp.bfloat16)
    v = _rand((b, h, lk, dv), jnp.bfloat16)
    bias = np.zeros((b, lk), np.float32)
    bias[:, 64:] = NEG_INF  # only the first of four 64-blocks valid
    bias = jnp.asarray(bias)
    got = flash_memattn(q, k, v, bias, block_q=32, block_k=64, interpret=True)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q[:, :, :, :], k[:, :, :64],
        preferred_element_type=jnp.float32) / np.sqrt(dk)
    probs = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
    want = jnp.einsum("bhqk,bhkd->bhqd", probs, v[:, :, :64])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("b,h,lq,hw", [
    (1, 2, 33, (6, 9)),    # odd NQ (200 queries + presence), kv padding
    (2, 4, 64, (8, 8)),
])
def test_flash_xattn_rpb_matches_einsum(b, h, lq, hw):
    """Decomposed boxRPB kernel == einsum with the materialized outer-sum
    bias (the decoder's image cross-attention, decoder.py:333-415)."""
    from efficientsam3_tpu.ops.pallas.flash_attention import flash_xattn_rpb

    hi, wi = hw
    lk = hi * wi
    d = 32
    q, k, v = _rand((b, h, lq, d)), _rand((b, h, lk, d)), _rand((b, h, lk, d))
    ey = _rand((b, h, lq, hi)) * 2.0
    ex = _rand((b, h, lq, wi)) * 2.0
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    bias = (ey[..., :, None] + ex[..., None, :]).reshape(b, h, lq, lk)
    probs = jax.nn.softmax(logits + bias, axis=-1)
    want = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    got = flash_xattn_rpb(q, k, v, ey, ex, hw, block_q=32, block_k=32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_flash_xattn_rpb_bf16():
    from efficientsam3_tpu.ops.pallas.flash_attention import flash_xattn_rpb

    b, h, lq, (hi, wi) = 1, 2, 16, (4, 8)
    lk, d = hi * wi, 32
    q = _rand((b, h, lq, d), jnp.bfloat16)
    k = _rand((b, h, lk, d), jnp.bfloat16)
    v = _rand((b, h, lk, d), jnp.bfloat16)
    ey, ex = _rand((b, h, lq, hi)), _rand((b, h, lq, wi))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(d)
    bias = (ey[..., :, None] + ex[..., None, :]).reshape(b, h, lq, lk)
    probs = jax.nn.softmax(logits + bias, axis=-1).astype(jnp.bfloat16)
    want = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    got = flash_xattn_rpb(q, k, v, ey, ex, (hi, wi), block_q=16, block_k=32,
                          interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("b,h,lq,lk,dk,dv", [
    (2, 1, 96, 256, 64, 16),
    (1, 1, 64, 128, 32, 8),
])
def test_flash_memattn_q8_matches_dequant_einsum(b, h, lq, lk, dk, dv):
    """int8 kernel == einsum over the SAME quantized operands (exact up to
    f32 accumulation order), and ~1e-2 of the unquantized answer."""
    from efficientsam3_tpu.ops.pallas.flash_attention import (
        flash_memattn_q8,
        quantize_rows,
    )

    q, k = _rand((b, h, lq, dk)), _rand((b, h, lk, dk))
    v = _rand((b, h, lk, dv))
    bias = np.zeros((b, lk), np.float32)
    bias[:, lk - 13:] = NEG_INF
    bias = jnp.asarray(bias)

    k_i8, ks = quantize_rows(k)
    got = flash_memattn_q8(
        q, k_i8, ks[..., 0][:, 0], v, bias, block_q=32, block_k=64,
        interpret=True,
    )

    # reference: einsum over the kernel's own quantized operands
    qi, qs = quantize_rows(q, scale_mul=1.0 / np.sqrt(dk))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qi.astype(jnp.float32), k_i8.astype(jnp.float32),
    ) * qs * ks.swapaxes(-1, -2)  # (B,H,Lq,Lk)
    logits = logits + bias[:, None, None, :]
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)

    # and close to the UNquantized attention (the serving-mode guarantee)
    exact_logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
    ) / np.sqrt(dk) + bias[:, None, None, :]
    exact = jnp.einsum(
        "bhqk,bhkd->bhqd", jax.nn.softmax(exact_logits, -1), v
    )
    err = np.abs(np.asarray(got) - np.asarray(exact))
    scale = np.abs(np.asarray(exact)).max()
    assert err.max() / scale < 2e-2, err.max() / scale


def test_flash_memattn_q8_lse_merges_like_bf16():
    """The q8 kernel's LSE output must merge segments exactly like the
    bf16 kernel's (same convention: -inf for fully-masked queries)."""
    from efficientsam3_tpu.ops.pallas.flash_attention import (
        flash_memattn,
        flash_memattn_q8,
        quantize_rows,
    )

    b, h, lq, lk, dk, dv = 1, 1, 32, 128, 32, 8
    q, k = _rand((b, h, lq, dk)), _rand((b, h, lk, dk))
    v = _rand((b, h, lk, dv))
    bias = np.zeros((b, lk), np.float32)
    bias[:, 64:] = NEG_INF
    bias = jnp.asarray(bias)
    o16, l16 = flash_memattn(q, k, v, bias, block_q=32, block_k=64,
                             interpret=True, return_lse=True)
    k_i8, ks = quantize_rows(k)
    o8, l8 = flash_memattn_q8(q, k_i8, ks[..., 0][:, 0], v, bias,
                              block_q=32, block_k=64, interpret=True,
                              return_lse=True)
    assert o8.shape == o16.shape and l8.shape == l16.shape
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l16), atol=5e-2)
    np.testing.assert_allclose(np.asarray(o8, np.float32),
                               np.asarray(o16, np.float32), atol=5e-2)
