"""Pallas fused beam-decode attention vs the XLA path (_beam_attention).

Runs the kernel in interpret mode on CPU (tests/conftest.py mesh); the same
code compiles for TPU.  The kernel must (a) produce the identical context
vector as the XLA formulation and (b) append k_new/v_new into the cache at
``pos`` in place, leaving every other position untouched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.inference.decoding import _ancestry_mask, _beam_attention
from spmm_tpu.ops.decode_attention import beam_decode_attention


def fold_cache(unfolded, fd):
    """[2, L, m, h, k, T, d] -> lane-folded [2, L, m, h, T, FD]."""
    two, L, m, h, k, T, d = unfolded.shape
    folded = jnp.moveaxis(unfolded, 4, 5).reshape(two, L, m, h, T, k * d)
    return jnp.pad(folded, [(0, 0)] * 5 + [(0, fd - k * d)])


@pytest.mark.parametrize("k", [2, 5])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla(k, dtype):
    from spmm_tpu.ops.decode_attention import fold_dim

    m, h, L, T, d = 4, 3, 2, 24, 64
    layer, pos = 1, 11
    fd = fold_dim(k, d)
    rng = np.random.default_rng(0)

    unfolded = jnp.asarray(rng.normal(size=(2, L, m, h, k, T, d)), dtype)
    cache = fold_cache(unfolded, fd)
    q = jnp.asarray(rng.normal(size=(m, h, k, d)), dtype)
    kn = jnp.asarray(rng.normal(size=(m, h, k, d)), dtype)
    vn = jnp.asarray(rng.normal(size=(m, h, k, d)), dtype)

    # ancestry: random parents for written positions, own lane beyond
    anc = jnp.asarray(rng.integers(0, k, size=(m, k, T)), jnp.int32)
    key_valid = (jnp.arange(T)[None, None, :] <
                 jnp.asarray(rng.integers(pos - 2, pos + 1, size=(m, k, 1))))
    prefix_valid = key_valid & (jnp.arange(T)[None, None, :] < pos)
    mask5 = _ancestry_mask(anc, prefix_valid.astype(jnp.int32))  # [m,1,k,k,T]

    want_ctx = _beam_attention(
        q, unfolded[0, layer], unfolded[1, layer], mask5, kn, vn)

    ctx, new_cache = beam_decode_attention(
        q, kn, vn, cache, mask5[:, 0].astype(jnp.float32),
        jnp.int32(pos), layer=layer, block_m=2, interpret=True)

    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(ctx, np.float32),
                               np.asarray(want_ctx, np.float32),
                               atol=tol, rtol=tol)

    # cache updated exactly at (layer, pos); the aligned append window may
    # rewrite rows pos+1..window-end with the (junk) values it read back, so
    # only positions <= pos are required untouched
    expect_unf = np.asarray(unfolded).copy()
    expect_unf[0, layer, :, :, :, pos, :] = np.asarray(kn)
    expect_unf[1, layer, :, :, :, pos, :] = np.asarray(vn)
    expect = np.asarray(fold_cache(jnp.asarray(expect_unf), fd))
    got_c = np.asarray(new_cache)
    np.testing.assert_array_equal(got_c[:, :, :, :, : pos + 1],
                                  expect[:, :, :, :, : pos + 1])
    np.testing.assert_array_equal(got_c[:, : layer], expect[:, : layer])
    np.testing.assert_array_equal(got_c[:, layer + 1:], expect[:, layer + 1:])


def test_kernel_fp8_cache():
    """fp8 KV cache: kernel must match the XLA formulation computed over the
    SAME quantized cache values (fp8 upcasts exactly, so the only rounding
    is at storage), and the append must store e4m3-quantized K/V."""
    from spmm_tpu.ops.decode_attention import fold_dim

    fp8 = jnp.float8_e4m3fn
    k = 2
    m, h, L, T, d = 4, 3, 2, 24, 64
    layer, pos = 1, 11
    fd = fold_dim(k, d)
    rng = np.random.default_rng(3)

    unfolded = jnp.asarray(rng.normal(size=(2, L, m, h, k, T, d)),
                           jnp.bfloat16).astype(fp8)
    cache = fold_cache(unfolded, fd)
    q = jnp.asarray(rng.normal(size=(m, h, k, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(m, h, k, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(m, h, k, d)), jnp.bfloat16)

    anc = jnp.asarray(rng.integers(0, k, size=(m, k, T)), jnp.int32)
    key_valid = (jnp.arange(T)[None, None, :] <
                 jnp.asarray(rng.integers(pos - 2, pos + 1, size=(m, k, 1))))
    prefix_valid = key_valid & (jnp.arange(T)[None, None, :] < pos)
    mask5 = _ancestry_mask(anc, prefix_valid.astype(jnp.int32))

    want_ctx = _beam_attention(
        q, unfolded[0, layer].astype(q.dtype),
        unfolded[1, layer].astype(q.dtype), mask5, kn, vn)

    ctx, new_cache = beam_decode_attention(
        q, kn, vn, cache, mask5[:, 0].astype(jnp.float32),
        jnp.int32(pos), layer=layer, block_m=2, interpret=True)

    np.testing.assert_allclose(np.asarray(ctx, np.float32),
                               np.asarray(want_ctx, np.float32),
                               atol=2e-2, rtol=2e-2)
    got_row = np.asarray(
        new_cache[0, layer, :, :, pos, : k * d].astype(jnp.float32))
    want_row = np.asarray(
        jnp.moveaxis(kn.astype(fp8), 2, -2).reshape(m, h, k * d)
        .astype(jnp.float32))
    np.testing.assert_array_equal(got_row, want_row)


def test_beam_search_fp8_pallas_matches_xla():
    """Full beam search with a float8_e4m3fn cache: the pallas path must
    reproduce the XLA path exactly (both quantize appended rows the same
    way; fp8 values upcast exactly)."""
    import dataclasses

    from spmm_tpu.configs import BertArchConfig
    from spmm_tpu.inference.decoding import BeamSpec, beam_search_batched
    from spmm_tpu.models import bert as jbert

    cfg = BertArchConfig(
        vocab_size=300, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2, fusion_layer=1,
        encoder_width=64, add_cross_attention=True)
    rng = jax.random.PRNGKey(7)
    params = jbert.init_mlm_params(rng, cfg)
    m = 4
    enc = jax.random.normal(jax.random.fold_in(rng, 1), (m, 6, cfg.hidden_size))
    enc_mask = jnp.ones((m, 6), jnp.int32)
    rngs = jax.random.split(jax.random.fold_in(rng, 2), m)

    spec = BeamSpec(k=2, stop_count=4, stochastic=False, max_steps=12,
                    attention="xla")
    f = jax.jit(beam_search_batched,
                static_argnames=("cfg", "spec", "cache_dtype"))
    want = jax.device_get(f(params, cfg, enc, enc_mask, spec, rngs,
                            cache_dtype=jnp.float8_e4m3fn))
    got = jax.device_get(f(params, cfg, enc, enc_mask,
                           dataclasses.replace(spec, attention="pallas"),
                           rngs, cache_dtype=jnp.float8_e4m3fn))
    np.testing.assert_array_equal(got["seqs"], want["seqs"])
    # the kernel's probs@V runs in bf16 whenever the cache is fp8, while the
    # fp32-model XLA path accumulates in fp32 — logp drifts ~1e-3/step
    np.testing.assert_allclose(got["logp"], want["logp"], atol=0.05)
    np.testing.assert_array_equal(got["n_finished"], want["n_finished"])


def test_beam_search_pallas_matches_xla():
    """Full beam_search_batched: attention='pallas' (interpret mode on CPU)
    must reproduce the XLA path exactly — seqs, logp, harvest counts."""
    import dataclasses

    from spmm_tpu.configs import BertArchConfig
    from spmm_tpu.inference.decoding import BeamSpec, beam_search_batched
    from spmm_tpu.models import bert as jbert

    cfg = BertArchConfig(
        vocab_size=300, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2, fusion_layer=1,
        encoder_width=64, add_cross_attention=True)
    rng = jax.random.PRNGKey(0)
    params = jbert.init_mlm_params(rng, cfg)
    params["mlm_head"]["decoder"]["b"] = (
        params["mlm_head"]["decoder"]["b"].at[3].add(2.0))
    m = 4
    enc = jax.random.normal(jax.random.fold_in(rng, 1), (m, 6, cfg.hidden_size))
    enc_mask = jnp.ones((m, 6), jnp.int32)
    rngs = jax.random.split(jax.random.fold_in(rng, 2), m)

    spec = BeamSpec(k=2, stop_count=4, stochastic=False, max_steps=12,
                    attention="xla")
    f = jax.jit(beam_search_batched, static_argnames=("cfg", "spec"))
    want = jax.device_get(f(params, cfg, enc, enc_mask, spec, rngs))
    got = jax.device_get(f(params, cfg, enc, enc_mask,
                           dataclasses.replace(spec, attention="pallas"),
                           rngs))
    np.testing.assert_array_equal(got["seqs"], want["seqs"])
    np.testing.assert_allclose(got["logp"], want["logp"], atol=1e-5)
    np.testing.assert_array_equal(got["n_finished"], want["n_finished"])


def test_greedy_pallas_matches_xla():
    """greedy_decode through the kernel (k=1 beam, interpret mode) must
    reproduce the XLA path's token sequences exactly."""
    from spmm_tpu.configs import BertArchConfig
    from spmm_tpu.inference.decoding import greedy_decode
    from spmm_tpu.models import bert as jbert

    cfg = BertArchConfig(
        vocab_size=300, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2, fusion_layer=1,
        encoder_width=64, add_cross_attention=True)
    rng = jax.random.PRNGKey(21)
    params = jbert.init_mlm_params(rng, cfg)
    b = 3
    enc = jax.random.normal(jax.random.fold_in(rng, 1), (b, 5, cfg.hidden_size))
    enc_mask = jnp.ones((b, 5), jnp.int32)

    f = jax.jit(greedy_decode,
                static_argnames=("cfg", "max_steps", "attention"))
    want = jax.device_get(f(params, cfg, enc, enc_mask, max_steps=14,
                            attention="xla"))
    got = jax.device_get(f(params, cfg, enc, enc_mask, max_steps=14,
                           attention="pallas"))
    # buffers may differ in length (8-aligned for the kernel); compare the
    # decoded prefix
    n = want["seqs"].shape[1]
    np.testing.assert_array_equal(got["seqs"][:, :n], want["seqs"])
    assert int(got["steps"]) == int(want["steps"])
