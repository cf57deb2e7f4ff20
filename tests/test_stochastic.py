"""Distributional test: Gumbel top-k sampling == torch.multinomial without
replacement (the reference's stochastic beam sampler,
d_pv2smiles_single.py:40-41)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.inference.decoding import _sample_topk


def test_gumbel_topk_marginals_match_multinomial():
    """First-draw marginals must follow the categorical distribution; the
    selected values must be log softmax probabilities of the picked tokens."""
    logits = jnp.asarray(np.log([0.5, 0.25, 0.15, 0.1]).astype("f4") * 2.0)
    p = np.asarray(jax.nn.softmax(logits))

    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    vals, idx = jax.vmap(
        lambda k: _sample_topk(logits, 2, True, k))(keys)
    idx = np.asarray(idx)
    vals = np.asarray(vals)

    # first draw ~ categorical(p)
    counts = np.bincount(idx[:, 0], minlength=4) / n
    np.testing.assert_allclose(counts, p, atol=4 * np.sqrt(p * (1 - p) / n).max())
    # without replacement: the two picks always differ
    assert (idx[:, 0] != idx[:, 1]).all()
    # reported values are the (unconditioned) log-probs of the picks
    logp = np.asarray(jax.nn.log_softmax(logits))
    np.testing.assert_allclose(vals, logp[idx], atol=1e-6)


def test_deterministic_topk():
    logits = jnp.asarray([0.1, 3.0, -1.0, 2.0])
    vals, idx = _sample_topk(logits, 2, False, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(idx), [1, 3])
    logp = np.asarray(jax.nn.log_softmax(logits))
    np.testing.assert_allclose(np.asarray(vals), logp[[1, 3]], atol=1e-6)
