"""Multi-device inference: sharding molecules over the dp mesh must produce
exactly the single-device results (north star throughput is per v5e-8,
BASELINE.md; the reference runs every d_* workload on 1 GPU — SURVEY §6).

Runs on the 8-device virtual CPU mesh forced by conftest.py (SURVEY §4c).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.inference.decoding import BeamSpec
from spmm_tpu.models import bert as jbert
from spmm_tpu.parallel.mesh import data_parallel_mesh

TINY = dict(
    vocab_size=300, hidden_size=48, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=96, max_position_embeddings=128,
    type_vocab_size=2, fusion_layer=2, encoder_width=48,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return BertArchConfig(**TINY, add_cross_attention=True)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return data_parallel_mesh(8)


def test_beam_search_sharded_matches_single(tiny_cfg, mesh):
    from spmm_tpu.inference.decoding import beam_search_batched
    from spmm_tpu.parallel.mesh import batch_sharding, replicated

    rng = jax.random.PRNGKey(0)
    params = jbert.init_mlm_params(rng, tiny_cfg)
    # bias SEP so beams finish (same trick as test_decoding)
    params["mlm_head"]["decoder"]["b"] = (
        params["mlm_head"]["decoder"]["b"].at[3].add(2.0))
    m = 16
    enc = jax.random.normal(jax.random.fold_in(rng, 1),
                            (m, 6, tiny_cfg.hidden_size))
    enc_mask = jnp.ones((m, 6), jnp.int32)
    rngs = jax.random.split(jax.random.fold_in(rng, 2), m)
    spec = BeamSpec(k=2, stop_count=4, stochastic=False, max_steps=20)

    f = jax.jit(beam_search_batched, static_argnames=("cfg", "spec"))
    single = jax.device_get(f(params, tiny_cfg, enc, enc_mask, spec, rngs))

    params_r = jax.device_put(params, replicated(mesh))
    enc_s = jax.device_put(enc, batch_sharding(mesh))
    mask_s = jax.device_put(enc_mask, batch_sharding(mesh))
    rngs_s = jax.device_put(rngs, batch_sharding(mesh))
    sharded = jax.device_get(f(params_r, tiny_cfg, enc_s, mask_s, spec,
                               rngs_s))

    np.testing.assert_array_equal(sharded["seqs"], single["seqs"])
    np.testing.assert_allclose(sharded["logp"], single["logp"], atol=1e-5)
    np.testing.assert_array_equal(sharded["n_finished"], single["n_finished"])


def test_greedy_sharded_matches_single(tiny_cfg, mesh):
    from spmm_tpu.inference.decoding import greedy_decode
    from spmm_tpu.parallel.mesh import batch_sharding, replicated

    rng = jax.random.PRNGKey(7)
    params = jbert.init_mlm_params(rng, tiny_cfg)
    b = 16
    enc = jax.random.normal(jax.random.fold_in(rng, 1),
                            (b, 5, tiny_cfg.hidden_size))
    enc_mask = jnp.ones((b, 5), jnp.int32)

    f = jax.jit(lambda p, e, m_: greedy_decode(p, tiny_cfg, e, m_,
                                               max_steps=16))
    single = jax.device_get(f(params, enc, enc_mask))
    sharded = jax.device_get(f(
        jax.device_put(params, replicated(mesh)),
        jax.device_put(enc, batch_sharding(mesh)),
        jax.device_put(enc_mask, batch_sharding(mesh))))
    np.testing.assert_array_equal(sharded["seqs"], single["seqs"])


def test_predict_pv_sharded_matches_single(tiny_cfg, mesh):
    from spmm_tpu.inference.smiles2pv import predict_pv
    from spmm_tpu.models.spmm import init_spmm_params
    from spmm_tpu.parallel.mesh import batch_sharding, replicated

    prop_cfg = BertArchConfig(
        **{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
        add_cross_attention=False)
    params = init_spmm_params(jax.random.PRNGKey(3), text_cfg=tiny_cfg,
                              prop_cfg=prop_cfg, with_pretrain_heads=False)
    b, L = 16, 12
    ids = jax.random.randint(jax.random.PRNGKey(4), (b, L), 4, 300)
    mask = jnp.ones((b, L), jnp.int32)

    single = np.asarray(predict_pv(params, ids, mask, text_cfg=tiny_cfg,
                                   prop_cfg=prop_cfg, n_properties=5))
    sharded = np.asarray(predict_pv(
        jax.device_put(params, replicated(mesh)),
        jax.device_put(ids, batch_sharding(mesh)),
        jax.device_put(mask, batch_sharding(mesh)),
        text_cfg=tiny_cfg, prop_cfg=prop_cfg, n_properties=5))
    np.testing.assert_allclose(sharded, single, atol=1e-5, rtol=0)


def test_auto_mesh_picks_up_all_devices():
    """auto_mesh must build a dp mesh over every visible device with no flag
    (the inference CLIs rely on it; north star is per v5e-8, BASELINE.md)."""
    from spmm_tpu.parallel.mesh import auto_mesh

    mesh = auto_mesh()
    assert mesh is not None and mesh.devices.size == len(jax.devices())


def test_generate_with_property_auto_mesh_smoke(tiny_cfg):
    """CLI-path smoke: the exact wrapper the pv2smiles CLIs call, with the
    auto-constructed mesh, batch padding, and host-side beam picking."""
    from spmm_tpu.inference.pv2smiles import (
        generate_batched, generate_with_property,
    )
    from spmm_tpu.models.spmm import init_spmm_params
    from spmm_tpu.parallel.mesh import auto_mesh
    from spmm_tpu.tokenizer import SmilesTokenizer

    prop_cfg = BertArchConfig(
        **{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
        add_cross_attention=False)
    params = init_spmm_params(jax.random.PRNGKey(11), text_cfg=tiny_cfg,
                              prop_cfg=prop_cfg, with_pretrain_heads=True)
    # bias SEP so beams finish fast
    te = params["text_encoder"]
    te["mlm_head"]["decoder"]["b"] = (
        te["mlm_head"]["decoder"]["b"].at[3].add(2.0))
    tok = SmilesTokenizer()
    mesh = auto_mesh()
    assert mesh is not None

    out = generate_with_property(
        params, tok, np.zeros(53, np.float32), np.ones(53, np.float32),
        n_generate=10, k=2, stochastic=True, seed=0, device_batch=16,
        mesh=mesh, text_cfg=tiny_cfg, prop_cfg=prop_cfg)
    assert len(out) == 10 and all(isinstance(s, str) for s in out)

    pvs = np.random.default_rng(0).normal(size=(10, 53)).astype(np.float32)
    out = generate_batched(params, tok, pvs, k=2, seed=0, device_batch=16,
                           mesh=mesh, text_cfg=tiny_cfg, prop_cfg=prop_cfg)
    assert len(out) == 10 and all(isinstance(s, str) for s in out)
