"""Serving layer (spmm_tpu/serving.py): the dynamic-batching front-end must
preserve per-request results exactly (padding and coalescing are invisible
to callers), flush short batches on the wait deadline, propagate batch
failures to every affected future, and match the offline batch APIs on the
generation workloads.

The reference has no serving surface (every d_*.py is an offline script,
SURVEY §1 L7); beyond-parity capability.
"""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.serving import BatchingService, Pv2SmilesService, Smiles2PvService

TINY = dict(
    vocab_size=300, hidden_size=48, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=96, max_position_embeddings=128,
    type_vocab_size=2, fusion_layer=2, encoder_width=48,
)


# --------------------------------------------------------------------------- #
# generic coalescer
# --------------------------------------------------------------------------- #


def test_results_in_order_and_batched():
    seen_sizes = []

    def batch_fn(items, n):
        seen_sizes.append(len(items))
        return [x * 2 for x in items]

    with BatchingService(batch_fn, batch_size=4, max_wait_ms=200.0) as svc:
        out = svc.map(list(range(10)))
    assert out == [x * 2 for x in range(10)]
    # every call sees EXACTLY batch_size items (padded)
    assert all(s == 4 for s in seen_sizes)
    assert svc.stats["requests"] == 10
    # 10 requests at batch 4 need >= 3 launches; coalescing may not be
    # perfect (submission races the worker) but must be bounded
    assert 3 <= svc.stats["batches"] <= 10


def test_timeout_flushes_short_batch():
    def batch_fn(items, n):
        return list(items)

    svc = BatchingService(batch_fn, batch_size=64, max_wait_ms=30.0)
    try:
        t0 = time.monotonic()
        fut = svc.submit("lone")
        assert fut.result(timeout=5.0) == "lone"
        # resolved by the deadline flush, far before any 64-batch fills
        assert time.monotonic() - t0 < 2.0
        assert svc.stats["padded_slots"] >= 63
    finally:
        svc.close()


def test_exception_propagates_to_all_futures():
    def batch_fn(items, n):
        raise RuntimeError("device on fire")

    svc = BatchingService(batch_fn, batch_size=2, max_wait_ms=10.0)
    try:
        futs = [svc.submit(i) for i in range(2)]
        for f in futs:
            with pytest.raises(RuntimeError, match="device on fire"):
                f.result(timeout=5.0)
    finally:
        svc.close()


def test_close_drains_then_rejects():
    def batch_fn(items, n):
        time.sleep(0.01)
        return list(items)

    svc = BatchingService(batch_fn, batch_size=4, max_wait_ms=5.0)
    futs = [svc.submit(i) for i in range(9)]
    svc.close()
    assert [f.result(timeout=5.0) for f in futs] == list(range(9))
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(1)


def test_concurrent_submitters():
    def batch_fn(items, n):
        return [x + 1 for x in items]

    results = {}

    with BatchingService(batch_fn, batch_size=8, max_wait_ms=20.0) as svc:
        def client(base):
            results[base] = [svc.submit(base + i).result(timeout=10.0)
                             for i in range(5)]

        threads = [threading.Thread(target=client, args=(b,))
                   for b in (0, 100, 200)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for base in (0, 100, 200):
        assert results[base] == [base + i + 1 for i in range(5)]


# --------------------------------------------------------------------------- #
# model-backed services
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def tiny_model():
    from spmm_tpu.models.spmm import init_spmm_params
    from spmm_tpu.tokenizer import SmilesTokenizer

    text_cfg = BertArchConfig(**TINY, add_cross_attention=True)
    prop_cfg = BertArchConfig(
        **{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
        add_cross_attention=False)
    params = init_spmm_params(jax.random.PRNGKey(11), text_cfg=text_cfg,
                              prop_cfg=prop_cfg, with_pretrain_heads=True)
    # bias SEP so beams finish fast
    te = params["text_encoder"]
    te["mlm_head"]["decoder"]["b"] = (
        te["mlm_head"]["decoder"]["b"].at[3].add(2.0))
    return params, SmilesTokenizer(), text_cfg, prop_cfg


def test_pv2smiles_service_matches_offline(tiny_model):
    from spmm_tpu.inference.pv2smiles import generate_batched

    params, tok, text_cfg, prop_cfg = tiny_model
    pvs = np.random.default_rng(0).normal(size=(8, 53)).astype(np.float32)
    want = generate_batched(params, tok, pvs, k=2, seed=0, device_batch=8,
                            text_cfg=text_cfg, prop_cfg=prop_cfg)
    with Pv2SmilesService(params, tok, k=2, batch_size=8, max_wait_ms=50.0,
                          text_cfg=text_cfg, prop_cfg=prop_cfg) as svc:
        got = svc.map(list(pvs))
        # ragged second wave: deterministic beams are row-independent, so a
        # padded 5-batch must reproduce the full-batch results
        ragged = svc.map(list(pvs[:5]))
    assert got == want
    assert ragged == want[:5]


def test_pv2smiles_service_mask_conditioning(tiny_model):
    """Partial conditioning (reference d_pv2smiles_single.py:60-66): a
    (pv, mask) item conditions only on the unmasked slots.  An all-zero
    mask must be bit-identical to a bare pv (mask-blend with 0 is exact in
    fp32), and masked slots' VALUES must be inert — including NaN."""
    params, tok, text_cfg, prop_cfg = tiny_model
    rng = np.random.default_rng(3)
    pvs = rng.normal(size=(4, 53)).astype(np.float32)
    zero = np.zeros(53, np.float32)
    mask = np.zeros(53, np.float32)
    mask[20:] = 1.0
    scrambled = pvs.copy()
    scrambled[:, 20:] = 1e6
    scrambled[:, 20] = np.nan          # a NaN in a masked slot must be inert
    with Pv2SmilesService(params, tok, k=2, batch_size=4, max_wait_ms=50.0,
                          text_cfg=text_cfg, prop_cfg=prop_cfg) as svc:
        plain = svc.map(list(pvs))
        tupled = svc.map([(pv, zero) for pv in pvs])
        masked = svc.map([(pv, mask) for pv in pvs])
        masked_scrambled = svc.map([(pv, mask) for pv in scrambled])
        # mixed batches coalesce: masked and unmasked requests in ONE batch
        mixed = svc.map([pvs[0], (pvs[1], mask), pvs[2], (pvs[3], mask)])
    assert tupled == plain
    assert masked == masked_scrambled
    assert all(isinstance(s, str) for s in masked)
    assert mixed == [plain[0], masked[1], plain[2], masked[3]]


def test_pv2smiles_service_stochastic_mode(tiny_model):
    """Single-query sampling mode: multinomial expansion + k**2 stop +
    uniform pick among finished beams — results are strings and the run is
    reproducible for a fixed seed."""
    params, tok, text_cfg, prop_cfg = tiny_model
    pvs = np.random.default_rng(2).normal(size=(4, 53)).astype(np.float32)

    def run():
        with Pv2SmilesService(params, tok, k=2, stochastic=True, seed=7,
                              batch_size=4, max_wait_ms=50.0,
                              text_cfg=text_cfg, prop_cfg=prop_cfg) as svc:
            return svc.map(list(pvs))

    first, second = run(), run()
    assert all(isinstance(s, str) for s in first)
    assert first == second          # same seed, same batching -> same draws


def test_smiles2pv_service_matches_offline(tiny_model):
    from spmm_tpu.inference.smiles2pv import predict_pv

    params, tok, text_cfg, prop_cfg = tiny_model
    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CC1"]
    texts = ["[CLS]" + s for s in smiles]
    ids, mask = tok.encode_batch(texts, max_len=24, buckets=(24,))
    ids = np.pad(ids, [(0, 3), (0, 0)])
    mask = np.pad(mask, [(0, 3), (0, 0)])
    want = np.asarray(predict_pv(params, jnp.asarray(ids), jnp.asarray(mask),
                                 text_cfg=text_cfg, prop_cfg=prop_cfg))[:5]
    with Smiles2PvService(params, tok, batch_size=8, max_wait_ms=50.0,
                          max_len=24, text_cfg=text_cfg,
                          prop_cfg=prop_cfg) as svc:
        got = np.stack(svc.map(smiles))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
