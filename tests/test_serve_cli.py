"""HTTP serving front-end (cli/serve.py): routes must return per-request
results that match the offline batch APIs, validate inputs with 400s,
expose health/stats, and coalesce concurrent clients through the
dynamic-batching services.

The reference has no serving surface (SURVEY §1 L7); beyond-parity.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.cli.serve import make_server
from spmm_tpu.serving import Pv2SmilesService, Smiles2PvService

TINY = dict(
    vocab_size=300, hidden_size=48, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=96, max_position_embeddings=128,
    type_vocab_size=2, fusion_layer=2, encoder_width=48,
)


@pytest.fixture(scope="module")
def served():
    from spmm_tpu.chem.normalize import PropertyStats
    from spmm_tpu.models.spmm import init_spmm_params
    from spmm_tpu.tokenizer import SmilesTokenizer

    text_cfg = BertArchConfig(**TINY, add_cross_attention=True)
    prop_cfg = BertArchConfig(
        **{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
        add_cross_attention=False)
    params = init_spmm_params(jax.random.PRNGKey(11), text_cfg=text_cfg,
                              prop_cfg=prop_cfg, with_pretrain_heads=True)
    te = params["text_encoder"]
    te["mlm_head"]["decoder"]["b"] = (
        te["mlm_head"]["decoder"]["b"].at[3].add(2.0))
    tok = SmilesTokenizer()
    stats = PropertyStats.load()
    services = {
        "pv2smiles": Pv2SmilesService(
            params, tok, k=2, batch_size=4, max_wait_ms=30.0,
            text_cfg=text_cfg, prop_cfg=prop_cfg),
        "smiles2pv": Smiles2PvService(
            params, tok, stats=stats, batch_size=4, max_wait_ms=30.0,
            max_len=24, text_cfg=text_cfg, prop_cfg=prop_cfg),
    }
    server = make_server(services, "127.0.0.1", 0, stats=stats)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, params, tok, stats, text_cfg, prop_cfg
    server.shutdown()
    for svc in services.values():
        svc.close()


def _post(url: str, path: str, payload: dict):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(served):
    url = served[0]
    with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
        body = json.loads(resp.read())
    assert resp.status == 200 and body["ok"]
    assert set(body["services"]) == {"pv2smiles", "smiles2pv"}


def test_pv2smiles_route_matches_offline(served):
    from spmm_tpu.inference.pv2smiles import generate_batched

    url, params, tok, stats, text_cfg, prop_cfg = served
    pvs = np.random.default_rng(0).normal(size=(3, 53)).astype(np.float32)
    want = generate_batched(params, tok, pvs, k=2, seed=0, device_batch=4,
                            text_cfg=text_cfg, prop_cfg=prop_cfg)
    got = []
    for pv in pvs:
        status, body = _post(url, "/pv2smiles",
                             {"pv": [float(v) for v in pv],
                              "normalized": True})
        assert status == 200
        got.append(body["smiles"])
    assert got == want
    # raw-PV path (server-side normalization): valid request, string out
    raw = stats.denormalize(pvs[0])
    status, body = _post(url, "/pv2smiles", {"pv": [float(v) for v in raw]})
    assert status == 200 and isinstance(body["smiles"], str)


def test_smiles2pv_route_matches_offline(served):
    from spmm_tpu.inference.smiles2pv import predict_pv

    url, params, tok, stats, text_cfg, prop_cfg = served
    smiles = ["CCO", "c1ccccc1"]
    ids, mask = tok.encode_batch(["[CLS]" + s for s in smiles],
                                 max_len=24, buckets=(24,))
    ids = np.pad(ids, [(0, 2), (0, 0)])
    mask = np.pad(mask, [(0, 2), (0, 0)])
    want = stats.denormalize(np.asarray(predict_pv(
        params, ids, mask, text_cfg=text_cfg, prop_cfg=prop_cfg))[:2])
    for i, s in enumerate(smiles):
        status, body = _post(url, "/smiles2pv", {"smiles": s})
        assert status == 200 and len(body["pv"]) == 53
        np.testing.assert_allclose(np.asarray(body["pv"], np.float32),
                                   want[i], atol=1e-4, rtol=1e-4)


def test_pv2smiles_route_partial_conditioning(served):
    """null pv entries and an explicit mask both leave properties
    unconstrained (reference d_pv2smiles_single.py:60-66), and masked
    slots' values are inert."""
    url = served[0]
    pv = [float(v) for v in
          np.random.default_rng(5).normal(size=53).astype(np.float32)]
    nulled = pv[:20] + [None] * 33
    status, body = _post(url, "/pv2smiles",
                         {"pv": nulled, "normalized": True})
    assert status == 200 and isinstance(body["smiles"], str)
    # explicit mask over placeholder values == nulls
    mask = [0] * 20 + [1] * 33
    status2, body2 = _post(url, "/pv2smiles",
                           {"pv": pv[:20] + [0.0] * 33, "mask": mask,
                            "normalized": True})
    assert status2 == 200 and body2["smiles"] == body["smiles"]
    # masked values are inert even when wild
    status3, body3 = _post(url, "/pv2smiles",
                           {"pv": pv[:20] + [1e6] * 33, "mask": mask,
                            "normalized": True})
    assert status3 == 200 and body3["smiles"] == body["smiles"]
    # raw-PV path normalizes only through the unmasked slots (placeholders
    # are zeroed after normalization): request is valid with nulls too
    status4, body4 = _post(url, "/pv2smiles", {"pv": nulled})
    assert status4 == 200 and isinstance(body4["smiles"], str)


def test_validation_errors(served):
    url = served[0]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/pv2smiles", {"pv": [1.0, 2.0]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/pv2smiles",
              {"pv": [1.0] * 53, "mask": [1] * 5, "normalized": True})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/pv2smiles",
              {"pv": [1.0] * 53, "mask": [0.5] * 53, "normalized": True})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/smiles2pv", {"smiles": ""})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/nope", {})
    assert e.value.code == 404


def test_concurrent_clients_coalesce(served):
    url = served[0]
    pvs = np.random.default_rng(1).normal(size=(4, 53)).astype(np.float32)
    out = {}

    def client(i):
        status, body = _post(url, "/pv2smiles",
                             {"pv": [float(v) for v in pvs[i]],
                              "normalized": True})
        out[i] = (status, body["smiles"])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(out[i][0] == 200 and isinstance(out[i][1], str)
               for i in range(4))
