"""Reaction-prediction decoding (reference d_rxn_prediction.py:55-123).

Forward/retro synthesis share one model; decoding is either batch greedy
(n_beam=1) or per-sample k-beam (n_beam>1, stop_count=k**2).  Both run on the
KV-cached device kernels; the greedy path batches whole eval sets where the
reference decodes 32 molecules per Python loop, and the beam path batches
many molecules in one program where the reference does batch_size=1.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.configs import BertArchConfig, smiles_config, text_config
from spmm_tpu.inference.decoding import (
    BeamSpec, beam_search_batched, greedy_decode,
)
from spmm_tpu.models.rxn import encode_reactants
from spmm_tpu.tokenizer import SmilesTokenizer

Params = dict[str, Any]


@partial(jax.jit, static_argnames=("decoder_cfg", "encoder_cfg", "max_steps",
                                   "bf16"))
def _greedy_batch(
    params: Params,
    src_ids: jnp.ndarray,
    src_mask: jnp.ndarray,
    decoder_cfg: Optional[BertArchConfig] = None,
    encoder_cfg: Optional[BertArchConfig] = None,
    max_steps: int = 100,
    bf16: bool = True,
):
    decoder_cfg = decoder_cfg or text_config()
    encoder_cfg = encoder_cfg or smiles_config()
    enc = encode_reactants(params, encoder_cfg, src_ids, src_mask)
    dec = params["decoder"]
    cache_dtype = jnp.float32
    if bf16:
        dec = jax.tree.map(lambda x: x.astype(jnp.bfloat16), dec)
        enc = enc.astype(jnp.bfloat16)
        cache_dtype = jnp.bfloat16
    return greedy_decode(dec, decoder_cfg, enc, src_mask,
                         max_steps=max_steps, cache_dtype=cache_dtype)


@partial(jax.jit, static_argnames=("spec", "decoder_cfg", "encoder_cfg",
                                   "bf16"))
def _beam_batch(
    params: Params,
    src_ids: jnp.ndarray,
    src_mask: jnp.ndarray,
    rngs: jnp.ndarray,
    spec: BeamSpec,
    decoder_cfg: Optional[BertArchConfig] = None,
    encoder_cfg: Optional[BertArchConfig] = None,
    bf16: bool = True,
):
    decoder_cfg = decoder_cfg or text_config()
    encoder_cfg = encoder_cfg or smiles_config()
    enc = encode_reactants(params, encoder_cfg, src_ids, src_mask)
    dec = params["decoder"]
    cache_dtype = jnp.float32
    if bf16:
        dec = jax.tree.map(lambda x: x.astype(jnp.bfloat16), dec)
        enc = enc.astype(jnp.bfloat16)
        cache_dtype = jnp.bfloat16

    return beam_search_batched(dec, decoder_cfg, enc, src_mask, spec, rngs,
                               cache_dtype=cache_dtype)


def _truncate_at_sep(ids: np.ndarray, sep_id: int = 3) -> np.ndarray:
    hits = np.nonzero(ids == sep_id)[0]
    return ids[: hits[0]] if len(hits) else ids


def _pad_rows(ids: np.ndarray, mask: np.ndarray, n: int, cls_id: int = 2):
    """Pad the batch dim to n rows (pad rows decode garbage, dropped by the
    caller; required for a fixed sharded batch shape)."""
    if ids.shape[0] == n:
        return ids, mask
    pad = n - ids.shape[0]
    ids = np.pad(np.asarray(ids), [(0, pad), (0, 0)])
    ids[-pad:, 0] = cls_id                  # [CLS] so pad rows stay well-formed
    return ids, np.pad(np.asarray(mask), [(0, pad), (0, 0)])


def _mesh_put(mesh, params, arrays):
    """Replicate params / shard batch arrays over the dp mesh (see
    pv2smiles._mesh_put)."""
    from spmm_tpu.parallel.mesh import batch_sharding, replicated

    params = jax.device_put(params, replicated(mesh))
    return params, [jax.device_put(a, batch_sharding(mesh)) for a in arrays]


def predict_greedy(
    params: Params,
    tok: SmilesTokenizer,
    sources: list[str],
    batch_size: int = 32,
    max_src_len: int = 150,
    mesh=None,
) -> list[str]:
    """Batch greedy decode; sources are raw reactant strings (no [CLS]).
    With ``mesh`` molecules are sharded over its dp axis."""
    if mesh is not None:
        assert batch_size % mesh.devices.size == 0
    out: list[str] = []
    for start in range(0, len(sources), batch_size):
        batch = sources[start: start + batch_size]
        ids, mask = tok.encode_batch(
            ["[CLS]" + s for s in batch], max_len=max_src_len, truncation=False,
            buckets=(32, 64, 96, 128, max_src_len))
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        if mesh is not None:
            ids, mask = _pad_rows(np.asarray(ids), np.asarray(mask),
                                  batch_size, cls_id=tok.cls_token_id)
            params, (ids, mask) = _mesh_put(mesh, params, (ids, mask))
        res = jax.device_get(_greedy_batch(params, jnp.asarray(ids),
                                           jnp.asarray(mask)))
        for i in range(len(batch)):
            seq = _truncate_at_sep(np.asarray(res["seqs"][i]))
            out.append(tok.decode(seq))
    return out


def predict_beam(
    params: Params,
    tok: SmilesTokenizer,
    sources: list[str],
    k: int = 3,
    batch_size: int = 32,
    max_src_len: int = 150,
    seed: int = 0,
    mesh=None,
) -> list[list[str]]:
    """Per-sample k-beam decode; returns top-k candidate strings per source.
    With ``mesh`` molecules are sharded over its dp axis."""
    spec = BeamSpec(k=k, stop_count=k * k, stochastic=False)
    master = jax.random.PRNGKey(seed)
    if mesh is not None:
        assert batch_size % mesh.devices.size == 0
    out: list[list[str]] = []
    for start in range(0, len(sources), batch_size):
        batch = sources[start: start + batch_size]
        ids, mask = tok.encode_batch(
            ["[CLS]" + s for s in batch], max_len=max_src_len, truncation=False,
            buckets=(32, 64, 96, 128, max_src_len))
        n_rows = batch_size if mesh is not None else len(batch)
        ids, mask = _pad_rows(np.asarray(ids), np.asarray(mask), n_rows,
                              cls_id=tok.cls_token_id)
        rngs = jax.random.split(jax.random.fold_in(master, start), n_rows)
        if mesh is not None:
            params, (ids, mask, rngs) = _mesh_put(mesh, params,
                                                  (ids, mask, rngs))
        res = jax.device_get(_beam_batch(
            params, jnp.asarray(ids), jnp.asarray(mask), rngs, spec))
        for i in range(len(batch)):
            n_fin = int(res["n_finished"][i])
            n_avail = k if n_fin == 0 else min(k, n_fin)
            cands = []
            for j in range(n_avail):
                ln = max(int(res["lengths"][i][j]) - 1, 1)
                cands.append(tok.decode(np.asarray(res["seqs"][i][j][:ln])))
            out.append(cands)
    return out
