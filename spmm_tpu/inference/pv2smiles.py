"""PV -> SMILES k-beam generation (reference d_pv2smiles_single.py / _batched.py).

Two workloads over the same device kernel:
  - single-query: one (possibly partially masked) property vector; draw
    ``n_generate`` independent stochastic (or deterministic) k-beam searches
    (reference d_pv2smiles_single.py:55-111).  TPU: the searches are batched
    natively — hundreds of beam searches run as one XLA program, optionally
    sharded over a dp mesh.
  - batched/file mode: one PV per input molecule, NO property masking,
    deterministic k-beam with stop_count=k (reference d_pv2smiles_batched.py:
    17-59; note its k**1 stop vs the single-query k**2).

The beam kernel itself lives in spmm_tpu.inference.decoding.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.configs import BertArchConfig, property_config, text_config
from spmm_tpu.inference.decoding import BeamSpec, beam_search_batched
from spmm_tpu.models import spmm
from spmm_tpu.tokenizer import SmilesTokenizer

Params = dict[str, Any]


def encode_pv(
    params: Params,
    pv_normalized: jnp.ndarray,          # [B, 53]
    prop_mask: Optional[jnp.ndarray],    # [B, 53] 1 = masked, or None
    prop_cfg: Optional[BertArchConfig] = None,
) -> jnp.ndarray:
    """PV -> property-encoder hiddens [B, 54, H]
    (reference d_pv2smiles_single.py:69-76)."""
    prop_cfg = prop_cfg or property_config()
    inputs = spmm.embed_properties(params, pv_normalized, prop_mask)
    return spmm.encode_properties(params, prop_cfg, inputs)


@partial(jax.jit, static_argnames=("spec", "text_cfg", "prop_cfg", "bf16",
                                   "kv_fp8"))
def _beam_batch(
    params: Params,
    pv: jnp.ndarray,                  # [B, 53] normalized
    prop_mask: Optional[jnp.ndarray], # [B, 53] or None
    rngs: jnp.ndarray,                # [B, 2] PRNG keys
    spec: BeamSpec,
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
    bf16: bool = True,
    kv_fp8: bool = False,
):
    """Batched beam search.  ``bf16`` runs the decoder weights and KV cache in
    bfloat16 (fp32 softmax/LN retained) — ~3.5x decode throughput on v5e; the
    reference itself ran fp16 AMP, so this matches its precision envelope.
    Parity tests call beam_search directly in fp32.

    ``kv_fp8`` additionally stores the self-attention KV cache in
    float8_e4m3fn.  Compute stays bf16/fp32 (only stored K/V rows are
    quantized; scores, softmax and probs@V never round-trip through e4m3).
    Measured on v5e (r3, same-conditions A/B at batch 128 / 100 steps):
    163 vs 345 mol/s — 2.1x SLOWER than bf16.  v5e has no native fp8
    datapath, so the in-kernel fp8->f32 upconversion of every slab costs
    more than the halved DMA saves.  Kept as a tested opt-in for TPU
    generations with native fp8; token choices can differ from the bf16
    path within e4m3 rounding."""
    text_cfg = text_cfg or text_config()
    prop_embeds = encode_pv(params, pv, prop_mask, prop_cfg)       # [B, 54, H]
    cross_mask = jnp.ones(prop_embeds.shape[:2], jnp.int32)
    te = params["text_encoder"]
    cache_dtype = jnp.float32
    if bf16:
        te = jax.tree.map(lambda x: x.astype(jnp.bfloat16), te)
        prop_embeds = prop_embeds.astype(jnp.bfloat16)
        cache_dtype = jnp.bfloat16
    if kv_fp8:
        cache_dtype = jnp.float8_e4m3fn

    return beam_search_batched(te, text_cfg, prop_embeds, cross_mask, spec,
                               rngs, cache_dtype=cache_dtype)


def _decode_beams(tok: SmilesTokenizer, result, i: int, k: int,
                  stochastic: bool, py_rng) -> str:
    """Host-side: pick the output string for query i from the top-k beams
    (reference d_pv2smiles_single.py:102-110: deterministic takes the best,
    stochastic picks uniformly among the k; sequences decode as
    sentence[:-1] with '[CLS]' removed)."""
    n_fin = int(result["n_finished"][i])
    seqs = np.asarray(result["seqs"][i])
    lens = np.asarray(result["lengths"][i])
    n_avail = k if n_fin == 0 else min(k, n_fin)
    choice = 0 if not stochastic else py_rng.randrange(n_avail)
    ids = seqs[choice][: max(int(lens[choice]) - 1, 1)]   # strip trailing SEP
    return tok.decode(ids)


def _mesh_put(mesh, params, batch_arrays):
    """Replicate params / shard batch-leading arrays over the dp mesh.

    The decode kernels are ordinary jitted functions: with inputs placed
    this way GSPMD partitions the whole beam search (cache, bookkeeping,
    collective `all(done)` loop condition) over the molecule axis — the
    multi-chip story is placement, not new code (north star is per v5e-8,
    BASELINE.md)."""
    from spmm_tpu.parallel.mesh import batch_sharding, replicated

    params = jax.device_put(params, replicated(mesh))
    batch_arrays = [
        None if a is None else jax.device_put(a, batch_sharding(mesh))
        for a in batch_arrays]
    return params, batch_arrays


def generate_with_property(
    params: Params,
    tok: SmilesTokenizer,
    pv_normalized: np.ndarray,        # [53] already z-normalized
    prop_mask: np.ndarray,            # [53] 1 = masked
    n_generate: int = 1000,
    k: int = 2,
    stochastic: bool = True,
    seed: int = 0,
    device_batch: int = 128,
    mesh=None,
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
    kv_fp8: bool = False,
) -> list[str]:
    """Single-query workload: n_generate beam searches over one condition.
    With ``mesh`` the per-call batch is sharded over its dp axis
    (device_batch is then the GLOBAL batch and must divide the mesh size).
    ``kv_fp8`` stores the decode KV cache in float8 (see _beam_batch)."""
    import random as _random

    spec = BeamSpec(k=k, stop_count=k * k, stochastic=stochastic)
    py_rng = _random.Random(seed)
    master = jax.random.PRNGKey(seed)
    if mesh is not None:
        assert device_batch % mesh.devices.size == 0
    out: list[str] = []
    for start in range(0, n_generate, device_batch):
        n = min(device_batch, n_generate - start)
        # pad the batch to the fixed device_batch so XLA sees one shape
        pv = jnp.broadcast_to(jnp.asarray(pv_normalized), (device_batch, 53))
        mask = jnp.broadcast_to(jnp.asarray(prop_mask), (device_batch, 53))
        rngs = jax.random.split(jax.random.fold_in(master, start), device_batch)
        if mesh is not None:
            params, (pv, mask, rngs) = _mesh_put(mesh, params,
                                                 (pv, mask, rngs))
        result = jax.device_get(_beam_batch(params, pv, mask, rngs, spec,
                                            text_cfg, prop_cfg,
                                            kv_fp8=kv_fp8))
        for i in range(n):
            out.append(_decode_beams(tok, result, i, k, stochastic, py_rng))
    return out


def generate_batched(
    params: Params,
    tok: SmilesTokenizer,
    pvs_normalized: np.ndarray,       # [N, 53]
    k: int = 2,
    stochastic: bool = False,
    seed: int = 0,
    device_batch: int = 128,   # v5e throughput sweet spot (bench.py sweep)
    mesh=None,
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
    kv_fp8: bool = False,
) -> list[str]:
    """File-mode workload: one deterministic k-beam per molecule,
    stop_count=k, no property masking (reference d_pv2smiles_batched.py).
    With ``mesh`` molecules are sharded over its dp axis.  ``kv_fp8``
    stores the decode KV cache in float8 (see _beam_batch)."""
    import random as _random

    spec = BeamSpec(k=k, stop_count=k, stochastic=stochastic)
    py_rng = _random.Random(seed)
    master = jax.random.PRNGKey(seed)
    if mesh is not None:
        assert device_batch % mesh.devices.size == 0
    n_total = pvs_normalized.shape[0]
    out: list[str] = []
    for start in range(0, n_total, device_batch):
        n = min(device_batch, n_total - start)
        chunk = np.zeros((device_batch, 53), np.float32)
        chunk[:n] = pvs_normalized[start: start + n]
        pv = jnp.asarray(chunk)
        rngs = jax.random.split(jax.random.fold_in(master, start), device_batch)
        if mesh is not None:
            params, (pv, rngs) = _mesh_put(mesh, params, (pv, rngs))
        result = jax.device_get(_beam_batch(params, pv, None, rngs, spec,
                                            text_cfg, prop_cfg,
                                            kv_fp8=kv_fp8))
        for i in range(n):
            # batched mode always takes the best beam, even when sampling
            # stochastically (reference d_pv2smiles_batched.py:57 — the
            # random.choice variant is commented out there)
            out.append(_decode_beams(tok, result, i, k, False, py_rng))
    return out
