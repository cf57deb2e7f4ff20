"""Dynamic-batching serving layer over the static-shape jitted workloads.

Every device program in this framework is a fixed-shape XLA executable,
compiled once (static shapes everywhere — the repo-wide convention).
Online traffic, by contrast, arrives one request at a time.  This module bridges
the two the way production TPU serving stacks do:

- a background worker coalesces requests into **fixed-size batches** —
  a batch launches when it is full OR when the oldest request has waited
  ``max_wait_ms``, whichever comes first;
- short batches are padded by repeating a real request, so the device
  only ever sees ONE shape (no recompiles, padded rows discarded on the
  host before the futures resolve);
- one device program runs per batch; each caller gets a
  ``concurrent.futures.Future`` that resolves to its own result.

The reference has no serving surface at all — every d_*.py is an offline
script (SURVEY §1 L7); this is framework capability beyond parity.
Throughput-vs-latency is the usual trade: ``batch_size`` should be the
measured device sweet spot (128 for the v5e beam decode, bench.py sweep)
and ``max_wait_ms`` bounds the tail latency a lone request can add.

Concrete services wrap the two generation workloads:

- :class:`Pv2SmilesService` — property vector -> SMILES, deterministic
  k-beam with the file-mode stop rule (reference d_pv2smiles_batched.py).
- :class:`Smiles2PvService` — SMILES -> 53-property vector (reference
  d_smiles2pv.py), one fixed-length bucket.

Both are thin ``BatchingService`` subclasses; any other jittable batch
function (rxn prediction, classification heads) serves the same way.
"""

from __future__ import annotations

import itertools
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Optional, Sequence

import numpy as np

Params = dict[str, Any]


class BatchingService:
    """Generic request coalescer: submit items, get Futures, a worker
    thread runs ``batch_fn`` on fixed-size padded batches.

    ``batch_fn(items, n)`` is always called with EXACTLY ``batch_size``
    items (short batches padded by repeating the last real item); ``n`` is
    the real request count, so implementations can skip host-side work on
    padded rows.  It must return at least ``n`` results, the first ``n``
    matching the real items in order.  Exceptions propagate to every
    future of the failing batch.
    """

    def __init__(self, batch_fn: Callable[[list, int], Sequence],
                 batch_size: int, max_wait_ms: float = 25.0):
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        self._batch_fn = batch_fn
        self._batch_size = batch_size
        self._max_wait = max_wait_ms / 1000.0
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._closed = threading.Event()
        # guards the closed-check-then-enqueue in submit() against close():
        # without it a racing submit can enqueue after the worker exited and
        # strand its future forever
        self._submit_lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "padded_slots": 0}
        self._worker = threading.Thread(
            target=self._loop, name=type(self).__name__, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ #
    # client surface
    # ------------------------------------------------------------------ #

    def submit(self, item) -> Future:
        fut: Future = Future()
        with self._submit_lock:
            if self._closed.is_set():
                raise RuntimeError(f"{type(self).__name__} is closed")
            # enqueue time rides along: the max_wait deadline is measured
            # from SUBMISSION, so a request that already queued behind a
            # long device launch is not granted a fresh window on dequeue
            self._q.put((time.monotonic(), item, fut))
        return fut

    def map(self, items: Sequence) -> list:
        """Submit all items, block until every result is in (order kept)."""
        return [f.result() for f in [self.submit(it) for it in items]]

    def close(self) -> None:
        """Stop accepting requests, drain the queue, join the worker."""
        with self._submit_lock:
            self._closed.set()
        self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------ #
    # worker
    # ------------------------------------------------------------------ #

    def _loop(self) -> None:
        while True:
            try:
                batch = [self._q.get(timeout=0.05)]
            except queue.Empty:
                if self._closed.is_set():
                    return
                continue
            deadline = batch[0][0] + self._max_wait
            while len(batch) < self._batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            items = [it for _, it, _ in batch]
            futures = [f for _, _, f in batch]
            n = len(items)
            padded = items + [items[-1]] * (self._batch_size - n)
            # stats BEFORE resolution: a client that observed its result
            # must never read counters that predate its own batch
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["padded_slots"] += self._batch_size - n
            try:
                results = self._batch_fn(padded, n)
                for fut, res in zip(futures, results):
                    fut.set_result(res)
            except Exception as exc:  # noqa: BLE001 — futures carry it
                for fut in futures:
                    fut.set_exception(exc)


class Pv2SmilesService(BatchingService):
    """PV -> SMILES serving: submit a z-normalized [53] property vector,
    receive the generated SMILES string.

    An item is either a bare ``[53]`` vector (condition on every property)
    or a ``(pv, mask)`` pair with ``mask[53]`` 1 = masked: generation is
    conditioned only on the UNMASKED subset, masked positions are replaced
    by the learned mask embedding exactly like the reference's partial-
    condition workload (reference d_pv2smiles_single.py:60-66).  Masked
    slots' values are inert (zeroed host-side), so requests with different
    masks coalesce into the same device program — every batch passes one
    ``[B, 53]`` mask, all-zero rows behaving bit-identically to no mask.

    Deterministic (default): k-beam with the file-mode stop rule
    (stop_count=k, reference d_pv2smiles_batched.py:45), best beam
    returned.  ``stochastic=True``: the single-query sampling mode —
    multinomial beam expansion, k**2 stop, uniform pick among the finished
    beams (reference d_pv2smiles_single.py:40-44,86-110).  One XLA program
    per batch; with ``mesh`` the batch shards over its dp axis
    (batch_size must then divide the mesh size).
    """

    def __init__(self, params: Params, tok, *, k: int = 2,
                 stochastic: bool = False, batch_size: int = 128,
                 max_wait_ms: float = 25.0, mesh=None, text_cfg=None,
                 prop_cfg=None, seed: int = 0, bf16: bool = True,
                 kv_fp8: bool = False):
        import random as _random

        import jax

        from spmm_tpu.inference.decoding import BeamSpec
        from spmm_tpu.inference.pv2smiles import _beam_batch, _decode_beams

        spec = BeamSpec(k=k, stop_count=k * k if stochastic else k,
                        stochastic=stochastic)
        master = jax.random.PRNGKey(seed)
        py_rng = _random.Random(seed)
        counter = itertools.count()
        if mesh is not None:
            from spmm_tpu.parallel.mesh import batch_sharding, replicated
            if batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {batch_size} must divide over the "
                    f"{mesh.devices.size}-device mesh")
            params = jax.device_put(params, replicated(mesh))

        def split_item(item):
            if isinstance(item, tuple):
                pv, msk = item
                pv = np.asarray(pv, np.float32)
                msk = np.asarray(msk, np.float32)
            else:
                pv = np.asarray(item, np.float32)
                msk = np.zeros_like(pv)
            # zero masked slots: their values must be inert, and a client
            # NaN there would otherwise poison the row (NaN * 0 == NaN in
            # the mask-blend on device)
            return np.where(msk > 0, 0.0, pv), msk

        def batch_fn(items: list, n: int) -> list[str]:
            pairs = [split_item(it) for it in items]
            pv = np.stack([p for p, _ in pairs])
            msk = np.stack([m for _, m in pairs])
            rngs = jax.random.split(
                jax.random.fold_in(master, next(counter)), batch_size)
            pv_d, msk_d, rngs_d = pv, msk, rngs
            if mesh is not None:
                pv_d = jax.device_put(pv, batch_sharding(mesh))
                msk_d = jax.device_put(msk, batch_sharding(mesh))
                rngs_d = jax.device_put(rngs, batch_sharding(mesh))
            result = jax.device_get(_beam_batch(
                params, pv_d, msk_d, rngs_d, spec, text_cfg, prop_cfg,
                bf16=bf16, kv_fp8=kv_fp8))
            # decode only the real rows — padded duplicates would burn
            # worker-thread time between device launches
            return [_decode_beams(tok, result, i, k, stochastic, py_rng)
                    for i in range(n)]

        super().__init__(batch_fn, batch_size, max_wait_ms)


class Smiles2PvService(BatchingService):
    """SMILES -> PV serving: submit a SMILES string, receive the 53-entry
    property vector (denormalized when ``stats`` is given, else normalized).

    One fixed-length bucket (``max_len``) so the device sees one shape
    (reference d_smiles2pv.py truncates at 100 likewise).
    """

    def __init__(self, params: Params, tok, *, stats=None,
                 batch_size: int = 128, max_wait_ms: float = 25.0,
                 max_len: int = 100, mesh=None, text_cfg=None,
                 prop_cfg=None, bf16: bool = False):
        import jax

        from spmm_tpu.inference.smiles2pv import predict_pv

        if mesh is not None:
            from spmm_tpu.parallel.mesh import batch_sharding, replicated
            if batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {batch_size} must divide over the "
                    f"{mesh.devices.size}-device mesh")
            params = jax.device_put(params, replicated(mesh))
        norm_stats = stats

        def batch_fn(smiles: list[str], n: int) -> list[np.ndarray]:
            texts = [s if s.startswith("[CLS]") else "[CLS]" + s
                     for s in smiles]
            ids, mask = tok.encode_batch(texts, max_len=max_len,
                                         buckets=(max_len,))
            ids_d, mask_d = ids, mask
            if mesh is not None:
                ids_d = jax.device_put(ids, batch_sharding(mesh))
                mask_d = jax.device_put(mask, batch_sharding(mesh))
            preds = np.asarray(predict_pv(params, ids_d, mask_d,
                                          text_cfg=text_cfg,
                                          prop_cfg=prop_cfg, bf16=bf16))[:n]
            if norm_stats is not None:
                preds = norm_stats.denormalize(preds)
            return list(preds)

        super().__init__(batch_fn, batch_size, max_wait_ms)
