"""On-chip reaction-prediction decode throughput (reference
d_rxn_prediction.py:85-123 workload: per-sample k-beam, default n_beam=5).

Usage: python scripts/bench_rxn.py [beam|greedy] [k] [batch] [max_steps]
Prints one JSON line.  Perturbs inputs between timed iterations (the axon
runtime serves cached results for identical inputs — NOTES.md).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spmm_tpu.inference.decoding import BeamSpec
from spmm_tpu.inference.rxn import _beam_batch, _greedy_batch
from spmm_tpu.models.rxn import init_rxn_params

mode = sys.argv[1] if len(sys.argv) > 1 else "beam"
k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
max_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 100
src_len = 96

params = init_rxn_params(jax.random.PRNGKey(0))
# stop_count = k*k matches the CLI (cli/rxn_prediction.py); random-weight
# models rarely emit SEP so this measures the full max_steps regime
spec = BeamSpec(k=k, stop_count=k * k, max_steps=max_steps)


def inputs(i):
    key = jax.random.fold_in(jax.random.PRNGKey(2), i)
    k1, k2 = jax.random.split(key)
    ids = jax.random.randint(k1, (batch, src_len), 4, 300).at[:, 0].set(2)
    return ids, jnp.ones((batch, src_len), jnp.int32), \
        jax.random.split(k2, batch)


def run(ids, mask, rngs):
    if mode == "beam":
        return _beam_batch(params, ids, mask, rngs, spec)
    return _greedy_batch(params, ids, mask, max_steps=max_steps)


ids, mask, rngs = inputs(0)
t0 = time.perf_counter()
out = run(ids, mask, rngs)
jax.block_until_ready(out)
compile_s = time.perf_counter() - t0

n_iter = 3
batches = [inputs(i + 1) for i in range(n_iter)]
jax.block_until_ready(batches)
t0 = time.perf_counter()
sums = []
for b in batches:
    out = run(*b)
    # hard host data dependency per iteration (axon block_until_ready
    # intermittently returns early — see bench.py)
    sums.append(int(jax.device_get(out["seqs"].sum())))
dt = time.perf_counter() - t0
print(json.dumps({
    "mode": mode, "k": k, "batch": batch, "max_steps": max_steps,
    "mol_per_s": round(n_iter * batch / dt, 1),
    "ms_per_step": round(dt / n_iter / max_steps * 1000, 3),
    "compile_s": round(compile_s, 1),
}))
