"""On-chip A/B: beam decode throughput, XLA vs fused Pallas kernel.

Usage: python scripts/bench_decode.py [xla|pallas|auto] [max_steps] [batch]
Prints one JSON line.  Perturbs inputs between timed iterations (axon result
cache).
"""
import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")

from spmm_tpu.inference.decoding import BeamSpec
from spmm_tpu.inference.pv2smiles import _beam_batch
from spmm_tpu.models.spmm import init_spmm_params

attention = sys.argv[1] if len(sys.argv) > 1 else "auto"
max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
k = int(sys.argv[4]) if len(sys.argv) > 4 else 2
kv_fp8 = len(sys.argv) > 5 and sys.argv[5] == "fp8"

params = init_spmm_params(jax.random.PRNGKey(0), with_pretrain_heads=False)
spec = BeamSpec(k=k, stop_count=k * k * max_steps, stochastic=False,
                max_steps=max_steps, attention=attention)


def inputs(i):
    key = jax.random.fold_in(jax.random.PRNGKey(2), i)
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, (batch, 53)),
            jax.random.split(k2, batch))


pv, rngs = inputs(0)
t0 = time.perf_counter()
out = _beam_batch(params, pv, None, rngs, spec, kv_fp8=kv_fp8)
jax.block_until_ready(out)
compile_s = time.perf_counter() - t0

n_iter = 3
batches = [inputs(i + 1) for i in range(n_iter)]
jax.block_until_ready(batches)
t0 = time.perf_counter()
sums = []
for b in batches:
    out = _beam_batch(params, b[0], None, b[1], spec, kv_fp8=kv_fp8)
    # hard host data dependency per iteration: on some days the axon
    # runtime's block_until_ready returns early, inflating throughput —
    # fetching a reduction of the result cannot lie
    sums.append(int(jax.device_get(out["lengths"].sum())))
dt = time.perf_counter() - t0
print(json.dumps({
    "attention": attention, "max_steps": max_steps, "batch": batch, "k": k,
    "kv_fp8": kv_fp8,
    "mol_per_s": round(n_iter * batch / dt, 1),
    "ms_per_step": round(dt / n_iter / max_steps * 1000, 3),
    "compile_s": round(compile_s, 1),
}))
