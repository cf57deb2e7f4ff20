"""On-chip smiles2pv throughput (reference d_smiles2pv.py workload).

Usage: python scripts/bench_smiles2pv.py [batch] [seq_len] [bf16]
Prints one JSON line.  Perturbs inputs between timed iterations (the axon
runtime serves cached results for identical inputs — NOTES.md).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spmm_tpu.inference.smiles2pv import predict_pv
from spmm_tpu.models.spmm import init_spmm_params

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 48
bf16 = len(sys.argv) > 3 and sys.argv[3] == "bf16"

params = init_spmm_params(jax.random.PRNGKey(0), with_pretrain_heads=False)
if bf16:
    from spmm_tpu.inference.smiles2pv import cast_params_bf16
    params = cast_params_bf16(params)


def inputs(i):
    key = jax.random.fold_in(jax.random.PRNGKey(2), i)
    ids = jax.random.randint(key, (batch, seq_len), 4, 300)
    return ids, jnp.ones((batch, seq_len), jnp.int32)


ids, mask = inputs(0)
t0 = time.perf_counter()
out = predict_pv(params, ids, mask, bf16=bf16)
jax.block_until_ready(out)
compile_s = time.perf_counter() - t0

n_iter = 5
batches = [inputs(i + 1) for i in range(n_iter)]
jax.block_until_ready(batches)
t0 = time.perf_counter()
sums = []
for b in batches:
    out = predict_pv(params, b[0], b[1], bf16=bf16)
    # hard host data dependency per iteration (axon block_until_ready
    # intermittently returns early — see bench.py)
    sums.append(float(jax.device_get(jnp.abs(out).sum())))
dt = time.perf_counter() - t0
print(json.dumps({
    "batch": batch, "seq_len": seq_len, "bf16": bf16,
    "mol_per_s": round(n_iter * batch / dt, 1),
    "ms_per_mol": round(dt / n_iter / batch * 1000, 3),
    "compile_s": round(compile_s, 1),
}))
