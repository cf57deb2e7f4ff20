"""SMILES -> property-vector generation CLI (reference d_smiles2pv.py).

Decodes the 53 properties for each input molecule and reports the reference's
metrics: per-property denormalized RMSE, mean normalized RMSE, and mean r^2
(reference d_smiles2pv.py:80-107).  Reference PVs for the metric come from
RDKit featurization (gated) or a precomputed .npz property cache.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.checkpoint.io import load_spmm_params
from spmm_tpu.chem.featurizer import HAS_RDKIT, canonicalize
from spmm_tpu.cli._common import load_stats, make_tokenizer, seed_everything
from spmm_tpu.data.datasets import PretrainDataset
from spmm_tpu.inference.smiles2pv import predict_pv
from spmm_tpu.parallel.mesh import auto_mesh
from spmm_tpu.tokenizer import default_buckets


def pv_generate(params, tok, smiles_list, stats, batch_size=128, mesh=None,
                bf16=False):
    """Library-style API accepting a list of SMILES strings
    (reference d_smiles2pv.py:39-57); returns denormalized PVs [N, 53].
    With ``mesh`` molecules are sharded over its dp axis (batch_size is the
    global batch and must divide the mesh size).  ``bf16`` is an
    experimentation hook — measured SLOWER than fp32 on v5e at these
    shapes (see inference/smiles2pv.py); fp32 default matches the
    reference numerics (and the golden gate) and is fastest."""
    if bf16:
        from spmm_tpu.inference.smiles2pv import cast_params_bf16
        params = cast_params_bf16(params)   # outside the jit: bf16 in HBM
    if mesh is not None:
        from spmm_tpu.parallel.mesh import batch_sharding, replicated
        assert batch_size % mesh.devices.size == 0
        params = jax.device_put(params, replicated(mesh))
    out = []
    for start in range(0, len(smiles_list), batch_size):
        chunk = smiles_list[start: start + batch_size]
        texts = [s if s.startswith("[CLS]") else "[CLS]" + s for s in chunk]
        ids, mask = tok.encode_batch(texts, max_len=100,
                                     buckets=default_buckets(100))
        n = len(chunk)
        if mesh is not None and n < batch_size:
            ids = np.pad(np.asarray(ids), [(0, batch_size - n), (0, 0)])
            mask = np.pad(np.asarray(mask), [(0, batch_size - n), (0, 0)])
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        if mesh is not None:
            ids = jax.device_put(ids, batch_sharding(mesh))
            mask = jax.device_put(mask, batch_sharding(mesh))
        preds = np.asarray(predict_pv(params, ids, mask, bf16=bf16))[:n]
        out.append(stats.denormalize(preds))
    return np.concatenate(out)


def metric_eval(ref_norm: np.ndarray, cand_norm: np.ndarray, stats):
    """Reference metric_eval (d_smiles2pv.py:80-107)."""
    from sklearn.metrics import r2_score

    r = stats.denormalize(ref_norm)
    c = stats.denormalize(cand_norm)
    rmse = np.sqrt(np.mean((r - c) ** 2, axis=0))
    n_rmse = np.sqrt(np.mean((ref_norm - cand_norm) ** 2, axis=0))
    print("mean of 53 properties' normalized RMSE:", float(n_rmse.mean()))
    r2 = np.array([r2_score(r[:, i], c[:, i]) for i in range(r.shape[1])])
    print("mean r^2 coefficient of determination:", float(r2.mean()))
    return float(n_rmse.mean()), float(r2.mean())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_file", required=True)
    p.add_argument("--property_cache", default=None,
                   help=".npz with raw PVs aligned to input lines "
                        "(required for metrics when RDKit is absent)")
    p.add_argument("--batch_size", type=int, default=128,
                   help="device batch (128 is the measured v5e sweet spot: "
                        "221.8 mol/s vs 169.6 at 64)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 weights/activations (fp32 LN/softmax); "
                        "measured slower than fp32 on v5e at these shapes "
                        "— experimentation hook, small numeric drift")
    p.add_argument("--output_file", default=None)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)

    seed_everything(args.seed)
    tok = make_tokenizer()
    stats = load_stats()
    params = load_spmm_params(args.checkpoint, with_pretrain_heads=False)
    mesh = auto_mesh()                 # all visible chips, no flag needed
    if mesh is not None:
        args.batch_size += -args.batch_size % mesh.devices.size
        print(f"data-parallel over {mesh.devices.size} devices "
              f"(global batch {args.batch_size})")

    print("SMILES-to-PV generation...")
    if args.property_cache or HAS_RDKIT:
        ds = PretrainDataset(args.input_file,
                             property_cache=args.property_cache)
        refs, texts = [], []
        for i in range(len(ds)):
            pv, text = ds[i]
            refs.append(pv)
            texts.append(text)
        cand_denorm = pv_generate(params, tok, texts, stats,
                                  args.batch_size, mesh=mesh)
        metric_eval(np.stack(refs), stats.normalize(cand_denorm), stats)
    else:
        with open(args.input_file) as f:
            smiles = [l.strip() for l in f if l.strip()]
        smiles = [canonicalize(s) or s for s in smiles]
        cand_denorm = pv_generate(params, tok, smiles, stats,
                                  args.batch_size, mesh=mesh)
        print("RDKit unavailable and no property cache: skipping metrics")

    if args.output_file:
        np.savetxt(args.output_file, cand_denorm, fmt="%.6f")
        print("predictions saved to", args.output_file)
    print("SMILES-to-PV generation done")


if __name__ == "__main__":
    main()
