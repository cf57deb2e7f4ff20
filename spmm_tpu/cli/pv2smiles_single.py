"""PV -> SMILES single-query generation CLI (reference d_pv2smiles_single.py).

The property condition comes from a CSV with ``property,input_value`` rows
(reference p2s_input.csv); unlisted properties are masked.  (The reference's
CSV branch crashes on a missing pandas import — d_pv2smiles_single.py:193 —
fixed here.)  Metrics: normalized RMSE over the controlled properties,
validity, uniqueness; valid molecules written to generated_molecules.txt
(reference d_pv2smiles_single.py:115-149).
"""

from __future__ import annotations

import argparse
import random

import numpy as np

from spmm_tpu.checkpoint.io import load_spmm_params
from spmm_tpu.chem.featurizer import HAS_RDKIT, calculate_property, canonicalize
from spmm_tpu.chem.featurizer import is_valid_smiles
from spmm_tpu.cli._common import load_stats, make_tokenizer, seed_everything
from spmm_tpu.inference.pv2smiles import generate_with_property
from spmm_tpu.parallel.mesh import auto_mesh


def read_condition(path: str, stats):
    """CSV rows (property,input_value) -> (prop_input[53], prop_mask[53])."""
    import csv

    prop_input = np.zeros(53, np.float32)
    prop_mask = np.ones(53, np.float32)
    with open(path) as f:
        for row in csv.DictReader(f):
            idx = stats.index_of(row["property"])
            prop_input[idx] = float(row["input_value"])
            prop_mask[idx] = 0.0
    return prop_input, prop_mask


def metric_eval(prop_input, cand, prop_mask, stats, out_file):
    """Reference metric_eval (d_pv2smiles_single.py:115-149)."""
    random.shuffle(cand)
    valids, mse = [], []
    for s in cand:
        if not is_valid_smiles(s):
            continue
        if HAS_RDKIT:
            try:
                pv = calculate_property(s, stats)
            except ValueError:
                continue
            n_ref = stats.normalize(prop_input)
            n_cdd = stats.normalize(pv)
            mse.append((n_ref - n_cdd) ** 2)
        valids.append(s)
    if mse:
        rmse = np.sqrt(np.mean(np.stack(mse), axis=0))
        controlled = rmse[prop_mask == 0]
        print("mean of controlled properties' normalized RMSE:",
              float(controlled.mean()))
    else:
        print("normalized RMSE unavailable (RDKit required)")
    v = len(valids)
    print("validity:", v / max(len(cand), 1))
    canon = [canonicalize(s) or s for s in valids]
    print("uniqueness:", len(set(canon)) / max(v, 1))
    with open(out_file, "w") as w:
        for s in ([canonicalize(x) or x for x in valids] if HAS_RDKIT else valids):
            w.write(s + "\n")
    print(f"Generated molecules are saved in '{out_file}'")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_csv", default="p2s_input.csv")
    p.add_argument("--n_generate", type=int, default=1000)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--stochastic", type=lambda s: s != "False", default=True)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--output_file", default="generated_molecules.txt")
    p.add_argument("--kv_fp8", action="store_true",
                   help="store the decode KV cache in float8_e4m3fn; measured 2.1x SLOWER than bf16 on v5e (no native fp8 datapath — upconversion swamps the DMA saving), kept for newer TPUs")
    args = p.parse_args(argv)

    seed = seed_everything(args.seed)
    tok = make_tokenizer()
    stats = load_stats()
    params = load_spmm_params(args.checkpoint, with_pretrain_heads=False)

    prop_input, prop_mask = read_condition(args.input_csv, stats)
    pv_norm = stats.normalize(prop_input)
    # masked entries carry the learned mask vector; their values are unused

    mesh = auto_mesh()                 # all visible chips, no flag needed
    device_batch = 128
    if mesh is not None:
        device_batch += -device_batch % mesh.devices.size
        print(f"data-parallel over {mesh.devices.size} devices")
    print(f"PV-to-SMILES generation in "
          f"{'stochastic' if args.stochastic else 'deterministic'} manner "
          f"with k={args.k}...")
    samples = generate_with_property(
        params, tok, pv_norm, prop_mask, n_generate=args.n_generate,
        k=args.k, stochastic=args.stochastic, seed=seed,
        device_batch=device_batch, mesh=mesh, kv_fp8=args.kv_fp8)
    metric_eval(prop_input, samples, prop_mask, stats, args.output_file)


if __name__ == "__main__":
    main()
