"""MoleculeNet classification fine-tune CLI (reference d_classification.py).

Datasets: bace / bbbp / lidi(DILI); metric: test AUROC at best-val epoch.
"""

from __future__ import annotations

import argparse

from spmm_tpu.configs import FinetuneConfig
from spmm_tpu.cli._common import seed_everything
from spmm_tpu.cli._finetune_driver import run_finetune
from spmm_tpu.data.datasets import load_bace_c, load_bbbp, load_dili
from spmm_tpu.utils.prng import add_prng_arg, set_default_prng

DATASETS = {
    "bace": (load_bace_c, ("BACEC_train.csv", "BACEC_valid.csv",
                           "BACEC_test.csv")),
    "bbbp": (load_bbbp, ("BBBP_train.csv", "BBBP_valid.csv", "BBBP_test.csv")),
    "lidi": (load_dili, ("lidi_train.csv", "lidi_ltkb.csv", "lidi_ltkb.csv")),
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--name", default="bbbp", choices=sorted(DATASETS))
    p.add_argument("--data_dir", default="data/4_MoleculeNet")
    p.add_argument("--seed", type=int, default=41)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--min_lr", type=float, default=5e-6)
    p.add_argument("--epoch", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--output_dir", default=None,
                   help="also write metrics.jsonl + result.json here")
    add_prng_arg(p)
    args = p.parse_args(argv)

    set_default_prng(args.prng)   # before the first PRNGKey
    seed = seed_everything(args.seed)
    loader, files = DATASETS[args.name]
    train, valid, test = (loader(f"{args.data_dir}/{f}") for f in files)
    print("DATASET:", args.name, len(train), len(valid), len(test))

    fcfg = FinetuneConfig(lr=args.lr, min_lr=args.min_lr, epochs=args.epoch,
                          batch_size_train=args.batch_size, step_size=50)
    run_finetune("classification", train, valid, test, fcfg,
                 args.checkpoint, seed,
                 extended_metrics=(args.name == "lidi"),
                 output_dir=args.output_dir)


if __name__ == "__main__":
    main()
