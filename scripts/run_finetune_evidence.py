"""Fine-tune evidence run: the reference's downstream loop — pretrain
checkpoint -> fine-tune -> metric (d_rxn_prediction.py:27-145,
d_classification.py:52-103) — executed end-to-end ON THE CHIP, with
machine-checkable gates (VERDICT r4 item 2).

Three phases, each a fresh subprocess so it can own the chip:

  0. pretrain checkpoint: --pretrain_ckpt if given, else the newest
     step_* dir under the convergence workdir, else a fresh
     ``cli.pretrain --max_steps N`` run on the synthetic corpus;
  1. rxn fine-tune (``cli.rxn_prediction --mode forward``) on a synthetic
     condensation task (reactants "A.B" -> product A+B: a real
     sequence-to-sequence transform that a few hundred steps can learn),
     then the CLI's own greedy-decode eval -> exact-match accuracy;
  2. MoleculeNet-style classification fine-tune (``cli.classification
     --name bbbp``) on a synthetic has-nitrogen task -> test AUROC.

Both fine-tune loops run donate=True (training/finetune.py) — this run is
also the on-chip proof that donation works on the rxn/downstream state
trees, not just the pretrain one (VERDICT r4 weak #5).

Gates (evidence/finetune_summary.json "ok"): both per-step loss streams
DECREASE (first-20 mean vs last-20 mean), the rxn exact-match is computed
and positive, and the classification AUROC beats 0.7 on the learnable task.

Run: python scripts/run_finetune_evidence.py [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ring-digit-free second fragments: concatenation stays syntactically valid
FIRST = ["CC(=O)O", "c1ccccc1", "CCO", "CCN", "C1CCCCC1", "CC(C)O",
         "CCCl", "OC=O", "c1ccncc1", "COC", "CC#N", "CCC=O", "CNC", "CCS",
         "c1ccco1", "CC(C)C"]
SECOND = ["CC", "CCO", "N", "Cl", "C(=O)O", "CC(C)C", "OC", "CCN", "Br",
          "C#N", "CCC", "O", "CCCC", "NC", "S", "CCl"]


def make_rxn_data(path: str, n_train: int, n_eval: int, seed: int = 0):
    """Forward-synthesis TSVs: 'A.B<TAB>AB' over FIRSTxSECOND pairs.
    Valid/test are drawn from the train pair set — the gate is that the
    model LEARNS the transform it was trained on (memorization evidence),
    not held-out generalization."""
    rng = random.Random(seed)
    pairs = [(a, b) for a in FIRST for b in SECOND]   # 256 unique
    rng.shuffle(pairs)

    def lines(n, pool):
        return [f"{a}.{b}\t{a}{b}" for a, b in (rng.choice(pool)
                                                for _ in range(n))]

    d = os.path.join(path, "USPTO-480k")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "train_parsed.txt"), "w") as f:
        f.write("\n".join(lines(n_train, pairs)) + "\n")
    for split in ("valid", "test"):
        with open(os.path.join(d, f"{split}_parsed.txt"), "w") as f:
            f.write("\n".join(lines(n_eval, pairs)) + "\n")
    return path


def make_cls_data(path: str, n_train: int, n_eval: int, seed: int = 0):
    """BBBP-style CSVs where p_np = 'molecule contains nitrogen' — linearly
    separable from token identity, so a healthy fine-tune must clear a high
    AUROC in a couple of epochs."""
    rng = random.Random(seed)
    os.makedirs(path, exist_ok=True)
    n_frag = [f for f in FIRST + SECOND if "N" in f.upper()]
    o_frag = [f for f in FIRST + SECOND if "N" not in f.upper()]

    def rows(n):
        out = []
        for i in range(n):
            pos = i % 2 == 0
            bank = n_frag if pos else o_frag
            s = rng.choice(bank) + rng.choice(
                [f for f in o_frag if not any(c in f for c in "()")])
            out.append((s, 1 if pos else 0))
        return out

    for name, n in (("BBBP_train.csv", n_train), ("BBBP_valid.csv", n_eval),
                    ("BBBP_test.csv", n_eval)):
        with open(os.path.join(path, name), "w") as f:
            f.write("smiles,p_np\n")
            f.write("\n".join(f"{s},{y}" for s, y in rows(n)) + "\n")
    return path


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, check=True, **kw)


def loss_window_means(metrics_path: str, w: int = 20):
    with open(metrics_path) as f:
        losses = [json.loads(l)["loss"] for l in f if l.strip()]
    w = min(w, max(len(losses) // 2, 1))
    return (sum(losses[:w]) / w, sum(losses[-w:]) / w, len(losses))


def find_pretrain_ckpt(workdir: str):
    hits = []
    for phase in ("phaseB", "phaseA"):
        hits += glob.glob(os.path.join(workdir, phase, "step_*"))
    if not hits:
        return None
    return max(hits, key=lambda p: int(p.rsplit("_", 1)[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain_ckpt", default=None)
    ap.add_argument("--pretrain_steps", type=int, default=300,
                    help="fallback pretrain length when no checkpoint found")
    ap.add_argument("--rxn_epochs", type=int, default=6)
    ap.add_argument("--cls_epochs", type=int, default=3)
    ap.add_argument("--device", choices=("tpu", "cpu"), default="tpu")
    ap.add_argument("--workdir", default="/tmp/spmm_finetune_evidence")
    ap.add_argument("--convergence_workdir", default="/tmp/spmm_convergence")
    args = ap.parse_args()

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    os.makedirs(args.workdir, exist_ok=True)
    evidence = os.path.join(REPO, "evidence")
    os.makedirs(evidence, exist_ok=True)

    # ---- phase 0: a pretrain checkpoint ---------------------------------
    ckpt = args.pretrain_ckpt or find_pretrain_ckpt(args.convergence_workdir)
    ckpt_source = "given" if args.pretrain_ckpt else "convergence_run"
    if ckpt is None or not os.path.isdir(ckpt):
        ckpt_source = "fresh_pretrain"
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from run_convergence import make_corpus

        corpus, cache = make_corpus(args.workdir, n=20_000)
        out = os.path.join(args.workdir, "pretrain")
        run([sys.executable, "-m", "spmm_tpu.cli.pretrain",
             "--data_path", corpus, "--property_cache", cache,
             "--output_dir", out, "--batch_size", "32",
             "--queue_size", "256", "--epochs", "100",
             "--save_every", str(args.pretrain_steps),
             "--max_steps", str(args.pretrain_steps),
             "--bf16", "--remat", "--donate"])
        ckpt = os.path.join(out, f"step_{args.pretrain_steps}")
    ckpt = os.path.abspath(ckpt)
    print("pretrain checkpoint:", ckpt, f"({ckpt_source})")

    # ---- phase 1: rxn fine-tune + greedy exact-match --------------------
    rxn_data = make_rxn_data(os.path.join(args.workdir, "rxn_data"),
                             n_train=1536, n_eval=48)
    rxn_out = os.path.join(args.workdir, "rxn_out")
    run([sys.executable, "-m", "spmm_tpu.cli.rxn_prediction",
         "--checkpoint", ckpt, "--mode", "forward",
         "--data_dir", rxn_data, "--output_dir", rxn_out,
         "--epoch", str(args.rxn_epochs), "--n_beam", "1",
         "--batch_size", "16", "--batch_size_eval", "48"])
    rxn_first, rxn_last, rxn_steps = loss_window_means(
        os.path.join(rxn_out, "metrics.jsonl"))
    with open(os.path.join(rxn_out, "result.json")) as f:
        rxn_result = json.load(f)

    # ---- phase 2: classification fine-tune + AUROC ----------------------
    cls_data = make_cls_data(os.path.join(args.workdir, "cls_data"),
                             n_train=512, n_eval=128)
    cls_out = os.path.join(args.workdir, "cls_out")
    run([sys.executable, "-m", "spmm_tpu.cli.classification",
         "--checkpoint", ckpt, "--name", "bbbp", "--data_dir", cls_data,
         "--output_dir", cls_out, "--epoch", str(args.cls_epochs),
         "--batch_size", "16"])
    cls_first, cls_last, cls_steps = loss_window_means(
        os.path.join(cls_out, "metrics.jsonl"))
    with open(os.path.join(cls_out, "result.json")) as f:
        cls_result = json.load(f)

    # ---- summary + gates -------------------------------------------------
    summary = {
        "device": args.device,
        "pretrain_ckpt": ckpt,
        "pretrain_ckpt_source": ckpt_source,
        "donate": True,   # make_rxn_step/make_downstream_step donate=True
        "rxn": {
            "task": "forward condensation A.B -> AB (synthetic USPTO format)",
            "steps": rxn_steps,
            "loss_first20_mean": rxn_first,
            "loss_last20_mean": rxn_last,
            "loss_decreased": rxn_last < rxn_first,
            "best_valid_exact_match": rxn_result["best_valid_acc"],
            "best_test_exact_match": rxn_result["best_test_acc"],
            "epochs": rxn_result["epochs"],
        },
        "classification": {
            "task": "has-nitrogen BBBP-format (synthetic)",
            "steps": cls_steps,
            "loss_first20_mean": cls_first,
            "loss_last20_mean": cls_last,
            "loss_decreased": cls_last < cls_first,
            "best_valid_auroc": cls_result["best_valid"],
            "best_test_auroc": cls_result["best_test"],
            "epochs": cls_result["epochs"],
        },
    }
    summary["ok"] = (
        summary["rxn"]["loss_decreased"]
        and summary["classification"]["loss_decreased"]
        and rxn_result["best_test_acc"] > 0.0
        and cls_result["best_test"] > 0.7
    )
    for src, dst in ((os.path.join(rxn_out, "metrics.jsonl"),
                      "metrics_rxn_finetune.jsonl"),
                     (os.path.join(cls_out, "metrics.jsonl"),
                      "metrics_cls_finetune.jsonl")):
        with open(src) as f, open(os.path.join(evidence, dst), "w") as g:
            g.write(f.read())
    with open(os.path.join(evidence, "finetune_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    if not summary["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
