"""End-to-end integration: train -> best-val selection -> metric on synthetic
data at tiny scale (full driver path, CPU)."""

import numpy as np
import pytest

from spmm_tpu.configs import BertArchConfig, FinetuneConfig
from spmm_tpu.data.datasets import SupervisedDataset
from spmm_tpu.cli._finetune_driver import run_finetune

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)
CFG = BertArchConfig(**TINY, add_cross_attention=True)

# token-separable synthetic task: class 1 molecules contain Cl
POS = ["CC(=O)Cl", "CCCl", "CC(C)Cl", "ClCCCl", "CCC(Cl)C", "CClC"]
NEG = ["CC(=O)O", "CCO", "CC(C)O", "OCCO", "CCC(O)C", "COC"]


def make_ds():
    texts = ["[CLS]" + s for s in POS + NEG]
    y = np.array([1] * len(POS) + [0] * len(NEG), np.int32)
    return SupervisedDataset(texts, y, n_output=2)


def test_classification_end_to_end(capsys, tmp_path):
    import json

    ds = make_ds()
    fcfg = FinetuneConfig(lr=5e-4, epochs=4, batch_size_train=4,
                          batch_size_test=8, step_size=2)
    best = run_finetune("classification", ds, ds, ds, fcfg,
                        checkpoint=None, seed=0, cfg=CFG,
                        output_dir=str(tmp_path))
    out = capsys.readouterr().out
    assert "VALID" in out and "TEST" in out
    # a 4-layer model must learn the Cl-vs-O rule on its own train set
    assert best > 0.9, f"AUROC {best}"
    # machine-readable evidence surface (scripts/run_finetune_evidence.py)
    with open(tmp_path / "result.json") as f:
        result = json.load(f)
    assert result["best_test"] == best and len(result["epochs"]) == 4
    with open(tmp_path / "metrics.jsonl") as f:
        steps = [json.loads(l) for l in f if l.strip()]
    assert len(steps) == result["steps"] and "loss" in steps[0]
