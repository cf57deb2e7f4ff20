"""Dataset loader + pipeline tests over synthetic fixtures (no RDKit)."""

import numpy as np
import pytest

from spmm_tpu.chem.featurizer import HAS_RDKIT
from spmm_tpu.data.datasets import (
    LABEL_STATS, PretrainDataset, USPTODataset, load_bace_c, load_bbbp,
    load_clintox, load_esol, load_freesolv, load_sider,
)
from spmm_tpu.data.pipeline import (
    batch_pairs, batch_pretrain, batch_supervised, prefetch,
)
from spmm_tpu.tokenizer import SmilesTokenizer

SMILES = ["CC(=O)Oc1ccccc1C(=O)O", "CCO", "c1ccccc1", "CC(C)CC(=O)O",
          "N#Cc1ccccc1", "CCN(CC)CC"]


@pytest.fixture(scope="module")
def tok():
    return SmilesTokenizer()


def test_pretrain_dataset_with_cache(tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(SMILES) + "\n")
    pv = np.random.default_rng(0).normal(size=(len(SMILES), 53)).astype("f4")
    cache = tmp_path / "corpus.pv.npz"
    np.savez(cache, pv=pv)

    ds = PretrainDataset(str(corpus), property_cache=str(cache))
    assert len(ds) == len(SMILES)
    p0, t0 = ds[0]
    assert p0.shape == (53,)
    assert t0.startswith("[CLS]")
    # cache values are raw -> item returns normalized
    stats = ds.stats
    np.testing.assert_allclose(p0, stats.normalize(pv[0]), rtol=1e-5)

    # slicing mirrors reference data_length=[a,b]
    ds2 = PretrainDataset(str(corpus), data_range=(1, 3))
    assert len(ds2) == 2


def test_pretrain_dataset_requires_rdkit_without_cache(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("CCO\n")
    ds = PretrainDataset(str(corpus))
    if not HAS_RDKIT:
        with pytest.raises(RuntimeError):
            ds[0]


def test_csv_loaders(tmp_path):
    import pandas as pd

    bace = tmp_path / "bace.csv"
    pd.DataFrame({"mol": SMILES, "Class": [0, 1, 0, 1, 1, 0]}).to_csv(bace)
    ds = load_bace_c(str(bace))
    assert len(ds) == 6 and ds.n_output == 2
    assert ds.texts[0].startswith("[CLS]")
    assert ds.targets.dtype == np.int32

    bbbp = tmp_path / "bbbp.csv"
    rows = {"smiles": SMILES + ["C(invalid"], "p_np": [1, 0, 1, 0, 1, 0, 1]}
    pd.DataFrame(rows).to_csv(bbbp)
    ds = load_bbbp(str(bbbp))
    assert len(ds) == 6  # invalid row filtered (reference dataset.py:128)

    esol = tmp_path / "esol.csv"
    pd.DataFrame({
        "smiles": SMILES,
        "ESOL predicted log solubility in mols per litre":
            np.linspace(-5, 0, 6),
    }).to_csv(esol)
    ds = load_esol(str(esol))
    assert ds.value_mean == LABEL_STATS["esol"][0]
    # targets NOT normalized (reference asymmetry)
    np.testing.assert_allclose(ds.targets, np.linspace(-5, 0, 6), rtol=1e-5)

    free = tmp_path / "freesolv.csv"
    pd.DataFrame({"smiles": SMILES, "target": np.linspace(-5, 0, 6)}).to_csv(free)
    ds = load_freesolv(str(free))
    m, s = LABEL_STATS["freesolv"]
    # ONLY freesolv normalizes targets (reference dataset.py:181)
    np.testing.assert_allclose(ds.targets,
                               (np.linspace(-5, 0, 6) - m) / s, rtol=1e-5)

    clintox = tmp_path / "clintox.csv"
    pd.DataFrame({"smiles": SMILES, "FDA_APPROVED": [1] * 6,
                  "CT_TOX": [0] * 6}).to_csv(clintox, index=False)
    ds = load_clintox(str(clintox))
    assert ds.targets.shape == (6, 2) and ds.n_output == 2

    sider = tmp_path / "sider.csv"
    cols = {"smiles": SMILES}
    for i in range(27):
        cols[f"se_{i}"] = [i % 2] * 6
    pd.DataFrame(cols).to_csv(sider, index=False)
    ds = load_sider(str(sider))
    assert ds.targets.shape == (6, 27) and ds.n_output == 27


def test_uspto_dataset(tmp_path):
    f = tmp_path / "uspto.txt"
    f.write_text("CCO.CC(=O)O\tCC(=O)OCC\nCCN\tCCNC\n")
    ds = USPTODataset(str(f))
    src, tgt = ds[0]
    assert src == "[CLS]CCO.CC(=O)O" and tgt == "[CLS]CC(=O)OCC"


def test_batch_supervised(tok):
    texts = ["[CLS]" + s for s in SMILES]
    targets = np.arange(6, dtype=np.float32)
    batches = list(batch_supervised(tok, texts, targets, batch_size=4,
                                    pad_batch=True))
    assert len(batches) == 2
    assert batches[0]["ids"].shape[0] == 4
    assert batches[1]["n_real"] == 2
    assert batches[1]["ids"].shape[0] == 4  # padded to full batch
    # shapes come from the static bucket set
    from spmm_tpu.tokenizer import default_buckets

    assert batches[0]["ids"].shape[1] in default_buckets(100)


def test_batch_pretrain_and_prefetch(tmp_path, tok):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(SMILES) + "\n")
    pv = np.zeros((6, 53), "f4")
    np.savez(tmp_path / "pv.npz", pv=pv)
    ds = PretrainDataset(str(corpus), property_cache=str(tmp_path / "pv.npz"))
    batches = list(prefetch(batch_pretrain(tok, ds, batch_size=4)))
    assert len(batches) == 1  # drop_last
    b = batches[0]
    assert b["prop"].shape == (4, 53)
    assert b["ids"].shape == b["mask"].shape


def test_batch_pretrain_skip_batches_resumes_epoch_order(tmp_path, tok):
    """skip_batches=k must yield exactly the tail of the same shuffle order
    — the resume fast-forward contract of cli.pretrain (reference: PL
    ckpt_path restores the loader position, SPMM_pretrain.py:24-26,37)."""
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(SMILES * 2) + "\n")
    pv = np.arange(12 * 53, dtype="f4").reshape(12, 53)
    np.savez(tmp_path / "pv.npz", pv=pv)
    ds = PretrainDataset(str(corpus), property_cache=str(tmp_path / "pv.npz"))
    full = list(batch_pretrain(tok, ds, batch_size=2, seed=7))
    tail = list(batch_pretrain(tok, ds, batch_size=2, seed=7, skip_batches=2))
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a["prop"], b["prop"])
        np.testing.assert_array_equal(a["ids"], b["ids"])


def test_batch_pairs(tok, tmp_path):
    f = tmp_path / "u.txt"
    f.write_text("CCO.CC(=O)O\tCC(=O)OCC\nCCN\tCCNC\nCCC\tCCCC\n")
    ds = USPTODataset(str(f))
    batches = list(batch_pairs(tok, ds, batch_size=2, drop_last=True))
    assert len(batches) == 1
    assert batches[0]["src_ids"].shape[0] == 2
    assert batches[0]["tgt_ids"].shape[0] == 2
