"""Dataset loaders mirroring the reference's 12 Dataset classes
(reference dataset.py; SURVEY C4).

Every loader yields ``(text, target)`` with ``text = '[CLS]' + smiles`` — the
literal CLS prefix is what anchors wordpiece tokenization (see
spmm_tpu.tokenizer).  Featurization/canonicalization is RDKit-gated; the
pretrain loader can instead read a precomputed ``.npz`` property cache so
TPU pipelines never block on descriptor computation.

Replicated reference quirks (SURVEY §7.4):
  - per-dataset hard-coded label mean/std (dataset.py:66-67,86-87,108-109,
    148-149,170-171);
  - ONLY Freesolv normalizes targets inside the dataset (dataset.py:181);
    the others return raw targets while eval still de-normalizes — the
    ``normalize_targets`` flag preserves the asymmetry;
  - BBBP filters RDKit-unparseable rows at load (dataset.py:128);
  - USPTO augmentation applies randomized-SMILES with p=0.5 per item
    (dataset.py:261-265).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import random
from typing import Iterator, Optional, Sequence

import numpy as np

from spmm_tpu.chem.featurizer import (
    HAS_RDKIT, calculate_property, canonicalize, randomized_smiles,
    require_rdkit,
)
from spmm_tpu.chem.normalize import PropertyStats

# (mean, std) label stats hard-coded by the reference (dataset.py)
LABEL_STATS = {
    "bace_r": (6.420878294545455, 1.345219669175284),
    "lipo": (2.162904761904762, 1.210992810122257),
    "clearance": (51.503692077727955, 53.50834365711207),
    "esol": (-2.8668758314855878, 2.066724108076815),
    "freesolv": (-3.2594736842105267, 3.2775297233608893),
}


@dataclasses.dataclass
class SupervisedDataset:
    """texts: '[CLS]'-prefixed SMILES; targets: scalar or vector labels."""

    texts: list[str]
    targets: np.ndarray
    value_mean: float = 0.0
    value_std: float = 1.0
    n_output: int = 1

    def __len__(self):
        return len(self.texts)


def _read_csv(path: str):
    import pandas as pd

    return pd.read_csv(path)


def _canon(smiles: str) -> str:
    out = canonicalize(smiles, isomeric=False)
    if out is None:
        raise ValueError(f"unparseable SMILES: {smiles!r}")
    return out


# --------------------------------------------------------------------------- #
# pretraining corpus
# --------------------------------------------------------------------------- #


class PretrainDataset:
    """SMILES lines -> (normalized 53-PV, '[CLS]'+canonical smiles)
    (reference SMILESDataset_pretrain, dataset.py:13-40).

    ``property_cache``: optional .npz with array 'pv' [N, 53] of RAW
    (un-normalized) property values aligned with the (sliced) lines —
    lets pretraining run without RDKit on the hot path.
    """

    def __init__(self, path: str, data_range: Optional[tuple[int, int]] = None,
                 shuffle: bool = False, seed: int = 0,
                 property_cache: Optional[str] = None,
                 stats: Optional[PropertyStats] = None):
        with open(path) as f:
            lines = [l.strip() for l in f]
        if data_range is not None:
            lines = lines[data_range[0]: data_range[1]]
        self.smiles = [l for l in lines if l]
        self.stats = stats or PropertyStats.load()
        self._pv_cache = None
        if property_cache and os.path.exists(property_cache):
            self._pv_cache = np.load(property_cache)["pv"].astype(np.float32)
            assert len(self._pv_cache) == len(self.smiles), (
                "property cache misaligned with corpus")
        if shuffle:
            rng = random.Random(seed)
            order = list(range(len(self.smiles)))
            rng.shuffle(order)
            self.smiles = [self.smiles[i] for i in order]
            if self._pv_cache is not None:
                self._pv_cache = self._pv_cache[order]

    def __len__(self):
        return len(self.smiles)

    def __getitem__(self, i: int) -> tuple[np.ndarray, str]:
        s = self.smiles[i]
        if self._pv_cache is not None:
            pv = self._pv_cache[i]
            text = "[CLS]" + (canonicalize(s) or s)
        else:
            require_rdkit("pretraining featurization (or supply property_cache)")
            canon = _canon(s)
            pv = calculate_property(canon, self.stats)
            text = "[CLS]" + canon
        return self.stats.normalize(pv), text

    def build_property_cache(self, out_path: str, n_workers: int = 8):
        """Precompute the raw PV table (one-off, RDKit required)."""
        from spmm_tpu.chem.featurizer import calculate_properties_batch

        canon = [_canon(s) for s in self.smiles]
        pvs = calculate_properties_batch(canon, self.stats, n_workers)
        arr = np.stack([p for p in pvs if p is not None])
        assert len(arr) == len(self.smiles), "corpus contains invalid SMILES"
        np.savez_compressed(out_path, pv=arr)


# --------------------------------------------------------------------------- #
# MoleculeNet / DILI loaders (reference dataset.py:43-241)
# --------------------------------------------------------------------------- #


def load_bace_c(path: str) -> SupervisedDataset:
    df = _read_csv(path)
    texts = ["[CLS]" + _canon(r) for r in df["mol"]]
    return SupervisedDataset(texts, df["Class"].to_numpy(np.int32), n_output=2)


def load_bbbp(path: str) -> SupervisedDataset:
    df = _read_csv(path)
    texts, ys = [], []
    for _, row in df.iterrows():
        try:
            texts.append("[CLS]" + _canon(row["smiles"]))
        except ValueError:
            continue  # reference filters unparseable rows (dataset.py:128)
        ys.append(int(row["p_np"]))
    return SupervisedDataset(texts, np.asarray(ys, np.int32), n_output=2)


def load_dili(path: str) -> SupervisedDataset:
    df = _read_csv(path)
    texts = ["[CLS]" + _canon(r) for r in df["Smiles"]]
    return SupervisedDataset(texts, df["Liver"].to_numpy(np.int32), n_output=2)


def _regression(path: str, smiles_col: str, target_col: str, stats_key: str,
                normalize_targets: bool = False) -> SupervisedDataset:
    df = _read_csv(path)
    mean, std = LABEL_STATS[stats_key]
    texts = ["[CLS]" + _canon(r) for r in df[smiles_col]]
    y = df[target_col].to_numpy(np.float32)
    if normalize_targets:       # ONLY freesolv (reference dataset.py:181)
        y = (y - mean) / std
    return SupervisedDataset(texts, y, value_mean=mean, value_std=std)


def load_bace_r(path):
    return _regression(path, "smiles", "target", "bace_r")


def load_lipo(path):
    return _regression(path, "smiles", "exp", "lipo")


def load_clearance(path):
    return _regression(path, "smiles", "target", "clearance")


def load_esol(path):
    return _regression(
        path, "smiles", "ESOL predicted log solubility in mols per litre",
        "esol")


def load_freesolv(path):
    return _regression(path, "smiles", "target", "freesolv",
                       normalize_targets=True)


def load_clintox(path: str) -> SupervisedDataset:
    df = _read_csv(path)
    texts = ["[CLS]" + _canon(r) for r in df["smiles"]]
    y = df[["FDA_APPROVED", "CT_TOX"]].to_numpy(np.float32)
    return SupervisedDataset(texts, y, n_output=2)


def load_sider(path: str) -> SupervisedDataset:
    df = _read_csv(path)
    texts = ["[CLS]" + _canon(r) for r in df["smiles"]]
    y = df.iloc[:, 1:].to_numpy(np.float32)
    return SupervisedDataset(texts, y, n_output=y.shape[1])


DOWNSTREAM_LOADERS = {
    "bace": load_bace_c,
    "bbbp": load_bbbp,
    "lidi": load_dili,
    "bace_r": load_bace_r,
    "lipo": load_lipo,
    "clearance": load_clearance,
    "esol": load_esol,
    "freesolv": load_freesolv,
    "clintox": load_clintox,
    "sider": load_sider,
}


# --------------------------------------------------------------------------- #
# USPTO reaction datasets (reference dataset.py:243-296)
# --------------------------------------------------------------------------- #


class USPTODataset:
    """Forward synthesis: tab-separated 'reactants<TAB>product' lines."""

    def __init__(self, path: str, data_range=None, augment: bool = False,
                 seed: int = 0):
        with open(path) as f:
            lines = [l.strip() for l in f if l.strip()]
        if data_range:
            lines = lines[data_range[0]: data_range[1]]
        self.pairs = [tuple(l.split("\t")) for l in lines]
        self.augment = augment
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int) -> tuple[str, str]:
        rs, ps = self.pairs[i]
        if self.augment and self._rng.random() > 0.5:
            rs = randomized_smiles(rs, self._rng) or rs
            ps = randomized_smiles(ps, self._rng) or ps
        return "[CLS]" + rs, "[CLS]" + ps


class USPTORetroDataset:
    """Retro synthesis from the pickled USPTO-50k DataFrame
    (reference dataset.py:269-296): items are (product, reactants)."""

    def __init__(self, pickle_path: str, split: str = "train",
                 augment: bool = False, seed: int = 0):
        require_rdkit("USPTO-50k mol-object deserialization")
        from rdkit import Chem

        with open(pickle_path, "rb") as f:
            df = pickle.load(f)
        rows = [df.iloc[i] for i in range(len(df))]
        self.rows = [r for r in rows if r["set"] == split]
        self.augment = augment
        self._rng = random.Random(seed)
        self._chem = Chem

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i: int) -> tuple[str, str]:
        d = self.rows[i]
        p_mol, r_mol = d["products_mol"], d["reactants_mol"]
        do_aug = self.augment and self._rng.random() > 0.5
        if do_aug:
            idx = list(range(p_mol.GetNumAtoms()))
            self._rng.shuffle(idx)
            p_mol = self._chem.RenumberAtoms(p_mol, idx)
            idx = list(range(r_mol.GetNumAtoms()))
            self._rng.shuffle(idx)
            r_mol = self._chem.RenumberAtoms(r_mol, idx)
        to_s = lambda m: self._chem.MolToSmiles(
            m, canonical=not do_aug, isomericSmiles=False)
        return "[CLS]" + to_s(p_mol), "[CLS]" + to_s(r_mol)
