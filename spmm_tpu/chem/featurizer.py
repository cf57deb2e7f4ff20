"""53-descriptor property featurization (RDKit-gated).

Replicates reference calc_property.py:14-28: descriptor functions resolved by
name from ``rdkit.Chem.Descriptors`` with ``QED`` special-cased to
``Chem.QED.qed``; pinned to rdkit 2023.3.1 semantics (descriptor values are
RDKit-version-sensitive — SURVEY §4).

RDKit is a C++ library and is not always available (it is absent in this
build image); every function is gated:
  - ``calculate_property`` raises a clear RuntimeError without RDKit —
    pipelines should then consume precomputed property files
    (spmm_tpu.data.datasets supports .npz property caches);
  - ``canonicalize`` falls back to identity;
  - ``is_valid_smiles`` falls back to the pure-Python syntax parser.

``calculate_properties_batch`` fans work over a process pool: the 53
descriptors (BertzCT, Chi*, EState...) are CPU-heavy and must not starve the
TPU during pretraining (SURVEY §7.4).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Sequence

import numpy as np

from spmm_tpu.chem.normalize import PropertyStats
from spmm_tpu.chem.smiles import is_valid_syntax

try:
    from rdkit import Chem, RDLogger
    from rdkit.Chem import Descriptors

    RDLogger.DisableLog("rdApp.*")
    HAS_RDKIT = True
except ImportError:
    HAS_RDKIT = False

_DESCRIPTOR_FNS: dict = {}


def _descriptor_fns(names: Sequence[str]):
    key = tuple(names)
    if key not in _DESCRIPTOR_FNS:
        fns = []
        for n in names:
            if n == "QED":
                fns.append(lambda m: Chem.QED.qed(m))
            else:
                fns.append(getattr(Descriptors, n))
        _DESCRIPTOR_FNS[key] = fns
    return _DESCRIPTOR_FNS[key]


def require_rdkit(what: str = "descriptor computation"):
    if not HAS_RDKIT:
        raise RuntimeError(
            f"RDKit is required for {what} but is not installed. "
            "Install rdkit==2023.3.1 or supply precomputed properties "
            "(see spmm_tpu.data.datasets property caches).")


def calculate_property(smiles: str,
                       stats: Optional[PropertyStats] = None) -> np.ndarray:
    """Raw (un-normalized) 53-dim property vector for one SMILES."""
    require_rdkit()
    stats = stats or PropertyStats.load()
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        raise ValueError(f"invalid SMILES: {smiles!r}")
    fns = _descriptor_fns(stats.names)
    return np.asarray([f(mol) for f in fns], np.float32)


def _worker(args):
    smiles, names = args
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    out = []
    for n in names:
        fn = Chem.QED.qed if n == "QED" else getattr(Descriptors, n)
        out.append(fn(mol))
    return np.asarray(out, np.float32)


def calculate_properties_batch(
    smiles_list: Sequence[str],
    stats: Optional[PropertyStats] = None,
    n_workers: Optional[int] = None,
) -> list[Optional[np.ndarray]]:
    """Parallel featurization; None for molecules RDKit rejects."""
    require_rdkit()
    stats = stats or PropertyStats.load()
    if n_workers is None:
        n_workers = min(os.cpu_count() or 1, 16)
    if n_workers <= 1 or len(smiles_list) < 64:
        return [_worker((s, stats.names)) for s in smiles_list]
    import multiprocessing as mp

    with mp.Pool(n_workers) as pool:
        return pool.map(_worker, [(s, stats.names) for s in smiles_list],
                        chunksize=64)


def canonicalize(smiles: str, isomeric: bool = False) -> Optional[str]:
    """RDKit canonical SMILES (reference dataset.py:37); identity fallback."""
    if not HAS_RDKIT:
        return smiles if is_valid_syntax(smiles) else None
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    return Chem.MolToSmiles(mol, isomericSmiles=isomeric, canonical=True)


def randomized_smiles(smiles: str, rng) -> Optional[str]:
    """Randomized-SMILES augmentation (reference pysmilesutils MolAugmenter,
    dataset.py:261-265): random atom order + non-canonical output."""
    if not HAS_RDKIT:
        return smiles if is_valid_syntax(smiles) else None
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    idx = list(range(mol.GetNumAtoms()))
    rng.shuffle(idx)
    mol = Chem.RenumberAtoms(mol, idx)
    return Chem.MolToSmiles(mol, canonical=False, isomericSmiles=False)


def is_valid_smiles(smiles: str) -> bool:
    """Chemical validity with RDKit; syntax-only without."""
    if not smiles:
        return False
    if HAS_RDKIT:
        return Chem.MolFromSmiles(smiles) is not None
    return is_valid_syntax(smiles)
