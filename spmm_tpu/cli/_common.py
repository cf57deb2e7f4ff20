"""Shared CLI helpers."""

from __future__ import annotations

import random
from typing import Optional

import numpy as np

from spmm_tpu.chem.normalize import PropertyStats
from spmm_tpu.tokenizer import SmilesTokenizer
from spmm_tpu.utils.compile_cache import enable_compilation_cache


def seed_everything(seed: Optional[int]) -> int:
    """Random seed per run unless given (reference seeds randomly in most
    scripts, d_smiles2pv.py:113; fixed via --seed in fine-tunes).

    Also flips on the persistent compilation cache: every CLI run calls this
    before its first jit, so full-size executables compile once per machine.
    """
    enable_compilation_cache()
    if seed is None:
        seed = random.randint(0, 1000)
    random.seed(seed)
    np.random.seed(seed)
    print("seed:", seed)
    return seed


def make_tokenizer(vocab_path: Optional[str] = None) -> SmilesTokenizer:
    from spmm_tpu.tokenizer import load_vocab

    vocab = load_vocab(vocab_path) if vocab_path else None
    return SmilesTokenizer(vocab)


def load_stats(path: Optional[str] = None) -> PropertyStats:
    return PropertyStats.load(path)
