"""Wordpiece SMILES tokenizer.

Host-side, pure-Python implementation of the tokenization pipeline the
reference builds from HF ``BertTokenizer`` + ``WordpieceTokenizer`` over a
300-token BPE-derived vocab (reference SPMM_pretrain.py:19-20,
vocab_bpe_300.txt): greedy longest-match wordpiece with ``##`` continuation
prefixes — NOT online BPE merges.

Reference semantics replicated exactly:
  - the raw string is whitespace-split and each word goes through greedy
    wordpiece WHOLE — special tokens are NOT split out first.  All 296
    non-special vocab entries are ``##``-prefixed, so a bare SMILES word can
    never match an initial piece: the literal "[CLS]" the datasets prepend
    (reference dataset.py:40) is what anchors the greedy match ("[CLS]" is an
    ordinary vocab entry), after which the molecule tokenizes as
    ``##``-continuations.  (The reference constructs transformers-4.30
    BertTokenizer directly from a vocab file, which leaves the special-token
    trie empty; modern transformers would split "[CLS]" out and reduce every
    molecule to [UNK].);
  - greedy longest-match with ``##`` prefix for non-initial pieces;
  - words longer than ``max_input_chars_per_word=250`` become [UNK];
  - encoding adds [CLS] ... [SEP] around the pieces, truncating the total
    length to ``max_len`` when ``truncation=True`` (HF truncates the piece
    list to max_len-2 and re-adds specials);
  - ``decode``: " ".join(tokens).replace(" ##", "").strip(), then the caller
    removes "[CLS]" (reference d_pv2smiles_single.py:105).

TPU-specific addition: ``encode_batch`` pads to static bucket lengths so that
XLA sees a small, fixed set of shapes (the reference pads to the dynamic
longest-in-batch, which would trigger one recompile per length).
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Sequence

import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")

PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"
SPECIAL_TOKENS = (PAD, UNK, CLS, SEP)


def load_vocab(path: str | None = None) -> dict[str, int]:
    """Load the 300-token vocab (token -> id)."""
    if path is None:
        path = os.path.join(_ASSET_DIR, "vocab.json")
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    # also accept a reference-style one-token-per-line file
    with open(path) as f:
        return {line.rstrip("\n"): i for i, line in enumerate(f)}


class SmilesTokenizer:
    """Greedy longest-match wordpiece tokenizer over the SMILES fragment vocab."""

    def __init__(self, vocab: dict[str, int] | None = None,
                 max_input_chars_per_word: int = 250):
        self.vocab = vocab if vocab is not None else load_vocab()
        self.inv_vocab = {i: t for t, i in self.vocab.items()}
        self.max_input_chars_per_word = max_input_chars_per_word
        self.pad_token_id = self.vocab[PAD]
        self.unk_token_id = self.vocab[UNK]
        self.cls_token_id = self.vocab[CLS]
        self.sep_token_id = self.vocab[SEP]
        self.vocab_size = len(self.vocab)
        # longest vocab entry (sans ## prefix) bounds the greedy search window
        self._max_piece_len = max(
            len(t[2:]) if t.startswith("##") else len(t) for t in self.vocab
        )
        self._native = None
        if native_available():
            try:
                self._native = NativeWordpiece(self.vocab,
                                               max_input_chars_per_word=
                                               max_input_chars_per_word)
            except OSError:
                self._native = None

    # ------------------------------------------------------------------ #
    # string -> pieces
    # ------------------------------------------------------------------ #

    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > self.max_input_chars_per_word:
            return [UNK]
        pieces: list[str] = []
        start = 0
        n = len(word)
        while start < n:
            end = min(n, start + self._max_piece_len)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        pieces: list[str] = []
        for word in text.split():
            pieces.extend(self._wordpiece(word))
        return pieces

    # ------------------------------------------------------------------ #
    # pieces <-> ids
    # ------------------------------------------------------------------ #

    def convert_tokens_to_ids(self, tokens: Iterable[str]) -> list[int]:
        unk = self.unk_token_id
        return [self.vocab.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids: Iterable[int]) -> list[str]:
        return [self.inv_vocab.get(int(i), UNK) for i in ids]

    def encode(self, text: str, max_len: int | None = None,
               truncation: bool = False) -> list[int]:
        """[CLS] + pieces + [SEP]; truncate total length to max_len if asked."""
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        if truncation and max_len is not None and len(ids) > max_len - 2:
            ids = ids[: max_len - 2]
        return [self.cls_token_id] + ids + [self.sep_token_id]

    def decode(self, ids: Sequence[int], strip_special: bool = True) -> str:
        """ids -> string with '##' continuations merged (HF convert_tokens_to_string).

        [UNK] is kept in the output, matching the reference decode path
        (d_pv2smiles_single.py:105 only removes '[CLS]').
        """
        tokens = self.convert_ids_to_tokens(ids)
        s = " ".join(tokens).replace(" ##", "").strip()
        if strip_special:
            for t in (PAD, CLS, SEP):
                s = s.replace(t, "")
            s = s.strip()
        return s

    # ------------------------------------------------------------------ #
    # batched, static-shape encoding for the device
    # ------------------------------------------------------------------ #

    def encode_batch(
        self,
        texts: Sequence[str],
        max_len: int = 100,
        truncation: bool = True,
        buckets: Sequence[int] | None = None,
        drop_leading_cls: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Encode to (input_ids, attention_mask) int32 arrays, bucket-padded.

        ``drop_leading_cls`` mirrors the reference scripts' ``input_ids[:, 1:]``
        (reference SPMM_models.py:357): the datasets prepend a literal '[CLS]'
        string, so the tokenizer's own leading [CLS] column is dropped and the
        string-token [CLS] plays the role of BOS.

        Uses the native C++ encoder (native/libspmm_host.so) when built —
        ~5x the Python path on pretraining ingestion; output is identical
        (parity-tested in tests/test_native_tokenizer.py).
        """
        if self._native is not None and truncation and max_len is not None:
            raw, lens = self._native.encode_batch_padded(list(texts), max_len)
            if drop_leading_cls:
                raw, lens = raw[:, 1:], lens - 1
            longest = int(lens.max())
            if buckets:
                longest = next((b for b in sorted(buckets) if b >= longest),
                               max(buckets))
            if longest > raw.shape[1]:
                # a bucket wider than the raw buffer (max_len, minus one
                # when the leading CLS is dropped): extend with pad zeros
                # instead of silently under-slicing vs the bucket-wide mask
                raw = np.pad(raw, [(0, 0), (0, longest - raw.shape[1])])
            ids = np.ascontiguousarray(raw[:, :longest])
            mask = (np.arange(longest)[None, :]
                    < lens[:, None]).astype(np.int32)
            ids = ids * mask
            return ids, mask
        seqs = [self.encode(t, max_len=max_len, truncation=truncation) for t in texts]
        if drop_leading_cls:
            seqs = [s[1:] for s in seqs]
        longest = max(len(s) for s in seqs)
        if buckets:
            pad_len = next((b for b in sorted(buckets) if b >= longest), None)
            if pad_len is None:
                if truncation:
                    pad_len = max(buckets)
                else:
                    # no truncation requested (reference rxn path pads to the
                    # unbounded longest, d_rxn_prediction.py:39): grow past the
                    # bucket set in aligned steps rather than cutting [SEP] off
                    pad_len = -(-longest // 32) * 32
            longest = pad_len
        ids = np.zeros((len(seqs), longest), dtype=np.int32)   # 0 == [PAD]
        mask = np.zeros((len(seqs), longest), dtype=np.int32)
        for i, s in enumerate(seqs):
            s = s[:longest]
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return ids, mask


def default_buckets(max_len: int = 100) -> tuple[int, ...]:
    """Static pad buckets: powers-of-two-ish steps up to max_len."""
    b = [16, 24, 32, 48, 64, 80, max_len]
    return tuple(x for x in b if x <= max_len) or (max_len,)


# --------------------------------------------------------------------------- #
# native (C++) fast path — see native/wordpiece.cpp
# --------------------------------------------------------------------------- #

_NATIVE_LIB = os.path.join(os.path.dirname(__file__), "..", "native",
                           "libspmm_host.so")


class NativeWordpiece:
    """ctypes binding over native/libspmm_host.so (build: make -C native).

    Same semantics as SmilesTokenizer.encode/encode_batch; used by the data
    pipeline for high-throughput pretraining ingestion.
    """

    def __init__(self, vocab: dict[str, int] | None = None,
                 lib_path: str | None = None,
                 max_input_chars_per_word: int = 250):
        import ctypes

        self._ct = ctypes
        path = lib_path or _NATIVE_LIB
        self._lib = ctypes.CDLL(path)
        self._lib.wp_create.restype = ctypes.c_void_p
        self._lib.wp_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32]
        self._lib.wp_free.argtypes = [ctypes.c_void_p]
        self._lib.wp_encode.restype = ctypes.c_int32
        self._lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        self._lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]

        vocab = vocab if vocab is not None else load_vocab()
        tokens = sorted(vocab, key=vocab.get)
        arr = (ctypes.c_char_p * len(tokens))(
            *[t.encode("utf-8") for t in tokens])
        self._handle = self._lib.wp_create(arr, len(tokens),
                                           max_input_chars_per_word)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.wp_free(self._handle)
            self._handle = None

    def encode(self, text: str, max_len: int | None = None,
               truncation: bool = False) -> list[int]:
        cap = 4096
        out = (self._ct.c_int32 * cap)()
        n = self._lib.wp_encode(
            self._handle, text.encode("utf-8"),
            1 if (truncation and max_len) else 0, max_len or 0, out, cap)
        if n < 0:
            raise ValueError("sequence too long for native encode buffer")
        return list(out[:n])

    def encode_batch_padded(self, texts: Sequence[str], max_len: int
                            ) -> tuple[np.ndarray, np.ndarray]:
        """[n, max_len] ids (0-padded, truncated) + lengths."""
        n = len(texts)
        arr = (self._ct.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        ids = np.zeros((n, max_len), np.int32)
        lens = np.zeros((n,), np.int32)
        self._lib.wp_encode_batch(
            self._handle, arr, n, 1, max_len,
            ids.ctypes.data_as(self._ct.POINTER(self._ct.c_int32)),
            lens.ctypes.data_as(self._ct.POINTER(self._ct.c_int32)))
        return ids, lens


def native_available() -> bool:
    return os.path.exists(_NATIVE_LIB)
