"""Vocabulary with fairseq-compatible special-symbol layout.

Replaces ``fairseq/data/dictionary.py``: symbols are stored as
``<s>=0, <pad>=1, </s>=2, <unk>=3`` followed by corpus tokens in descending
frequency, and the text format (``word count`` per line) round-trips with
fairseq dict.txt files so existing binarized corpora can be re-used.
"""
from __future__ import annotations

from collections import Counter
from typing import Iterable, List, Optional

import numpy as np


class Dictionary:
    def __init__(self, bos="<s>", pad="<pad>", eos="</s>", unk="<unk>"):
        self.symbols: List[str] = []
        self.count: List[int] = []
        self.indices = {}
        self.bos_word, self.pad_word, self.eos_word, self.unk_word = (
            bos, pad, eos, unk)
        self.bos_index = self.add_symbol(bos)
        self.pad_index = self.add_symbol(pad)
        self.eos_index = self.add_symbol(eos)
        self.unk_index = self.add_symbol(unk)
        self.nspecial = len(self.symbols)

    def __len__(self):
        return len(self.symbols)

    def __getitem__(self, idx):
        return self.symbols[idx] if idx < len(self.symbols) else self.unk_word

    def bos(self):
        return self.bos_index

    def pad(self):
        return self.pad_index

    def eos(self):
        return self.eos_index

    def unk(self):
        return self.unk_index

    def add_symbol(self, word: str, n: int = 1) -> int:
        if word in self.indices:
            idx = self.indices[word]
            self.count[idx] += n
            return idx
        idx = len(self.symbols)
        self.indices[word] = idx
        self.symbols.append(word)
        self.count.append(n)
        return idx

    def index(self, word: str) -> int:
        return self.indices.get(word, self.unk_index)

    def encode_line(self, line: str, append_eos: bool = True) -> np.ndarray:
        words = line.strip().split()
        ids = [self.index(w) for w in words]
        if append_eos:
            ids.append(self.eos_index)
        return np.asarray(ids, dtype=np.int32)

    def string(self, ids: Iterable[int], remove_special: bool = True) -> str:
        out = []
        for i in ids:
            i = int(i)
            if remove_special and i in (self.bos_index, self.pad_index,
                                        self.eos_index):
                continue
            out.append(self[i])
        return " ".join(out)

    def finalize(self, threshold: int = -1, nwords: int = -1,
                 padding_factor: int = 8) -> None:
        """Sort corpus symbols by frequency, apply threshold, pad vocab size
        to a multiple (fairseq ``Dictionary.finalize``; the padding keeps the
        embedding matmul MXU-aligned)."""
        special = list(zip(self.symbols[: self.nspecial],
                           self.count[: self.nspecial]))
        corpus = sorted(
            zip(self.symbols[self.nspecial:], self.count[self.nspecial:]),
            key=lambda kv: (-kv[1], kv[0]))
        if threshold > 0:
            corpus = [(w, c) for w, c in corpus if c >= threshold]
        if nwords > 0:
            corpus = corpus[: nwords - self.nspecial]
        symbols = special + corpus
        while padding_factor > 1 and len(symbols) % padding_factor != 0:
            symbols.append((f"madeupword{len(symbols):04d}", 0))
        self.symbols = [w for w, _ in symbols]
        self.count = [c for _, c in symbols]
        self.indices = {w: i for i, (w, _) in enumerate(symbols)}

    @classmethod
    def build_from_corpus(cls, lines: Iterable[str], threshold=-1, nwords=-1,
                          padding_factor=8) -> "Dictionary":
        d = cls()
        counter = Counter()
        for line in lines:
            counter.update(line.strip().split())
        for w, c in counter.items():
            d.add_symbol(w, c)
        d.finalize(threshold, nwords, padding_factor)
        return d

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            for w, c in zip(self.symbols[self.nspecial:],
                            self.count[self.nspecial:]):
                f.write(f"{w} {c}\n")

    @classmethod
    def load(cls, path: str) -> "Dictionary":
        d = cls()
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").rsplit(" ", 1)
                if len(parts) == 2:
                    d.add_symbol(parts[0], int(parts[1]))
        return d
