"""Raw-text encoders: on-the-fly tokenization + BPE for interactive input.

Rebuild of the reference's encoder registry (``fairseq/data/encoders/``):
``fairseq_cli/interactive.py`` applies a tokenizer then a BPE before
dictionary lookup, and reverses both on output.  The WMT recipe's data is
subword-nmt BPE, so that scheme is implemented natively here (pure Python —
the reference shells out to the ``subword_nmt`` package,
``encoders/subword_nmt_bpe.py``); a whitespace tokenizer mirrors
``encoders/space_tokenizer.py``.

Algorithm (Sennrich et al. BPE, ``subword_nmt/apply_bpe.py`` semantics):
a word is split into characters with ``</w>`` appended to the last; merge
rules from the codes file are applied greedily in priority (line) order;
all output pieces except the word-final one carry the ``@@`` continuation
marker.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple


class SubwordNMTBPE:
    """Apply/remove subword-nmt BPE from a codes file."""

    SEPARATOR = "@@"

    def __init__(self, codes_path: str):
        self.bpe_ranks: Dict[Tuple[str, str], int] = {}
        with open(codes_path, encoding="utf-8") as f:
            lines = f.read().splitlines()
        if lines and lines[0].startswith("#version:"):
            lines = lines[1:]
        for i, line in enumerate(lines):
            parts = line.split()
            if len(parts) >= 2:
                self.bpe_ranks.setdefault((parts[0], parts[1]), i)
        self._cache: Dict[str, List[str]] = {}

    def _encode_word(self, word: str) -> List[str]:
        if word in self._cache:
            return self._cache[word]
        if not word:
            return []
        symbols = list(word[:-1]) + [word[-1] + "</w>"]
        while len(symbols) > 1:
            pairs = [(self.bpe_ranks.get((a, b), 1 << 30), i)
                     for i, (a, b) in enumerate(zip(symbols, symbols[1:]))]
            rank, idx = min(pairs)
            if rank == 1 << 30:
                break
            # merge ALL occurrences of the best pair left-to-right
            best = (symbols[idx], symbols[idx + 1])
            merged: List[str] = []
            i = 0
            while i < len(symbols):
                if (i < len(symbols) - 1
                        and (symbols[i], symbols[i + 1]) == best):
                    merged.append(symbols[i] + symbols[i + 1])
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = merged
        # strip the word-end marker; attach continuation separators
        if symbols[-1] == "</w>":
            symbols = symbols[:-1]
            if symbols:
                symbols[-1] += "</w>"  # reattach to real final symbol
        out = []
        for i, s in enumerate(symbols):
            if i == len(symbols) - 1:
                out.append(s[:-4] if s.endswith("</w>") else s)
            else:
                out.append(s + self.SEPARATOR)
        out = [s for s in out if s not in ("", self.SEPARATOR)]
        self._cache[word] = out
        return out

    def encode(self, sentence: str) -> str:
        pieces: List[str] = []
        for word in sentence.strip().split():
            pieces.extend(self._encode_word(word))
        return " ".join(pieces)

    @staticmethod
    def decode(sentence: str) -> str:
        """Reverse: drop continuation markers (fairseq ``post_process``)."""
        return remove_bpe(sentence)


def remove_bpe(sentence: str, symbol: str = "@@ ") -> str:
    """Drop BPE continuation markers (fairseq ``data_utils.post_process``
    for the subword-nmt symbol; ``--remove-bpe``)."""
    return (sentence + " ").replace(symbol, "").rstrip()


class SpaceTokenizer:
    """Whitespace tokenizer (``encoders/space_tokenizer.py``)."""

    _ws = re.compile(r"\s+")

    def encode(self, sentence: str) -> str:
        return self._ws.sub(" ", sentence.strip())

    def decode(self, sentence: str) -> str:
        return sentence


def build_bpe(name: Optional[str], codes: Optional[str] = None):
    """Encoder-registry lookup (``fairseq/data/encoders/__init__.py``)."""
    if name in (None, "", "none"):
        return None
    if name == "subword_nmt":
        if not codes:
            raise ValueError("--bpe subword_nmt requires --bpe-codes")
        return SubwordNMTBPE(codes)
    raise NotImplementedError(
        f"bpe scheme '{name}' (supported: subword_nmt)")


def build_tokenizer(name: Optional[str]):
    if name in (None, "", "none"):
        return None
    if name == "space":
        return SpaceTokenizer()
    raise NotImplementedError(
        f"tokenizer '{name}' (supported: space)")
