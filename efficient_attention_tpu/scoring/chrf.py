"""chrF scorer (Popović 2015) — ``fairseq/scoring/chrf.py`` equivalent.

The reference delegates to sacrebleu's ``corpus_chrf``; this is a native
implementation of the same statistic with sacrebleu's defaults: character
n-grams of order 1..6, beta=2, whitespace removed before n-gram
extraction, statistics aggregated over the corpus then averaged across
orders (chrF is the arithmetic mean of the per-order F-beta scores).
"""
from __future__ import annotations

from collections import Counter
from typing import List

CHAR_ORDER = 6
BETA = 2.0


def _ngrams(text: str, n: int) -> Counter:
    s = "".join(text.split())  # sacrebleu removes whitespace by default
    return Counter(s[i:i + n] for i in range(len(s) - n + 1))


class ChrFScorer:
    """Corpus chrF accumulated over (ref, hyp) string pairs."""

    def __init__(self, char_order: int = CHAR_ORDER, beta: float = BETA):
        self.char_order = char_order
        self.beta = beta
        # per-order [matches, hyp_count, ref_count]
        self._stats = [[0, 0, 0] for _ in range(char_order)]

    def add_string(self, ref: str, pred: str) -> None:
        for n in range(1, self.char_order + 1):
            rg = _ngrams(ref, n)
            hg = _ngrams(pred, n)
            match = sum((rg & hg).values())
            st = self._stats[n - 1]
            st[0] += match
            st[1] += sum(hg.values())
            st[2] += sum(rg.values())

    def score(self) -> float:
        b2 = self.beta ** 2
        f_scores: List[float] = []
        for match, hyp_n, ref_n in self._stats:
            if hyp_n + ref_n == 0:
                # effective order: corpora shorter than n chars contribute
                # no n-grams at this order (sacrebleu's behavior)
                continue
            prec = match / hyp_n if hyp_n else 0.0
            rec = match / ref_n if ref_n else 0.0
            if prec + rec == 0:
                f_scores.append(0.0)
            else:
                f_scores.append(
                    (1 + b2) * prec * rec / (b2 * prec + rec))
        if not f_scores:
            return 0.0
        return 100.0 * sum(f_scores) / len(f_scores)

    def result_string(self) -> str:
        return f"chrF2 = {self.score():.2f}"
