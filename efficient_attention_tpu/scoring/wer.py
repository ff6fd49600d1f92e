"""Word error rate scorer — ``fairseq/scoring/wer.py`` equivalent.

The reference delegates to the ``editdistance`` package; here the
Levenshtein distance comes from the framework's own native helper
(``native/eatpu_native.cpp`` ``eatpu_edit_distance``, the libnat twin)
with its pure-Python fallback.
"""
from __future__ import annotations

from efficient_attention_tpu.native import edit_distance


class WerScorer:
    """Corpus WER accumulated over (ref, hyp) string pairs."""

    def __init__(self):
        self.distance = 0
        self.ref_length = 0
        self._vocab = {}

    def _ids(self, line: str):
        out = []
        for w in line.split():
            if w not in self._vocab:
                self._vocab[w] = len(self._vocab)
            out.append(self._vocab[w])
        return out

    def add_string(self, ref: str, pred: str) -> None:
        r = self._ids(ref)
        h = self._ids(pred)
        self.distance += edit_distance(r, h)
        self.ref_length += len(r)

    def score(self) -> float:
        return 100.0 * self.distance / max(1, self.ref_length)

    def result_string(self) -> str:
        return f"WER = {self.score():.2f}"
