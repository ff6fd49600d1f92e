"""Scoring: corpus BLEU (native counter), chrF, WER — the fairseq scorer
registry surface (``fairseq/scoring/``)."""
from efficient_attention_tpu.scoring.bleu import BleuScorer
from efficient_attention_tpu.scoring.chrf import ChrFScorer
from efficient_attention_tpu.scoring.wer import WerScorer

_SCORERS = {"bleu": BleuScorer, "chrf": ChrFScorer, "wer": WerScorer}


def build_scorer(name: str):
    """Scorer-registry lookup (``fairseq/scoring/__init__.py``)."""
    try:
        return _SCORERS[name]()
    except KeyError:
        raise KeyError(
            f"unknown scorer '{name}' (available: {sorted(_SCORERS)})")


__all__ = ["BleuScorer", "ChrFScorer", "WerScorer", "build_scorer"]
