"""Raw-text encoders (``fairseq/data/encoders/`` rebuild): subword-nmt BPE
application/removal and the tokenizer/registry surface."""
import pytest

from efficient_attention_tpu.data.encoders import (
    SpaceTokenizer,
    SubwordNMTBPE,
    build_bpe,
    build_tokenizer,
)


@pytest.fixture
def codes(tmp_path):
    p = tmp_path / "codes.bpe"
    p.write_text(
        "#version: 0.2\n"
        "l o\n"
        "lo w\n"
        "e r</w>\n"
        "low er</w>\n",
        encoding="utf-8")
    return str(p)


class TestSubwordNMT:
    def test_merges_apply_in_priority_order(self, codes):
        bpe = SubwordNMTBPE(codes)
        # l+o -> lo, lo+w -> low, e+r</w> -> er</w>, low+er</w> -> lower
        assert bpe.encode("lower") == "lower"
        # 'low' alone: l+o -> lo; ('lo', 'w</w>') is NOT a rule (word-final
        # 'w' carries the end marker), so it stays split
        assert bpe.encode("low") == "lo@@ w"
        # unknown word: no rules apply -> fully split
        assert bpe.encode("xyz") == "x@@ y@@ z"

    def test_multi_word_and_roundtrip(self, codes):
        bpe = SubwordNMTBPE(codes)
        enc = bpe.encode("lower low xyz")
        assert enc == "lower lo@@ w x@@ y@@ z"
        assert SubwordNMTBPE.decode(enc) == "lower low xyz"

    def test_single_char_word(self, codes):
        bpe = SubwordNMTBPE(codes)
        assert bpe.encode("a") == "a"

    def test_registry(self, codes):
        assert build_bpe(None) is None
        assert build_bpe("subword_nmt", codes) is not None
        with pytest.raises(ValueError):
            build_bpe("subword_nmt")
        with pytest.raises(NotImplementedError):
            build_bpe("gpt2")
        assert build_tokenizer(None) is None
        assert isinstance(build_tokenizer("space"), SpaceTokenizer)

    def test_space_tokenizer_normalizes(self):
        t = SpaceTokenizer()
        assert t.encode("  a\tb   c ") == "a b c"


class TestInteractiveRawText:
    def test_interactive_accepts_raw_text(self, tmp_path, monkeypatch,
                                          capsys):
        """End-to-end: interactive with --bpe subword_nmt consumes raw text
        whose BPE form is in-vocabulary (VERDICT r2 item 9)."""
        import io
        import os

        import numpy as np

        # corpus whose "words" are the BPE pieces
        words = ["lo@@", "w", "lower"]
        src = tmp_path / "corpus"
        src.mkdir()
        rng = np.random.default_rng(0)
        for split in ("train", "valid", "test"):
            with open(src / f"{split}.src", "w", encoding="utf-8") as fs, \
                    open(src / f"{split}.tgt", "w", encoding="utf-8") as ft:
                for _ in range(20):
                    k = int(rng.integers(1, 3))
                    sent = [words[int(i)] for i in rng.integers(0, 3, k)]
                    fs.write(" ".join(sent) + "\n")
                    ft.write(" ".join(reversed(sent)) + "\n")
        from efficient_attention_tpu.cli import preprocess

        dest = str(tmp_path / "bin")
        preprocess.cli_main([
            "--source-lang", "src", "--target-lang", "tgt",
            "--trainpref", str(src / "train"),
            "--validpref", str(src / "valid"),
            "--testpref", str(src / "test"), "--destdir", dest])

        codes = tmp_path / "codes.bpe"
        codes.write_text("l o\nlo w\ne r</w>\nlow er</w>\n",
                         encoding="utf-8")

        from efficient_attention_tpu.cli import interactive

        monkeypatch.setattr("sys.stdin", io.StringIO("low lower\n"))
        interactive.cli_main([
            "--data", dest, "--source-lang", "src", "--target-lang", "tgt",
            "--encoder-embed-dim", "32", "--encoder-ffn-embed-dim", "32",
            "--encoder-layers", "1", "--encoder-attention-heads", "2",
            "--beam", "1", "--max-len-b", "8",
            "--bpe", "subword_nmt", "--bpe-codes", str(codes)])
        out = capsys.readouterr().out
        hline = [ln for ln in out.splitlines() if ln.startswith("H-")]
        assert hline, out
        # output is post-processed: no continuation markers survive
        assert "@@" not in hline[0]
