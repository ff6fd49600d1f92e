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


# ---------------------------------------------------------------------------
# Byte-level schemes (``encoders/{bytes,characters}.py`` + ``byte_utils.py``)
# ---------------------------------------------------------------------------

_SPACE = chr(32)
_SPACE_ESCAPE = chr(9601)  # lower one-eighth block, the fairseq space marker
# printable Latin bytes pass through as themselves; everything else maps to
# chr(256 + byte) so any byte sequence round-trips through a str
_PRINTABLE_LATIN = frozenset(
    list(range(32, 127)) + list(range(161, 173)) + list(range(174, 256)))
_BYTE_TO_BCHAR = {
    b: chr(b) if b in _PRINTABLE_LATIN else chr(256 + b) for b in range(256)}
_BCHAR_TO_BYTE = {bc: b for b, bc in _BYTE_TO_BCHAR.items()}
_WS_NORM = re.compile(r"\s+")


def byte_encode(x: str) -> str:
    """UTF-8 bytes of ``x`` rendered as one str character per byte."""
    return "".join(
        _BYTE_TO_BCHAR[b] for b in _WS_NORM.sub(_SPACE, x).encode("utf-8"))


def byte_decode(x: str) -> str:
    """Inverse of :func:`byte_encode`; '' if the bytes are not valid UTF-8."""
    try:
        return bytes(_BCHAR_TO_BYTE[bc] for bc in x).decode("utf-8")
    except (ValueError, KeyError):
        return ""


def smart_byte_decode(x: str) -> str:
    """Decode, recovering the longest valid character subsequence when the
    generated byte string is malformed (``byte_utils.smart_byte_decode``:
    DP over prefixes maximizing the number of decoded characters)."""
    out = byte_decode(x)
    if out or not x:
        return out
    n = len(x)
    best = [0] * (n + 1)   # best[i] = max chars decodable from x[:i]
    back = [0] * (n + 1)   # predecessor cut point
    for i in range(1, n + 1):
        best[i], back[i] = best[i - 1], i - 1  # drop byte i-1
        for j in range(1, min(4, i) + 1):  # UTF-8 chars are 1-4 bytes
            if best[i - j] + 1 > best[i] and byte_decode(x[i - j:i]):
                best[i], back[i] = best[i - j] + 1, i - j
    pieces: List[str] = []
    i = n
    while i > 0:
        if best[i] == best[back[i]] + 1:
            pieces.append(byte_decode(x[back[i]:i]))
        i = back[i]
    return "".join(reversed(pieces))


class BytesBPE:
    """Byte-level vocabulary (``encoders/bytes.py``): every UTF-8 byte is a
    token; spaces are escaped so the token stream stays space-separable."""

    @staticmethod
    def encode(x: str) -> str:
        escaped = byte_encode(x).replace(_SPACE, _SPACE_ESCAPE)
        return _SPACE.join(escaped)

    @staticmethod
    def decode(x: str) -> str:
        return smart_byte_decode(
            x.replace(_SPACE, "").replace(_SPACE_ESCAPE, _SPACE))


class CharactersBPE:
    """Character-level vocabulary (``encoders/characters.py``)."""

    @staticmethod
    def encode(x: str) -> str:
        return _SPACE.join(x.replace(_SPACE, _SPACE_ESCAPE))

    @staticmethod
    def decode(x: str) -> str:
        return x.replace(_SPACE, "").replace(_SPACE_ESCAPE, _SPACE)


# ---------------------------------------------------------------------------
# GPT-2 byte-level BPE (``encoders/gpt2_bpe.py`` + ``gpt2_bpe_utils.py``)
# ---------------------------------------------------------------------------

def _gpt2_bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte->printable-unicode map (differs from the
    fairseq ``byte_utils`` map: shifts the non-printables to 256+k in
    *first-free-slot* order)."""
    printable = (list(range(ord("!"), ord("~") + 1))
                 + list(range(ord("\xa1"), ord("\xac") + 1))
                 + list(range(ord("\xae"), ord("\xff") + 1)))
    table = {b: b for b in printable}
    k = 0
    for b in range(256):
        if b not in table:
            table[b] = 256 + k
            k += 1
    return {b: chr(c) for b, c in table.items()}


class GPT2BPE:
    """GPT-2 byte-level BPE from local ``encoder.json`` + ``vocab.bpe`` files
    (``encoders/gpt2_bpe.py``; the reference downloads them — this
    environment has no egress, so the paths are required).  ``encode``
    returns space-joined token *ids* as strings, like the reference."""

    def __init__(self, encoder_json: str, vocab_bpe: str):
        import json as _json

        try:
            import regex as _re  # \p{L}/\p{N} classes need the regex module
        except ImportError as e:  # pragma: no cover - regex is baked in
            raise ImportError("GPT2 BPE requires the 'regex' package") from e
        with open(encoder_json, encoding="utf-8") as f:
            self.encoder: Dict[str, int] = _json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(vocab_bpe, encoding="utf-8") as f:
            merges = f.read().split("\n")[1:-1]
        self.bpe_ranks: Dict[Tuple[str, str], int] = {
            tuple(m.split()): i for i, m in enumerate(merges)}
        self.byte_encoder = _gpt2_bytes_to_unicode()
        self.byte_decoder = {c: b for b, c in self.byte_encoder.items()}
        # GPT-2's pre-tokenizer: contractions, letter runs, number runs,
        # other-symbol runs, trailing whitespace
        self.pat = _re.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
            r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
        self._cache: Dict[str, List[str]] = {}

    def _bpe_word(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        symbols = list(token)
        while len(symbols) > 1:
            ranked = [(self.bpe_ranks.get(p, 1 << 30), p)
                      for p in set(zip(symbols, symbols[1:]))]
            rank, best = min(ranked)
            if rank == 1 << 30:
                break
            merged: List[str] = []
            i = 0
            while i < len(symbols):
                if i < len(symbols) - 1 and (symbols[i], symbols[i + 1]) == best:
                    merged.append(symbols[i] + symbols[i + 1])
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = merged
        self._cache[token] = symbols
        return symbols

    def encode(self, x: str) -> str:
        ids: List[int] = []
        for token in self.pat.findall(x):
            btoken = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[s] for s in self._bpe_word(btoken))
        return " ".join(str(i) for i in ids)

    def decode(self, x: str) -> str:
        text = "".join(
            self.decoder[int(tok)] for tok in x.split()
            if tok not in ("<unk>", "<mask>"))
        return bytes(self.byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace")


class SentencePieceBPE:
    """SentencePiece wrapper (``encoders/sentencepiece_bpe.py``); requires
    the ``sentencepiece`` package (not baked into this image — gated)."""

    def __init__(self, model_path: str):
        try:
            import sentencepiece as spm
        except ImportError as e:
            raise ImportError(
                "--bpe sentencepiece requires the sentencepiece package"
            ) from e
        self.sp = spm.SentencePieceProcessor()
        self.sp.Load(model_path)

    def encode(self, x: str) -> str:
        return " ".join(self.sp.EncodeAsPieces(x))

    def decode(self, x: str) -> str:
        return (x.replace(" ", "").replace(_SPACE_ESCAPE, " ").strip())


# ---------------------------------------------------------------------------
# Tokenizers (``encoders/{moses,nltk,space}_tokenizer.py``)
# ---------------------------------------------------------------------------


class MosesTokenizerWrapper:
    """Moses tokenize/detokenize via sacremoses
    (``encoders/moses_tokenizer.py``)."""

    def __init__(self, source_lang: str = "en", target_lang: str = "en",
                 no_dash_splits: bool = False, no_escape: bool = True):
        from sacremoses import MosesDetokenizer, MosesTokenizer

        self.tok = MosesTokenizer(source_lang)
        self.detok = MosesDetokenizer(target_lang)
        self.dash_splits = not no_dash_splits
        self.escape = not no_escape

    def encode(self, x: str) -> str:
        return self.tok.tokenize(
            x, aggressive_dash_splits=self.dash_splits,
            return_str=True, escape=self.escape)

    def decode(self, x: str) -> str:
        return self.detok.detokenize(x.split())


class NLTKTokenizer:
    """``nltk.word_tokenize`` wrapper (``encoders/nltk_tokenizer.py``).

    ``word_tokenize`` needs the downloadable punkt sentence model; when
    that data is absent (offline images) we fall back to
    ``NLTKWordTokenizer`` — the exact word tokenizer ``word_tokenize``
    applies per sentence — which ships with nltk and needs no data
    files. The only behavioural difference is sentence-boundary-aware
    final-period splitting.
    """

    def __init__(self):
        from nltk.tokenize import word_tokenize

        try:
            word_tokenize("probe.")
            self._tokenize = word_tokenize
        except LookupError:
            from nltk.tokenize import NLTKWordTokenizer

            self._tokenize = NLTKWordTokenizer().tokenize

    def encode(self, x: str) -> str:
        return " ".join(self._tokenize(x))

    def decode(self, x: str) -> str:
        return x


def build_bpe(name: Optional[str], codes: Optional[str] = None, args=None):
    """Encoder-registry lookup (``fairseq/data/encoders/__init__.py``).

    ``args`` is an optional namespace carrying scheme-specific flags
    (``--gpt2-encoder-json``, ``--sentencepiece-model``, ...).
    """
    if name in (None, "", "none"):
        return None
    if name == "subword_nmt":
        if not codes:
            raise ValueError("--bpe subword_nmt requires --bpe-codes")
        return SubwordNMTBPE(codes)
    if name == "bytes":
        return BytesBPE()
    if name == "characters":
        return CharactersBPE()
    if name == "gpt2":
        enc = getattr(args, "gpt2_encoder_json", None) if args else None
        vocab = getattr(args, "gpt2_vocab_bpe", None) if args else None
        if not (enc and vocab):
            raise ValueError(
                "--bpe gpt2 requires --gpt2-encoder-json and --gpt2-vocab-bpe"
                " (no-egress environment: files must be local)")
        return GPT2BPE(enc, vocab)
    if name == "sentencepiece":
        model = getattr(args, "sentencepiece_model", None) if args else None
        if not model:
            raise ValueError(
                "--bpe sentencepiece requires --sentencepiece-model")
        return SentencePieceBPE(model)
    raise NotImplementedError(
        f"bpe scheme '{name}' (supported: subword_nmt, bytes, characters, "
        "gpt2, sentencepiece)")


def build_tokenizer(name: Optional[str], args=None):
    if name in (None, "", "none"):
        return None
    if name == "space":
        return SpaceTokenizer()
    if name == "moses":
        return MosesTokenizerWrapper(
            source_lang=getattr(args, "source_lang", None) or "en",
            target_lang=getattr(args, "target_lang", None) or "en",
            no_dash_splits=getattr(args, "moses_no_dash_splits", False),
            no_escape=getattr(args, "moses_no_escape", True))
    if name == "nltk":
        return NLTKTokenizer()
    raise NotImplementedError(
        f"tokenizer '{name}' (supported: space, moses, nltk)")
