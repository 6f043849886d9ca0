"""SentencePiece-style unigram vocabulary + Viterbi tokenizer.

The reference tokenizes with the SentencePiece library over a shipped
16k-piece unigram model (`/root/reference/app/indexer/mk_page_vector.py:
21-26`, model at `app/api/models/en/enwiki.lite.16k.model`) and loads the
textual vocab `piece\tlogprob` at startup (`/root/reference/app/
__init__.py:22-36`, skipping `<unk> <s> </s>`). The sentencepiece library
is not available in this environment, so this module implements standard
unigram-LM Viterbi inference (Kudo 2018, "Subword Regularization")
directly over the model's pieces.

Piece scores come from the BINARY `.model` itself (preferred): the file
is a protobuf `ModelProto`, and `parse_model_proto` below reads the
`pieces` field (piece string, float32 score, piece type) with a ~40-line
protobuf wire-format reader — no protobuf library needed, the wire
format is a public stable spec. That gives the EXACT float32 logprobs
the reference's tokenizer maximizes over; the textual `.vocab` (scores
rounded to ~3-6 decimals, enough to flip close segmentations) remains a
fallback and a cross-check (tests assert piece-for-piece agreement).

Textual-vocab fallback format:

- normalize: lowercase, collapse whitespace, replace ` ` with the word
  marker `▁` and prepend one (SentencePiece's add_dummy_prefix);
- Viterbi: max-logprob segmentation into vocab pieces; characters not
  coverable by any piece become single-char unknown pieces with a large
  negative score (they are dropped later by the vocab-membership filter,
  mirroring `/root/reference/app/indexer/posix.py:20-22`).

Determinism: ties broken toward the LONGEST piece ending at a position
(then lexicographically smallest), so driver-side oracle and executor
UDF always agree token-for-token.
"""

from __future__ import annotations

import os
from functools import lru_cache

WORD_MARKER = "▁"
UNK_LOGPROB = -100.0

_DEFAULT_MODEL_PATHS = (
    os.path.join(os.path.dirname(__file__), "assets",
                 "enwiki.lite.16k.model"),
    "/root/reference/app/api/models/en/enwiki.lite.16k.model",
)

_DEFAULT_PATHS = (
    os.path.join(os.path.dirname(__file__), "assets", "vocab.16k.txt"),
    "/root/reference/app/api/models/en/enwiki.lite.16k.vocab",
)

_SPECIAL = {"<unk>", "<s>", "</s>"}

# SentencePiece piece types (sentencepiece_model.proto, public schema):
# 1=NORMAL, 2=UNKNOWN, 3=CONTROL, 4=USER_DEFINED, 6=BYTE
_SKIP_TYPES = {2, 3}


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    x = 0
    shift = 0
    while True:
        c = b[i]
        i += 1
        x |= (c & 0x7F) << shift
        if not c & 0x80:
            return x, i
        shift += 7


def parse_model_proto(data: bytes) -> list[tuple[str, float, int]]:
    """Read `ModelProto.pieces` (field 1: repeated SentencePiece
    {1: piece string, 2: score float32, 3: type enum}) straight off the
    protobuf wire format — varint tags, length-delimited submessages,
    fixed32 floats. Unknown fields are skipped by wire type, so
    trainer/normalizer spec sections pass through untouched."""
    import struct
    out: list[tuple[str, float, int]] = []
    i, n = 0, len(data)
    while i < n:
        tag, i = _read_varint(data, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, i = _read_varint(data, i)
            payload = data[i:i + ln]
            i += ln
            if fnum != 1:
                continue
            j, m = 0, ln
            piece, score, ptype = None, 0.0, 1
            while j < m:
                t2, j = _read_varint(payload, j)
                f2, w2 = t2 >> 3, t2 & 7
                if w2 == 2:
                    l2, j = _read_varint(payload, j)
                    if f2 == 1:
                        piece = payload[j:j + l2].decode("utf-8")
                    j += l2
                elif w2 == 5:
                    if f2 == 2:
                        score = struct.unpack("<f", payload[j:j + 4])[0]
                    j += 4
                elif w2 == 0:
                    v, j = _read_varint(payload, j)
                    if f2 == 3:
                        ptype = v
                elif w2 == 1:
                    j += 8
                else:
                    raise ValueError(f"bad wire type {w2}")
            if piece is not None:
                out.append((piece, score, ptype))
        elif wt == 0:
            _, i = _read_varint(data, i)
        elif wt == 5:
            i += 4
        elif wt == 1:
            i += 8
        else:
            raise ValueError(f"bad wire type {wt}")
    return out


class Vocab:
    """Unigram vocab: piece -> (id, logprob), plus Viterbi segmentation."""

    def __init__(self, pieces: list[tuple[str, float]]):
        self.pieces = pieces
        self.piece_to_id: dict[str, int] = {}
        self.logprob: dict[str, float] = {}
        for i, (p, lp) in enumerate(pieces):
            if p not in self.piece_to_id:
                self.piece_to_id[p] = i
                self.logprob[p] = lp
        self.max_piece_len = max((len(p) for p, _ in pieces), default=1)
        # prefix index: all pieces grouped by first char, for Viterbi
        self._by_first: dict[str, list[tuple[str, float]]] = {}
        for p, lp in self.logprob.items():
            if p:
                self._by_first.setdefault(p[0], []).append((p, lp))
        self._word_cache: dict[str, list[str]] = {}

    @classmethod
    def from_model_bytes(cls, data: bytes) -> "Vocab":
        """Build from the binary `.model` protobuf: exact float32
        scores, UNKNOWN/CONTROL pieces skipped (same roles the textual
        loader's <unk>/<s>/</s> skip covers)."""
        pieces = [(p, s) for p, s, t in parse_model_proto(data)
                  if t not in _SKIP_TYPES]
        return cls(pieces)

    @classmethod
    def load(cls, path: str | None = None) -> "Vocab":
        # binary model preferred (exact scores); explicit .model paths
        # and the shipped asset both route through the proto parser
        if path is not None and path.endswith(".model"):
            with open(path, "rb") as fh:
                return cls.from_model_bytes(fh.read())
        if path is None:
            for cand in _DEFAULT_MODEL_PATHS:
                if os.path.exists(cand):
                    with open(cand, "rb") as fh:
                        return cls.from_model_bytes(fh.read())
            try:  # zip-safe (spark-submit --py-files)
                from importlib.resources import files
                data = (files("pears_lite_spark") / "assets"
                        / "enwiki.lite.16k.model").read_bytes()
                return cls.from_model_bytes(data)
            except Exception:
                pass  # fall through to the textual vocab
        text = None
        if path is None:
            for cand in _DEFAULT_PATHS:
                if os.path.exists(cand):
                    path = cand
                    break
        if path is None or not os.path.exists(path):
            # zip-safe fallback: when the package ships as a
            # `spark-submit --py-files` zip, __file__ paths don't exist
            # on disk; importlib.resources reads through zipimport.
            try:
                from importlib.resources import files
                text = (files("pears_lite_spark") / "assets"
                        / "vocab.16k.txt").read_text(encoding="utf-8")
            except Exception:
                raise FileNotFoundError(
                    f"no vocab file found (tried {list(_DEFAULT_PATHS)} "
                    "and package resources)")
        if text is None:
            with open(path, encoding="utf-8") as fh:
                text = fh.read()
        pieces: list[tuple[str, float]] = []
        for line in text.split("\n"):
            if not line:
                continue
            piece, _, lp = line.partition("\t")
            if piece in _SPECIAL:
                continue
            pieces.append((piece, float(lp) if lp else 0.0))
        return cls(pieces)

    def normalize(self, text: str) -> str:
        text = " ".join(text.lower().split())
        if not text:
            return ""
        return WORD_MARKER + text.replace(" ", WORD_MARKER)

    def encode_as_pieces(self, text: str) -> list[str]:
        """Viterbi segmentation with an exact per-word cache.

        No piece in the vocab contains an interior word marker (verified
        property of the model), so the segmentation DP decomposes at
        word boundaries: Viterbi(▁w1▁w2) == Viterbi(▁w1) + Viterbi(▁w2).
        Zipf-distributed text then hits the cache almost always, turning
        tokenization from O(chars·max_piece) into a dict lookup per word
        (the reference instead reloads its model per call —
        mk_page_vector.py:22)."""
        words = text.lower().split()
        out: list[str] = []
        cache = self._word_cache
        for w in words:
            hit = cache.get(w)
            if hit is None:
                hit = self._viterbi(WORD_MARKER + w)
                if len(cache) < 1_000_000:  # bound executor memory
                    cache[w] = hit
            out.extend(hit)
        return out

    def _viterbi(self, s: str) -> list[str]:
        """Raw max-logprob segmentation of one normalized chunk."""
        n = len(s)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        best[0] = 0.0
        back: list[int] = [0] * (n + 1)  # length of piece ending at i
        lp_get = self.logprob.get
        maxlen = self.max_piece_len
        for i in range(n):
            bi = best[i]
            if bi == NEG:
                continue
            matched = False
            upper = min(maxlen, n - i)
            for ln in range(1, upper + 1):
                piece = s[i:i + ln]
                lp = lp_get(piece)
                if lp is None:
                    continue
                matched = True
                sc = bi + lp
                j = i + ln
                # ties -> longer piece wins (ln increases, >= keeps longest)
                if sc > best[j] or (sc == best[j] and ln > back[j]):
                    best[j] = sc
                    back[j] = ln
            if not matched or best[i + 1] == NEG:
                # unknown single char fallback keeps the lattice connected
                sc = bi + UNK_LOGPROB
                if sc > best[i + 1]:
                    best[i + 1] = sc
                    back[i + 1] = 1
        out: list[str] = []
        j = n
        while j > 0:
            ln = back[j]
            out.append(s[j - ln:j])
            j -= ln
        out.reverse()
        return out

    def tokenize_text(self, text: str) -> str:
        """Reference-shaped API: pieces joined by ' '
        (`/root/reference/app/indexer/mk_page_vector.py:21-26`)."""
        return " ".join(self.encode_as_pieces(text))


@lru_cache(maxsize=4)
def get_vocab(path: str | None = None) -> Vocab:
    """Process-wide cached vocab (one load per executor, unlike the
    reference which reloads its model on every call —
    `/root/reference/app/indexer/mk_page_vector.py:22`)."""
    return Vocab.load(path)
