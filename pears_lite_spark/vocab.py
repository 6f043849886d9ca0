"""SentencePiece-style unigram vocabulary + Viterbi tokenizer.

The reference tokenizes with the SentencePiece library over a shipped
16k-piece unigram model (`/root/reference/app/indexer/mk_page_vector.py:
21-26`, model at `app/api/models/en/enwiki.lite.16k.model`) and loads the
textual vocab `piece\tlogprob` at startup (`/root/reference/app/
__init__.py:22-36`, skipping `<unk> <s> </s>`). The sentencepiece library
is not available in this environment, so this module implements standard
unigram-LM Viterbi inference (Kudo 2018, "Subword Regularization") over
the same textual vocab format:

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

_DEFAULT_PATHS = (
    os.path.join(os.path.dirname(__file__), "assets", "vocab.16k.txt"),
    "/root/reference/app/api/models/en/enwiki.lite.16k.vocab",
)

_SPECIAL = {"<unk>", "<s>", "</s>"}


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
    def load(cls, path: str | None = None) -> "Vocab":
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
