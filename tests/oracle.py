"""Single-process numpy BM25 oracle — the frozen ground truth for
rank-identity tests (SURVEY.md §5: the reference ships no tests, so
this oracle defines the semantics the engine must match)."""

from __future__ import annotations

import math
from collections import Counter


def bm25_topk_oracle(doc_tokens: dict[int, list[str]],
                     query_terms: list[str], k: int,
                     k1: float = 1.2, b: float = 0.75) -> list[tuple[int, float]]:
    n = len(doc_tokens)
    dls = {d: len(t) for d, t in doc_tokens.items()}
    avgdl = sum(dls.values()) / n if n else 0.0
    qterms = sorted(set(query_terms))
    tfs = {d: Counter(t) for d, t in doc_tokens.items()}
    scores: dict[int, float] = {}
    for t in qterms:
        df = sum(1 for d in doc_tokens if tfs[d][t] > 0)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d in doc_tokens:
            tf = tfs[d][t]
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * tf / (
                    tf + k1 * (1 - b + b * dls[d] / avgdl))
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return out
