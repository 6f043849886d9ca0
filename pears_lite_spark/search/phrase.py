"""Positional phrase scoring over the block index (C6 at scale).

The reference's `posix()` loads the whole pickled positional index per
query and intersects python dicts (`/root/reference/app/search/
overlap_calculation.py:124-154`). Here the positions already live
delta+varint-encoded inside the posting blocks, so phrase scoring is a
pruned scan: filter the posting table to the query pieces' term_ids
(partition pruning), group by doc_range (term-aligned, so every doc's
pieces meet in one group), decode positions only for those terms, and
apply the reference's subword-adjacency rule per candidate doc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..index import codec
from ..xxh64 import xxh64_signed
from .parity import group_subwords, phrase_adjacency_score

_OUT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("phrase_score", T.DoubleType()),
])


def phrase_scores_from_index(postings: DataFrame, query_pieces: list[str],
                             require_all: bool = True) -> DataFrame:
    """(doc_id, phrase_score) for docs containing every query piece
    (the reference's candidate intersection, J1) scored by the C6
    consecutive-positions rule."""
    words = group_subwords(query_pieces)
    pieces = sorted({p for w in words for p in w})
    tid_to_piece = {xxh64_signed(p): p for p in pieces}
    tids = sorted(tid_to_piece)
    need_all = len(pieces) if require_all else 1

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        per_doc: dict[int, dict[str, np.ndarray]] = {}
        for r in pdf.itertuples():
            piece = tid_to_piece[r.term_id]
            docs = codec.decode_block_docs(r.docs, r.n)
            poss = codec.decode_block_positions(r.positions, r.n)
            for d, p in zip(docs, poss):
                per_doc.setdefault(int(d), {})[piece] = p
        rows = []
        for d, posmap in per_doc.items():
            if len(posmap) < need_all:
                continue
            score = phrase_adjacency_score(
                words, {k: list(v) for k, v in posmap.items()})
            rows.append((d, score))
        return pd.DataFrame(rows, columns=["doc_id", "phrase_score"])

    scan = (postings.filter(F.col("term_id").isin(tids))
            .select("term_id", "doc_range", "n", "docs", "positions"))
    return (scan.groupBy("doc_range")
            .applyInPandas(lambda key, pdf: score_group(pdf), schema=_OUT))
