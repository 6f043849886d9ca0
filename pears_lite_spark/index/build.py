"""Inverted-index construction as a DataFrame groupBy-aggregate.

Replaces the reference's per-document full-index rewrite
(`/root/reference/app/indexer/posix.py:17-28` rebuilds and re-pickles
the whole 16k-entry positional index for every inserted doc;
`mk_page_vector.py:49,63` rewrites the whole pod matrix) with one
declarative Spark job:

    tokens --posexplode--> (doc_id, pos, term)
           --groupBy(doc_id, term)--> tf + sorted positions     [shuffle 1]
           --join doclen, floor-shift doc ranges-->
           --groupBy(term_id, doc_range)--> encoded blocks      [shuffle 2]

Skew strategy (SURVEY.md §4): hot terms (stopword-like pieces) would
overload a single reducer in a naive groupBy(term).collect_list. We key
the final aggregation by (term_id, doc_range) where
doc_range = shiftright(doc_id, range_shift) — an ORDER-PRESERVING salt:
a hot term's postings split across up to 2^(64-range_shift) bounded
groups, each encodable independently, while doc_id order (and hence
delta encoding) survives because shiftright is monotone. Rare terms land
in one group and pay nothing. This is the explicit salting the north
rule demands, with AQE skew-join as a second line of defense.

The physical layout is one row per posting BLOCK:
(term_id, term, doc_range, block_id, first_doc, last_doc, n, max_impact,
 docs, tfs, dls, positions) partitioned on term_bucket =
pmod(term_id, n_buckets) so a query's scan prunes to q_terms buckets.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..vocab import get_vocab
from . import codec

DEFAULT_N_BUCKETS = 64

POSTING_SCHEMA = T.StructType([
    T.StructField("term_id", T.LongType()),
    T.StructField("term", T.StringType()),
    T.StructField("doc_range", T.LongType()),
    T.StructField("block_id", T.IntegerType()),
    T.StructField("first_doc", T.LongType()),
    T.StructField("last_doc", T.LongType()),
    T.StructField("n", T.IntegerType()),
    T.StructField("max_impact", T.DoubleType()),
    T.StructField("docs", T.BinaryType()),
    T.StructField("tfs", T.BinaryType()),
    T.StructField("dls", T.BinaryType()),
    T.StructField("positions", T.BinaryType()),
])


@dataclass
class CorpusStats:
    n_docs: int
    avgdl: float


def tokenize_whitespace(df: DataFrame, text_col: str = "text") -> DataFrame:
    """SQL-expressible tokenizer (split on single spaces, drop empties) —
    the oracle-checkable path used over the driver's `documents` table."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    return df.withColumn("tokens", toks)


def _spm_map_in_pandas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    v = get_vocab()  # one load per executor process (lru_cache)
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "tokens": pdf["text"].map(
                lambda t: v.encode_as_pieces(t) if isinstance(t, str) else []),
        })


def tokenize_spm(df: DataFrame) -> DataFrame:
    """SentencePiece-unigram tokenizer (Viterbi over the 16k vocab) as an
    Arrow mapInPandas — parity path for the reference's `tokenize_text`
    (`/root/reference/app/indexer/mk_page_vector.py:21-26`)."""
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
    ])
    toks = df.select("doc_id", "text").mapInPandas(_spm_map_in_pandas,
                                                   schema=out_schema)
    return df.drop("tokens").join(toks, "doc_id")


def with_doc_id(corpus_df: DataFrame) -> DataFrame:
    """Stable content-derived doc id (no positional row-ids — contrast
    `/root/reference/app/indexer/mk_page_vector.py:55`)."""
    return corpus_df.withColumn("doc_id", F.xxhash64("url"))


def corpus_stats(tokens_df: DataFrame) -> CorpusStats:
    row = (tokens_df.select(F.size("tokens").alias("dl"))
           .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
           .collect()[0])
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))


def default_range_shift(n_docs: int, parallelism: int = 32) -> int:
    """Pick doc_range granularity: aim ~4*parallelism ranges for the
    hottest term so no reducer holds an unbounded posting group, without
    fragmenting rare terms. doc_ids are xxhash64 (uniform over 2^64)."""
    target_ranges = max(1, 4 * parallelism)
    shift = 64 - max(0, math.ceil(math.log2(target_ranges)))
    return max(1, min(63, shift))


def _encode_group_factory(avgdl: float, block_size: int, with_positions: bool):
    def encode(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term_id, doc_range = key
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        positions = ([np.asarray(p, dtype=np.int64) for p in pdf["positions"]]
                     if with_positions else None)
        blocks = codec.encode_postings(doc_ids, tfs, dls, avgdl,
                                       positions=positions,
                                       block_size=block_size)
        term = pdf["term"].iloc[0]
        rows = []
        i = 0
        for b in blocks:
            rows.append((int(term_id), term, int(doc_range), b.block_id,
                         b.first_doc, b.last_doc, b.n, b.max_impact,
                         b.docs, b.tfs,
                         codec.varint_encode(dls[i:i + b.n].astype(np.uint64)),
                         b.positions))
            i += b.n
        return pd.DataFrame(rows, columns=[f.name for f in POSTING_SCHEMA.fields])
    return encode


def build_postings(tokens_df: DataFrame,
                   stats: CorpusStats | None = None,
                   block_size: int = codec.BLOCK_SIZE,
                   range_shift: int | None = None,
                   with_positions: bool = True,
                   vocab_filter: DataFrame | None = None) -> tuple[DataFrame, CorpusStats]:
    """tokens_df(doc_id, tokens) -> posting-block DataFrame + stats.

    Two shuffles total; the tf aggregation is naturally spread (doc_id in
    the key), the block aggregation is range-salted (see module doc).
    """
    spark = tokens_df.sparkSession
    if stats is None:
        stats = corpus_stats(tokens_df)
    if range_shift is None:
        range_shift = default_range_shift(
            stats.n_docs, spark.sparkContext.defaultParallelism)

    tok = tokens_df.select(
        "doc_id", F.size("tokens").alias("dl"),
        F.posexplode("tokens").alias("pos", "term"))
    if vocab_filter is not None:
        # vocab-membership filter (posix.py:20-22) via broadcast semi-join
        tok = tok.join(F.broadcast(vocab_filter.select("term")), "term",
                       "left_semi")
    tf = (tok.groupBy("doc_id", "term")
          .agg(F.count("*").alias("tf"),
               F.first("dl").alias("dl"),
               F.sort_array(F.collect_list("pos")).alias("positions")))
    tf = (tf.withColumn("term_id", F.xxhash64("term"))
            .withColumn("doc_range", F.shiftright("doc_id", range_shift)))
    postings = (tf.groupBy("term_id", "doc_range")
                .applyInPandas(
                    _encode_group_factory(stats.avgdl, block_size,
                                          with_positions),
                    schema=POSTING_SCHEMA))
    return postings, stats


def term_dictionary(postings: DataFrame) -> DataFrame:
    """(term, term_id, df) — the broadcastable corpus-statistics table
    (the analogue of the reference's podsum/vocab side structures)."""
    return (postings.groupBy("term_id", "term")
            .agg(F.sum("n").alias("df")))


def write_index(postings: DataFrame, path: str,
                n_buckets: int = DEFAULT_N_BUCKETS,
                stats: CorpusStats | None = None) -> None:
    """Persist postings partitioned by term_bucket for query-time
    partition pruning; stats sidecar as JSON."""
    (postings
     .withColumn("term_bucket", F.pmod("term_id", F.lit(n_buckets)).cast("int"))
     .repartition("term_bucket")
     .sortWithinPartitions("term_id", "doc_range", "block_id")
     .write.mode("overwrite").partitionBy("term_bucket").parquet(path))
    if stats is not None:
        import json
        with open(os.path.join(path, "_stats.json"), "w") as fh:
            json.dump({"n_docs": stats.n_docs, "avgdl": stats.avgdl}, fh)


def read_index(spark: SparkSession, path: str) -> tuple[DataFrame, CorpusStats]:
    import json
    df = spark.read.parquet(path)
    with open(os.path.join(path, "_stats.json")) as fh:
        d = json.load(fh)
    return df, CorpusStats(n_docs=d["n_docs"], avgdl=d["avgdl"])
