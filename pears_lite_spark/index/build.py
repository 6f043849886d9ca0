"""Inverted-index construction: a sort-based distributed build.

Replaces the reference's per-document full-index rewrite
(`/root/reference/app/indexer/posix.py:17-28` rebuilds and re-pickles
the whole 16k-entry positional index for every inserted doc;
`mk_page_vector.py:49,63` rewrites the whole pod matrix) with ONE
shuffle:

    tokens --posexplode--> occurrence rows (term_id, doc_range,
                                            doc_id, dl, pos)
           --repartition(term_id, doc_range) + sortWithinPartitions-->
           --mapInArrow streaming encode--> posting blocks

Skew strategy (SURVEY.md §4): hot terms (stopword-like pieces) would
overload a single reducer in a naive groupBy(term). The shuffle key is
(term_id, doc_range) where doc_range = shiftright(doc_id, range_shift)
— an ORDER-PRESERVING, TERM-ALIGNED salt: a hot term's postings split
across bounded ~MAX_RANGE_DOCS-doc groups, doc_id order (and hence
delta encoding) survives because shiftright is monotone, and every term
is cut at the same doc boundaries so the WAND scorer can group by
doc_range. This is the explicit salting the north rule demands, with
AQE skew-join as a second line of defense.

The Arrow boundary carries only fixed-width columns (no strings, no
arrays) and the kernel is mapInArrow (numpy straight from RecordBatch)
— measured ~4x cheaper than mapInPandas for this stream.

The physical layout is one row per posting BLOCK:
(term_id, doc_range, block_id, first_doc, last_doc, n, max_impact,
 docs, tfs, dls, positions) partitioned on term_bucket =
pmod(term_id, n_buckets) so a query's scan prunes to q_terms buckets.
The term string lives in a separate (term, term_id, df) dictionary
(`term_dictionary`), computed JVM-side.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..vocab import get_vocab
from . import codec

DEFAULT_N_BUCKETS = 64

POSTING_SCHEMA = T.StructType([
    T.StructField("term_id", T.LongType()),
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

_POSTING_PA = pa.schema([
    ("term_id", pa.int64()),
    ("doc_range", pa.int64()),
    ("block_id", pa.int32()),
    ("first_doc", pa.int64()),
    ("last_doc", pa.int64()),
    ("n", pa.int32()),
    ("max_impact", pa.float64()),
    ("docs", pa.binary()),
    ("tfs", pa.binary()),
    ("dls", pa.binary()),
    ("positions", pa.binary()),
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


def tokenize_spm(df: DataFrame, id_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """SentencePiece-unigram tokenizer (Viterbi over the 16k vocab) as an
    Arrow mapInPandas — parity path for the reference's `tokenize_text`
    (`/root/reference/app/indexer/mk_page_vector.py:21-26`).

    Narrow map (no shuffle, no join): returns id_cols + tokens; the
    vocab loads once per executor (contrast the reference's reload per
    call — mk_page_vector.py:22)."""
    passthrough = [df.schema[c] for c in id_cols]
    out_schema = T.StructType(
        passthrough + [T.StructField("tokens", T.ArrayType(T.StringType()))])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = get_vocab()  # one load per executor process (lru_cache)
        for pdf in batches:
            out = {c: pdf[c] for c in id_cols}
            out["tokens"] = pdf["text"].map(
                lambda t: v.encode_as_pieces(t) if isinstance(t, str) else [])
            yield pd.DataFrame(out)

    return df.select(*id_cols, "text").mapInPandas(kernel, schema=out_schema)


def ingest_tokens(corpus_df: DataFrame, tokenizer: str = "spm") -> DataFrame:
    """Fused ingest: (url, warc_ts, html) -> (doc_id, url, lang, tokens)
    in ONE Arrow crossing — extraction, doc_id (xxh64(url), identical to
    Spark's xxhash64), and tokenization run in the same Python worker
    pass, so the html payload crosses the JVM<->Python boundary once
    instead of four times (extract UDF, hash column, tokenize UDF)."""
    from ..functions.extract import extract_html
    from ..xxh64 import xxh64_signed

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = get_vocab() if tokenizer == "spm" else None
        for pdf in batches:
            ids, urls, langs, toks = [], [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                title, text, snippet, lang = extract_html(html)
                if not text:
                    continue  # undetectable-language page (reference rejects)
                ids.append(xxh64_signed(url))
                urls.append(url)
                langs.append(lang)
                toks.append(v.encode_as_pieces(text) if v else text.split())
            yield pd.DataFrame({"doc_id": ids, "url": urls, "lang": langs,
                                "tokens": toks})

    return corpus_df.select("url", "html").mapInPandas(kernel, schema=out_schema)


def with_doc_id(corpus_df: DataFrame) -> DataFrame:
    """Stable content-derived doc id (no positional row-ids — contrast
    `/root/reference/app/indexer/mk_page_vector.py:55`)."""
    return corpus_df.withColumn("doc_id", F.xxhash64("url"))


def corpus_stats(tokens_df: DataFrame) -> CorpusStats:
    row = (tokens_df.select(F.size("tokens").alias("dl"))
           .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
           .collect()[0])
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))


# max docs per (term_id, doc_range) encode group: bounds reducer memory
# for hot terms and the streaming-encode group buffer, and spreads one
# stopword's posting list across many reducers (~16k docs * avg tf)
MAX_RANGE_DOCS = 1 << 14


def range_shift_for(n_docs: int, max_group: int = MAX_RANGE_DOCS) -> int:
    """Order-preserving salt granularity: enough doc ranges that even a
    term appearing in EVERY doc (df == n_docs) yields groups of at most
    ~max_group docs. doc_ids are xxhash64 (uniform over 2^64), so
    shiftright(doc_id, shift) splits the id space into 2^(64-shift)
    equal-probability, ORDERED, TERM-ALIGNED ranges (every term is cut
    at the same doc boundaries, which is what lets the scorer run WAND
    per doc_range group). Small corpora get ONE range (no rare-term
    fragmentation); at web scale every 16k-vocab piece is frequent, so
    per-term fragmentation is negligible there too."""
    n_ranges = max(1, math.ceil(max(n_docs, 1) / max_group))
    bits = max(0, math.ceil(math.log2(n_ranges)))
    return max(1, min(63, 64 - bits))


def _encode_stream_factory(avgdl: float, block_size: int,
                           with_positions: bool):
    """mapInArrow kernel over occurrence rows sorted by (term_id,
    doc_range, doc_id, pos) within each partition: encodes complete
    group runs per Arrow batch, carrying the (possibly batch-spanning)
    trailing group as numpy slices. No pandas anywhere on this path."""
    in_cols = ["term_id", "doc_range", "doc_id", "dl"] + (
        ["pos"] if with_positions else [])

    def encode_groups(arrs: dict) -> pa.RecordBatch:
        # derive doc runs (tf = run length, positions = run slice) with
        # numpy boundary detection
        tid_a = arrs["term_id"]
        rng_a = arrs["doc_range"]
        doc_a = arrs["doc_id"]
        dl_a = arrs["dl"]
        pos_a = arrs.get("pos")
        n = tid_a.size
        gcut = np.flatnonzero((np.diff(tid_a) != 0) | (np.diff(rng_a) != 0)) + 1
        gstarts = np.concatenate(([0], gcut))
        gends = np.concatenate((gcut, [n]))
        # doc runs across the whole batch (group boundaries are always
        # doc-run boundaries too)
        dcut = np.flatnonzero((np.diff(doc_a) != 0) | (np.diff(tid_a) != 0)
                              | (np.diff(rng_a) != 0)) + 1
        dstarts = np.concatenate(([0], dcut))
        dends = np.concatenate((dcut, [n]))
        run_of_row = np.zeros(n, dtype=np.int64)
        run_of_row[dstarts[1:]] = 1
        np.cumsum(run_of_row, out=run_of_row)
        out = {k: [] for k in ("term_id", "doc_range", "block_id",
                               "first_doc", "last_doc", "n", "max_impact",
                               "docs", "tfs", "dls", "positions")}
        for s, e in zip(gstarts, gends):
            r0 = run_of_row[s]
            r1 = run_of_row[e - 1] + 1
            uds = dstarts[r0:r1]
            tfs = dends[r0:r1] - uds
            docs = doc_a[uds]
            dls = dl_a[uds]
            positions = (tfs, pos_a[s:e]) if pos_a is not None else None
            blocks = codec.encode_postings(docs, tfs, dls, avgdl,
                                           positions=positions,
                                           block_size=block_size)
            tid, rng = int(tid_a[s]), int(rng_a[s])
            i = 0
            for b in blocks:
                out["term_id"].append(tid)
                out["doc_range"].append(rng)
                out["block_id"].append(b.block_id)
                out["first_doc"].append(b.first_doc)
                out["last_doc"].append(b.last_doc)
                out["n"].append(b.n)
                out["max_impact"].append(b.max_impact)
                out["docs"].append(b.docs)
                out["tfs"].append(b.tfs)
                out["dls"].append(codec.varint_encode(
                    dls[i:i + b.n].astype(np.uint64)))
                out["positions"].append(b.positions)
                i += b.n
        return pa.RecordBatch.from_arrays(
            [pa.array(out[f.name], type=f.type) for f in _POSTING_PA],
            schema=_POSTING_PA)

    def _slice(arrs: dict, lo: int, hi: int) -> dict:
        return {k: v[lo:hi] for k, v in arrs.items()}

    def _concat(parts: list[dict]) -> dict:
        if len(parts) == 1:
            return parts[0]
        return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # rows are sorted, so the last (term_id, doc_range) group of each
        # batch is a suffix that may continue into the next batch. Buffer
        # the open group as a LIST of slices and concat once when it
        # closes — a hot group spanning B batches costs O(group), not the
        # O(group * B) of rolling concat.
        buf: list[dict] = []
        bkey = None
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            arrs = {c: rb.column(c).to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False) for c in in_cols}
            tid_a, rng_a = arrs["term_id"], arrs["doc_range"]
            lt, lr = int(tid_a[-1]), int(rng_a[-1])
            tail_mask = (tid_a == lt) & (rng_a == lr)
            nz = np.flatnonzero(~tail_mask)
            tail_n = n - (int(nz[-1]) + 1) if nz.size else n
            head = _slice(arrs, 0, n - tail_n)
            tail = _slice(arrs, n - tail_n, n)
            if head["term_id"].size:
                fkey = (int(tid_a[0]), int(rng_a[0]))
                if buf and bkey == fkey:
                    head = _concat([*buf, head])
                elif buf:
                    yield encode_groups(_concat(buf))
                buf = []
                yield encode_groups(head)
            elif buf and bkey != (lt, lr):
                yield encode_groups(_concat(buf))
                buf = []
            buf.append(tail)
            bkey = (lt, lr)
        if buf:
            yield encode_groups(_concat(buf))

    return kernel


def build_postings(tokens_df: DataFrame,
                   stats: CorpusStats | None = None,
                   block_size: int = codec.BLOCK_SIZE,
                   range_shift: int | None = None,
                   with_positions: bool = True,
                   vocab_filter: DataFrame | None = None,
                   n_partitions: int | None = None) -> tuple[DataFrame, CorpusStats]:
    """tokens_df(doc_id, tokens) -> posting-block DataFrame + stats.

    Sort-based build, ONE shuffle (SURVEY.md §3.2):
      1. posexplode -> one row per token occurrence (term_id, doc_range,
         doc_id, dl, pos) — plain fixed-width columns, no aggregates,
         no object/array columns anywhere;
      2. doc_range = shiftright(doc_id, range_shift): the
         order-preserving, TERM-ALIGNED salt (see range_shift_for) that
         bounds every reducer group to ~MAX_RANGE_DOCS docs, defusing
         hot-term skew while keeping ranges consistent across terms so
         the WAND scorer can group by doc_range;
      3. repartition(term_id, doc_range) + sortWithinPartitions(term_id,
         doc_range, doc_id, pos) + ONE mapInPandas streaming encode that
         derives tf (doc-run length) and positions (run slice) from the
         sorted occurrence stream.
    """
    spark = tokens_df.sparkSession
    if stats is None:
        stats = corpus_stats(tokens_df)
    if range_shift is None:
        range_shift = range_shift_for(stats.n_docs)

    tok = tokens_df.select(
        "doc_id", F.size("tokens").alias("dl"),
        F.posexplode("tokens").alias("pos", "term"))
    if vocab_filter is not None:
        # vocab-membership filter (posix.py:20-22) via broadcast semi-join
        tok = tok.join(F.broadcast(vocab_filter.select("term")), "term",
                       "left_semi")
    tf = (tok.withColumn("term_id", F.xxhash64("term"))
          .withColumn("doc_range", F.shiftright("doc_id", range_shift))
          .drop("term"))  # only fixed-width columns cross the boundary

    n_partitions = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sort_cols = ["term_id", "doc_range", "doc_id"] + (
        ["pos"] if with_positions else [])
    if not with_positions:
        tf = tf.drop("pos")
    sorted_tf = (tf.repartition(n_partitions, "term_id", "doc_range")
                 .sortWithinPartitions(*sort_cols))
    postings = sorted_tf.mapInArrow(
        _encode_stream_factory(stats.avgdl, block_size, with_positions),
        schema=POSTING_SCHEMA)
    return postings, stats


def term_dictionary(tokens_df: DataFrame) -> DataFrame:
    """(term, term_id, df) — the broadcastable corpus-statistics table
    (the analogue of the reference's podsum/vocab side structures),
    computed JVM-side from the tokens (the postings table itself carries
    only term_id)."""
    return (tokens_df
            .select("doc_id", F.explode(F.array_distinct("tokens"))
                    .alias("term"))
            .groupBy("term").agg(F.count("*").alias("df"))
            .withColumn("term_id", F.xxhash64("term")))


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
