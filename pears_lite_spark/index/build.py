"""Inverted-index construction: a map-side-partial (combiner) build.

Replaces the reference's per-document full-index rewrite
(`/root/reference/app/indexer/posix.py:17-28` rebuilds and re-pickles
the whole 16k-entry positional index for every inserted doc;
`mk_page_vector.py:49,63` rewrites the whole pod matrix) with ONE
shuffle of packed bytes:

    tokens --mapInPandas (phase A)--> per-split sorted partial runs,
             serialized as a few binary-blob rows per target slot
           --repartition(bijective slot key)-->
           --mapInArrow (phase B) merge + delta/varint/block-max encode

Why not posexplode + repartition + sortWithinPartitions? Measured on
this corpus shape, the JVM->Python row->Arrow conversion costs ~0.5-1M
rows/s per core — 3x the cost of the numpy work it feeds — and
occurrence rows outnumber documents ~350:1. Phase A therefore
collapses occurrences to runs IN THE SAME python pass that already
holds the tokens, and the shuffle moves ~7x fewer bytes (packed int
arrays, LZ4-friendly), none of which are ever converted row-by-row.

Skew strategy (SURVEY.md §4): hot terms (stopword-like pieces) would
overload a single reducer in a naive groupBy(term). The slot key is
(term_id, doc_range) where doc_range = shiftright(doc_id, range_shift)
— an ORDER-PRESERVING, TERM-ALIGNED salt: a hot term's postings split
across bounded ~MAX_RANGE_DOCS-doc groups, doc_id order (and hence
delta encoding) survives because shiftright is monotone, and every term
is cut at the same doc boundaries so the WAND scorer can group by
doc_range. This is the explicit salting the north rule demands, with
AQE skew-join as a second line of defense.

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


# rows buffered before one vectorized encode pass: Arrow delivers ~10k
# input rows per batch, too few to amortize the numpy kernel, so the
# kernel accumulates closed groups up to this many occurrence rows
# (1M rows x 5 int64 ~ 40MB per worker — measured faster than 256k)
FLUSH_ROWS = 1 << 20

# target occurrence rows per shuffle partition: keeps each partition's
# sortWithinPartitions in memory (no spill) even when
# spark.sql.shuffle.partitions is small (a 2-core session would
# otherwise sort ~500MB per task and spill)
TARGET_PART_ROWS = 4_000_000


def _binary_array(data: bytes, offsets: np.ndarray) -> pa.Array:
    """Zero-copy Arrow binary array straight from (value buffer, int32
    offsets) — no per-block Python bytes objects."""
    if offsets[-1] >= (1 << 31):
        # int32 Arrow offsets would silently wrap -> corrupt index;
        # fail loudly with the operational fix
        raise ValueError(
            f"slot partition value stream is {int(offsets[-1])} bytes "
            f">= 2^31; raise n_partitions so each merge slot encodes "
            f"< 2 GiB of postings")
    off = np.ascontiguousarray(offsets, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), off.size - 1,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(data)])


def _runs_to_blocks(tid_r: np.ndarray, rng_r: np.ndarray,
                    doc_r: np.ndarray, tf_r: np.ndarray, dl_r: np.ndarray,
                    newg_r: np.ndarray, pos_flat: "np.ndarray | None",
                    avgdl: float, block_size: int) -> pa.RecordBatch:
    """RUN-level vectorized block encoder: one numpy pass turns sorted
    posting runs (one entry per (term_id, doc_range, doc_id), tf = run
    length, positions flattened run-major) into encoded block rows.
    Block boundaries by flatnonzero, per-block stats by reduceat, each
    varint stream encoded in a single call and sliced into blocks via
    cumulative byte lengths, Arrow binary columns built zero-copy from
    the offset arrays. No per-group Python loop anywhere."""
    n_runs = tid_r.size
    run_idx = np.arange(n_runs, dtype=np.int64)
    g_first = np.maximum.accumulate(np.where(newg_r, run_idx, 0))
    rig = run_idx - g_first                     # run index within group
    newb = newg_r | (rig % block_size == 0)
    b_start = np.flatnonzero(newb)              # one entry per block
    n_blocks = b_start.size
    b_n = np.append(b_start[1:], n_runs) - b_start
    # ---- per-block metadata
    b_first = doc_r[b_start]
    b_last = doc_r[b_start + b_n - 1]
    b_tid = tid_r[b_start]
    b_rng = rng_r[b_start]
    b_bid = (rig[b_start] // block_size).astype(np.int32)
    impacts = codec.bm25_impact(tf_r, dl_r, avgdl)
    b_max = np.maximum.reduceat(impacts, b_start)
    # ---- docs stream: delta-1 within block, first-of-block raw
    # (uint64 wraparound arithmetic matches the decoder's int64 wrap)
    du = doc_r.astype(np.uint64)
    deltas = du.copy()
    deltas[1:] = du[1:] - du[:-1] - np.uint64(1)
    deltas[b_start] = du[b_start]
    docs_bytes, nb = codec.varint_encode_with_lengths(deltas)
    cs = np.zeros(n_runs + 1, dtype=np.int64)
    np.cumsum(nb, out=cs[1:])
    b_val_edge = np.append(b_start, n_runs)
    docs_off = cs[b_val_edge]
    # ---- tf stream (tf-1) and dl stream (raw), same block slicing
    tfs_bytes, nb = codec.varint_encode_with_lengths(
        (tf_r - 1).astype(np.uint64))
    np.cumsum(nb, out=cs[1:])
    tfs_off = cs[b_val_edge]
    dls_bytes, nb = codec.varint_encode_with_lengths(dl_r.astype(np.uint64))
    np.cumsum(nb, out=cs[1:])
    dls_off = cs[b_val_edge]
    # ---- positions stream: per run [tf, first raw, deltas...]
    if pos_flat is not None:
        n_occ = pos_flat.size
        r_start = np.zeros(n_runs, dtype=np.int64)
        np.cumsum(tf_r[:-1], out=r_start[1:])
        vals = np.empty(n_runs + n_occ, dtype=np.uint64)
        cnt_idx = run_idx + r_start             # where each count goes
        mask = np.ones(vals.size, dtype=bool)
        mask[cnt_idx] = False
        pu = pos_flat.astype(np.uint64)
        pd_ = pu.copy()
        pd_[1:] = pu[1:] - pu[:-1]
        pd_[r_start] = pu[r_start]
        vals[cnt_idx] = tf_r.astype(np.uint64)
        vals[mask] = pd_
        pos_bytes, nb = codec.varint_encode_with_lengths(vals)
        csp = np.zeros(vals.size + 1, dtype=np.int64)
        np.cumsum(nb, out=csp[1:])
        # value index where each block begins: its first run's count
        # position; end edge = total value count
        v_edge = np.append(b_start + r_start[b_start], vals.size)
        pos_arr = _binary_array(pos_bytes, csp[v_edge])
    else:
        pos_arr = pa.nulls(n_blocks, pa.binary())
    return pa.RecordBatch.from_arrays(
        [pa.array(b_tid, type=pa.int64()),
         pa.array(b_rng, type=pa.int64()),
         pa.array(b_bid, type=pa.int32()),
         pa.array(b_first, type=pa.int64()),
         pa.array(b_last, type=pa.int64()),
         pa.array(b_n.astype(np.int32), type=pa.int32()),
         pa.array(b_max, type=pa.float64()),
         _binary_array(docs_bytes, docs_off),
         _binary_array(tfs_bytes, tfs_off),
         _binary_array(dls_bytes, dls_off),
         pos_arr],
        schema=_POSTING_PA)


_PARTIAL_SCHEMA = T.StructType([
    T.StructField("p", T.LongType()),      # shuffle key (slot preimage)
    T.StructField("terms", T.BinaryType()),   # int64 per run
    T.StructField("docs", T.BinaryType()),    # int64 per run
    T.StructField("tfs", T.BinaryType()),     # int32 per run
    T.StructField("dls", T.BinaryType()),     # int32 per run
    T.StructField("poss", T.BinaryType()),    # int32 flat, run-major
])

_MIX = np.uint64(0x9E3779B97F4A7C15)

# partial rows with this p value carry per-flush doc stats
# (docs blob = doc_ids int64, dls blob = doc lengths int32)
_DOC_STATS_P = -(1 << 62)


class _PartialBuilder:
    """Shared phase-A accumulator: docs stream in via add(), sorted
    partial posting runs stream out as binary-blob DataFrames (one row
    per target slot per flush). Used by both the tokens-input and the
    fused corpus-input kernels."""

    def __init__(self, range_shift: int, slot_values: list[int],
                 with_positions: bool):
        from ..xxh64 import xxh64_signed
        self._hash = xxh64_signed
        self.range_shift = range_shift
        self.with_positions = with_positions
        self.n_slots = len(slot_values)
        self.slot_vals = np.asarray(slot_values, dtype=np.int64)
        self._cache: dict[str, int] = {}
        self.tids: list[np.ndarray] = []
        self.docs: list[np.ndarray] = []
        self.dls: list[np.ndarray] = []
        self.poss: list[np.ndarray] = []
        # deferred-hash path: (doc_id, tokens, n0) tuples whose term
        # hashing happens vectorized at flush (pd.factorize + hash of
        # the flush's UNIQUE terms only) instead of one Python
        # dict-lookup per token — the per-token map() loop measured
        # ~65% of the non-extract phase-A cost. Holding the raw token
        # lists until flush costs ~80 MB peak per worker at the 1M-row
        # flush threshold.
        self.pend: list[tuple[int, object, int]] = []
        self.acc = 0

    def tid_of(self, t: str) -> int:
        v = self._cache.get(t)
        if v is None:
            v = self._hash(t)
            if len(self._cache) < (1 << 22):
                self._cache[t] = v
        return v

    def add(self, doc_id: int, ids: np.ndarray, idxs: np.ndarray,
            dl: int) -> None:
        """One document's (term_id array, position array, doc length)."""
        self.tids.append(ids)
        self.docs.append(np.full(ids.size, doc_id, np.int64))
        self.dls.append(np.full(ids.size, dl, np.int32))
        self.poss.append(idxs)
        self.acc += ids.size

    def add_tokens(self, doc_id: int, toks, n0: int,
                   vocab_set: "frozenset[str] | None" = None) -> None:
        if vocab_set is not None:
            kept = [(i, tk) for i, tk in enumerate(toks) if tk in vocab_set]
            if not kept:
                return
            ids = np.fromiter((self.tid_of(tk) for _, tk in kept),
                              np.int64, len(kept))
            idxs = np.fromiter((i for i, _ in kept), np.int32, len(kept))
        else:
            self.pend.append((doc_id, toks, n0))
            self.acc += n0

    def _drain_pend(self) -> None:
        """Materialize the deferred-hash docs: factorize the flush's
        token stream in one C pass, xxh64 only the unique terms (dict
        cache shared with tid_of), and gather. Produces the exact same
        (tids, docs, dls, poss) arrays — in the same insertion order —
        as per-token add_tokens, so index bytes are unchanged (the
        byte-parity pytest pins this)."""
        if not self.pend:
            return
        import itertools
        flat = list(itertools.chain.from_iterable(
            tk for _, tk, _ in self.pend))
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object),
                                   use_na_sentinel=False)
        del flat
        cache, h = self._cache, self._hash
        uh = np.empty(len(uniq), np.int64)
        for i, tk in enumerate(uniq):
            v = cache.get(tk)
            if v is None:
                v = h(tk)
                if len(cache) < (1 << 22):
                    cache[tk] = v
            uh[i] = v
        n0s = np.asarray([n for _, _, n in self.pend], np.int64)
        self.tids.append(uh[codes])
        self.docs.append(np.repeat(
            np.asarray([d for d, _, _ in self.pend], np.int64), n0s))
        self.dls.append(np.repeat(n0s.astype(np.int32), n0s))
        if self.with_positions:
            tot = int(n0s.sum())
            starts = np.zeros(n0s.size, np.int64)
            np.cumsum(n0s[:-1], out=starts[1:])
            self.poss.append((np.arange(tot, dtype=np.int64)
                              - np.repeat(starts, n0s)).astype(np.int32))
        self.pend = []

    def flush(self) -> pd.DataFrame:
        self._drain_pend()
        t = np.concatenate(self.tids)
        d = np.concatenate(self.docs)
        dl = np.concatenate(self.dls)
        pp = np.concatenate(self.poss) if self.with_positions else None
        self.tids, self.docs, self.dls, self.poss = [], [], [], []
        self.acc = 0
        # Single-key STABLE sort instead of a (pos, doc, term) lexsort:
        # docs stream in whole, so for equal terms the insertion order
        # is already doc-contiguous with ascending positions — exactly
        # what run collapse needs. Runs within a term leave here in
        # insertion order rather than doc order; phase B re-lexsorts
        # (d, t) over the concatenated slot anyway (it never assumes
        # per-partial doc order), so the final index bytes are
        # unchanged (byte-parity pytest). A 1-key radix argsort on the
        # int64 hashes measured 2.5x faster than the 3-key lexsort at
        # the 1M-row flush size.
        order = np.argsort(t, kind="stable")
        if self.with_positions:
            pp = pp[order]
        t, d, dl = t[order], d[order], dl[order]
        n = t.size
        newr = np.empty(n, dtype=bool)
        newr[0] = True
        newr[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
        r_start = np.flatnonzero(newr)
        r_tf = (np.append(r_start[1:], n) - r_start).astype(np.int32)
        r_t, r_d = t[r_start], d[r_start]
        r_dl = dl[r_start].astype(np.int32)
        rng = (r_d >> self.range_shift).astype(np.int64)
        slot = ((r_t.astype(np.uint64) * _MIX ^ rng.astype(np.uint64))
                % np.uint64(self.n_slots)).astype(np.int64)
        order2 = np.argsort(slot, kind="stable")
        s2 = slot[order2]
        t2, d2 = r_t[order2], r_d[order2]
        tf2, dl2 = r_tf[order2], r_dl[order2]
        if self.with_positions:
            starts = np.zeros(r_start.size, dtype=np.int64)
            np.cumsum(r_tf[:-1].astype(np.int64), out=starts[1:])
            sel_tf = r_tf[order2].astype(np.int64)
            out_starts = np.zeros(sel_tf.size, dtype=np.int64)
            np.cumsum(sel_tf[:-1], out=out_starts[1:])
            gidx = (np.repeat(starts[order2] - out_starts, sel_tf)
                    + np.arange(n, dtype=np.int64))
            p2 = pp[gidx].astype(np.int32)
            pedge = np.append(out_starts, n)
        rows = {k: [] for k in ("p", "terms", "docs", "tfs", "dls",
                                "poss")}
        seg = np.flatnonzero(np.concatenate(
            ([True], s2[1:] != s2[:-1])))
        seg_end = np.append(seg[1:], s2.size)
        for i0, i1 in zip(seg, seg_end):
            rows["p"].append(int(self.slot_vals[s2[i0]]))
            rows["terms"].append(t2[i0:i1].tobytes())
            rows["docs"].append(d2[i0:i1].tobytes())
            rows["tfs"].append(tf2[i0:i1].tobytes())
            rows["dls"].append(dl2[i0:i1].tobytes())
            rows["poss"].append(
                p2[pedge[i0]:pedge[i1]].tobytes() if self.with_positions
                else b"")
        return pd.DataFrame(rows)


def _partial_factory(range_shift: int, slot_values: list[int],
                     with_positions: bool,
                     vocab_set: "frozenset[str] | None"):
    """Phase A (map side): tokens -> sorted partial posting runs,
    serialized as a handful of binary-blob rows per (input split,
    target slot). This is the classic MapReduce combiner form: the
    expensive occurrence stream never crosses the JVM<->Python bridge
    as rows (measured ~0.5M rows/s/core for post-shuffle row->Arrow
    conversion — the bytes are cheap, the per-row conversion is not),
    and the shuffle moves delta-friendly packed arrays instead of 35
    rows per token."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = _PartialBuilder(range_shift, slot_values, with_positions)
        for pdf in batches:
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                n0 = len(toks)
                if n0 == 0:
                    continue
                b.add_tokens(doc_id, toks, n0, vocab_set)
                if b.acc >= FLUSH_ROWS:
                    yield b.flush()
        if b.acc:
            yield b.flush()

    return kernel


def _corpus_partial_factory(range_shift: int, slot_values: list[int],
                            with_positions: bool, tokenizer: str):
    """Fused phase A: (url, html) -> extraction -> tokenize -> partial
    posting runs in ONE python pass — token arrays never cross the
    Arrow bridge at all (build_postings over pre-tokenized input pays
    that crossing once). Also emits one doc-stats row per flush
    (p = _DOC_STATS_P; docs/dls blobs hold each flushed doc's id and
    length) so corpus statistics come from the same pass."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.extract import extract_html
        from ..vocab import get_vocab
        v = get_vocab() if tokenizer == "spm" else None
        b = _PartialBuilder(range_shift, slot_values, with_positions)
        sdocs: list[int] = []
        sdls: list[int] = []

        def stat_row() -> pd.DataFrame:
            nonlocal sdocs, sdls
            out = pd.DataFrame({
                "p": [_DOC_STATS_P],
                "terms": [b""],
                "docs": [np.asarray(sdocs, np.int64).tobytes()],
                "tfs": [b""],
                "dls": [np.asarray(sdls, np.int32).tobytes()],
                "poss": [b""],
            })
            sdocs, sdls = [], []
            return out

        for pdf in batches:
            for url, html in zip(pdf["url"], pdf["html"]):
                title, text, snippet, lang = extract_html(html)
                if not text:
                    continue  # unextractable page (reference rejects)
                toks = v.encode_as_pieces(text) if v else text.split()
                n0 = len(toks)
                if n0 == 0:
                    continue
                doc_id = b._hash(url)
                sdocs.append(doc_id)
                sdls.append(n0)
                b.add_tokens(doc_id, toks, n0)
                if b.acc >= FLUSH_ROWS:
                    yield pd.concat([b.flush(), stat_row()],
                                    ignore_index=True)
        if b.acc:
            yield pd.concat([b.flush(), stat_row()], ignore_index=True)

    return kernel


def _merge_factory(avgdl: float, block_size: int, with_positions: bool,
                   range_shift: int):
    """Phase B (reduce side): concatenate this slot's partial runs,
    merge-sort them by (term_id, doc_id) with one lexsort, re-align the
    flattened positions with a vectorized gather, and encode blocks via
    _runs_to_blocks. A (term_id, doc_range) group lives in exactly one
    slot, so blocks come out identical to a global sort-based build.

    Duplicate (term_id, doc_id) runs — duplicate URLs in a corpus, or
    duplicate doc_id rows in a tokens input, landing in different phase-A
    splits — are merged here (tf summed, position multisets unioned in
    sorted order), matching what phase A already does when the duplicates
    share a split; without this the WAND scorer could emit one doc twice
    in a top-k while the exhaustive scorer summed them."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        Ts, Ds, TFs, DLs, Ps = [], [], [], [], []
        for rb in batches:
            cols = {c: rb.column(c) for c in ("terms", "docs", "tfs",
                                              "dls", "poss")}
            for i in range(rb.num_rows):
                Ts.append(np.frombuffer(cols["terms"][i].as_py(), np.int64))
                Ds.append(np.frombuffer(cols["docs"][i].as_py(), np.int64))
                TFs.append(np.frombuffer(cols["tfs"][i].as_py(), np.int32))
                DLs.append(np.frombuffer(cols["dls"][i].as_py(), np.int32))
                if with_positions:
                    Ps.append(np.frombuffer(cols["poss"][i].as_py(),
                                            np.int32))
        if not Ts:
            return
        t = np.concatenate(Ts)
        d = np.concatenate(Ds)
        tf = np.concatenate(TFs).astype(np.int64)
        dl = np.concatenate(DLs).astype(np.int64)
        order = np.lexsort((d, t))
        t2, d2 = t[order], d[order]
        tf2, dl2 = tf[order], dl[order]
        if with_positions:
            pp = np.concatenate(Ps).astype(np.int64)
            starts = np.zeros(tf.size, dtype=np.int64)
            np.cumsum(tf[:-1], out=starts[1:])
            out_starts = np.zeros(tf2.size, dtype=np.int64)
            np.cumsum(tf2[:-1], out=out_starts[1:])
            gidx = (np.repeat(starts[order] - out_starts, tf2)
                    + np.arange(pp.size, dtype=np.int64))
            p2 = pp[gidx]
        else:
            p2 = None
        if t2.size > 1:
            dup = (t2[1:] == t2[:-1]) & (d2[1:] == d2[:-1])
            if dup.any():
                # rare path: collapse duplicate (term_id, doc_id) runs.
                # Fragment semantics: the merged run behaves as the
                # concatenation of its source rows — tf AND dl are
                # summed, so the BM25 impact of a term present in every
                # fragment is exact; a term present in only some
                # fragments keeps that fragment's dl (cross-term dl
                # reconciliation would need doc-level state that a
                # term-partitioned merge cannot see — the canonical
                # pipeline deduplicates doc_ids upstream, P4).
                # Positions stay per-source-row offsets (phrase matches
                # within a fragment are exact; cross-fragment phrase
                # adjacency is out of scope).
                first = np.concatenate(([True], ~dup))
                keep = np.flatnonzero(first)
                tf_m = np.add.reduceat(tf2, keep)
                dl_m = np.add.reduceat(dl2, keep)
                if p2 is not None:
                    # adjacent runs' position slices are already
                    # contiguous; sort only the merged groups' slices
                    g_starts = np.zeros(keep.size, dtype=np.int64)
                    np.cumsum(tf_m[:-1], out=g_starts[1:])
                    runs_per_g = np.add.reduceat(
                        np.ones(tf2.size, np.int64), keep)
                    for g in np.flatnonzero(runs_per_g > 1):
                        s0 = g_starts[g]
                        p2[s0:s0 + tf_m[g]].sort()
                t2, d2, dl2, tf2 = t2[keep], d2[keep], dl_m, tf_m
        rng2 = d2 >> range_shift
        newg = np.empty(t2.size, dtype=bool)
        newg[0] = True
        newg[1:] = (t2[1:] != t2[:-1]) | (rng2[1:] != rng2[:-1])
        yield _runs_to_blocks(t2, rng2, d2, tf2, dl2, newg, p2,
                              avgdl, block_size)

    return kernel


_SLOT_CACHE: dict = {}


def _slot_values(spark: SparkSession, n: int) -> list[int]:
    """For each target partition k in [0, n): an int v with
    pmod(murmur3_hash(v), n) == k, so `repartition(n, col('p'))` maps
    slot k's rows to exactly partition k — a bijective bytes-exchange
    instead of hash-collision-lumpy key partitioning."""
    key = n
    if key in _SLOT_CACHE:
        return _SLOT_CACHE[key]
    # distributed preimage search: the min-id-per-slot aggregate runs
    # executor-side and the driver collects exactly n rows — NOT the
    # 64*n candidate rows (at a 100 TB build n reaches 10^5-10^6 and a
    # 64*n collect would be a multi-hundred-MB driver transfer).
    # min(id) per slot is precisely what the old sequential-scan
    # setdefault picked, so the chosen preimages (and the index bytes
    # downstream) are unchanged.
    rows = (spark.range(0, 64 * n)
            .select("id", F.pmod(F.hash("id"), F.lit(n)).alias("slot"))
            .groupBy("slot").agg(F.min("id").alias("id"))
            .collect())
    vals = {int(r["slot"]): int(r["id"]) for r in rows}
    if len(vals) != n:
        raise RuntimeError(f"slot preimage search failed for n={n}")
    out = [vals[k] for k in range(n)]
    _SLOT_CACHE[key] = out
    return out


def build_postings(tokens_df: DataFrame,
                   stats: CorpusStats | None = None,
                   block_size: int = codec.BLOCK_SIZE,
                   range_shift: int | None = None,
                   with_positions: bool = True,
                   vocab_filter: DataFrame | None = None,
                   n_partitions: int | None = None) -> tuple[DataFrame, CorpusStats]:
    """tokens_df(doc_id, tokens) -> posting-block DataFrame + stats.

    Map-side-partial build (the MapReduce combiner form), ONE shuffle
    of packed bytes:
      1. Phase A mapInPandas over (doc_id, tokens): per input split,
         hash terms (xxh64 == Spark xxhash64, per-word cached), lexsort
         the split's occurrences, collapse to runs (tf, positions), and
         emit ONE binary-blob row per (split, target slot) — the
         occurrence stream never crosses the Arrow bridge as rows;
      2. shuffle the partial rows with a bijective slot key (see
         _slot_values) — bytes move, not rows; hot-term skew is bounded
         because the slot key is (term_id, doc_range) where doc_range =
         shiftright(doc_id, range_shift) splits any term's postings
         into <= ~MAX_RANGE_DOCS-doc groups (see range_shift_for);
      3. Phase B mapInArrow per slot: concat partial runs, ONE lexsort
         merge, vectorized delta+varint+block-max encode
         (_runs_to_blocks). Output blocks are byte-identical to a
         global sort-based build.
    """
    spark = tokens_df.sparkSession
    if stats is None:
        stats = corpus_stats(tokens_df)
    if range_shift is None:
        range_shift = range_shift_for(stats.n_docs)
    if n_partitions is None:
        est_occ = int(stats.n_docs * max(stats.avgdl, 1.0))
        base = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
                   math.ceil(est_occ / TARGET_PART_ROWS))
        # round up to a multiple of the executor slot count: 9 tasks on
        # 8 slots is a 2-wave schedule with 7 idle slots in wave 2
        par = max(1, spark.sparkContext.defaultParallelism)
        n_partitions = math.ceil(base / par) * par
    vocab_set = None
    if vocab_filter is not None:
        vocab_set = frozenset(
            r["term"] for r in vocab_filter.select("term").collect())
    slots = _slot_values(spark, n_partitions)
    partials = tokens_df.select("doc_id", "tokens").mapInPandas(
        _partial_factory(range_shift, slots, with_positions, vocab_set),
        schema=_PARTIAL_SCHEMA)
    postings = (partials.repartition(n_partitions, "p")
                .mapInArrow(_merge_factory(stats.avgdl, block_size,
                                           with_positions, range_shift),
                            schema=POSTING_SCHEMA))
    return postings, stats


def build_from_corpus(corpus_df: DataFrame, tokenizer: str = "spm",
                      block_size: int = codec.BLOCK_SIZE,
                      range_shift: int | None = None,
                      with_positions: bool = True,
                      n_partitions: int | None = None,
                      est_avgdl: float = 350.0) -> tuple[DataFrame, CorpusStats]:
    """Fused build: (url, html) corpus -> posting blocks in ONE python
    pass plus the bytes shuffle — extraction, tokenization, doc_id
    hashing and partial-run construction all happen in the same
    mapInPandas, so neither the html nor the token arrays ever make a
    second trip across the Arrow bridge (build_postings over
    pre-tokenized input pays one token-array crossing).

    Corpus statistics (n_docs, avgdl for the phase-B BM25 impacts)
    come from per-flush doc-stats side rows in the partials — no
    separate pass over the corpus. range_shift is derived from the
    corpus ROW COUNT (cheap metadata), which can differ from the
    extractable-doc count build_postings would use only when the two
    straddle a power-of-2 boundary of MAX_RANGE_DOCS; pass
    `range_shift` explicitly when byte-parity with a tokens-path build
    matters."""
    spark = corpus_df.sparkSession
    est_docs = corpus_df.count()
    if range_shift is None:
        range_shift = range_shift_for(est_docs)
    if n_partitions is None:
        base = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
                   math.ceil(est_docs * est_avgdl / TARGET_PART_ROWS))
        par = max(1, spark.sparkContext.defaultParallelism)
        n_partitions = math.ceil(base / par) * par
    slots = _slot_values(spark, n_partitions)
    partials = corpus_df.select("url", "html").mapInPandas(
        _corpus_partial_factory(range_shift, slots, with_positions,
                                tokenizer),
        schema=_PARTIAL_SCHEMA).persist()

    def stats_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        n = 0
        tot = 0
        for rb in batches:
            dls_col = rb.column("dls")
            for i in range(rb.num_rows):
                arr = np.frombuffer(dls_col[i].as_py(), np.int32)
                n += arr.size
                tot += int(arr.sum())
        yield pa.RecordBatch.from_arrays(
            [pa.array([n], pa.int64()), pa.array([tot], pa.int64())],
            names=["n", "tot"])

    row = (partials.filter(F.col("p") == _DOC_STATS_P)
           .select("dls")
           .mapInArrow(stats_kernel, "n long, tot long")
           .agg(F.sum("n").alias("n"), F.sum("tot").alias("tot"))
           .collect()[0])
    n_docs = int(row["n"] or 0)
    stats = CorpusStats(n_docs=n_docs,
                        avgdl=float(row["tot"] or 0) / max(n_docs, 1))
    postings = (partials.filter(F.col("p") != _DOC_STATS_P)
                .repartition(n_partitions, "p")
                .mapInArrow(_merge_factory(stats.avgdl, block_size,
                                           with_positions, range_shift),
                            schema=POSTING_SCHEMA))
    # caller contract: the partials cache must be released once the
    # postings are materialized — write_index does it automatically;
    # other callers use release_build(postings)
    postings._pears_partials = partials
    return postings, stats


def release_build(postings: DataFrame) -> None:
    """Unpersist the cached phase-A partials a build_from_corpus plan
    pins (call AFTER materializing the postings — re-executing the plan
    afterwards recomputes phase A). No-op for build_postings outputs."""
    src = getattr(postings, "_pears_partials", None)
    if src is not None:
        src.unpersist()
        postings._pears_partials = None


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
    partition pruning; stats sidecar as JSON.

    The exchange keys on (term_bucket, term_id) into >= slot-count
    partitions — repartition("term_bucket") alone would cap write
    parallelism at n_buckets tasks and inherit per-bucket skew; the
    partitionBy writer still routes every row to its bucket directory,
    and sortWithinPartitions keeps each output file term-ordered."""
    spark = postings.sparkSession
    n_out = max(n_buckets, spark.sparkContext.defaultParallelism)
    (postings
     .withColumn("term_bucket", F.pmod("term_id", F.lit(n_buckets)).cast("int"))
     .repartition(n_out, "term_bucket", "term_id")
     .sortWithinPartitions("term_bucket", "term_id", "doc_range", "block_id")
     .write.mode("overwrite").partitionBy("term_bucket").parquet(path))
    release_build(postings)
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
