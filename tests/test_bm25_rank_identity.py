"""BM25 rank-identity: engine (exhaustive DataFrame AND block-max WAND
index) vs the frozen numpy oracle, over the deterministic reference
query set on the synthetic SPM-tokenized corpus."""

import pytest
from pyspark.sql import functions as F

from pears_lite_spark.corpus import gen_query_set
from pears_lite_spark.index.build import build_postings
from pears_lite_spark.search.bm25 import bm25_topk, search_blocks
from pears_lite_spark.vocab import get_vocab

from .oracle import bm25_topk_oracle


@pytest.fixture(scope="module")
def oracle_docs(spm_tokens_df):
    return {r["doc_id"]: list(r["tokens"]) for r in spm_tokens_df.collect()}


@pytest.fixture(scope="module")
def query_pieces(corpus_pdf):
    v = get_vocab()
    qs = gen_query_set(corpus_pdf)[:24]  # subset for test runtime
    return [(q, v.encode_as_pieces(q)) for q in qs]


@pytest.fixture(scope="module")
def index(spm_tokens_df):
    postings, stats = build_postings(spm_tokens_df)
    return postings.persist(), stats


def test_wand_rank_identity_vs_oracle(index, oracle_docs, query_pieces):
    postings, stats = index
    queries = [p for _, p in query_pieces]
    res = search_blocks(postings, stats, queries, k=10).toPandas()
    for qid, (q, pieces) in enumerate(query_pieces):
        exp = bm25_topk_oracle(oracle_docs, pieces, 10)
        sub = res[res.query_id == qid].sort_values("rank")
        got_ids = [int(d) for d in sub["doc_id"]]
        got_scores = [float(s) for s in sub["score"]]
        assert got_ids == [d for d, _ in exp], q
        for gs, (ed, es) in zip(got_scores, exp):
            assert gs == pytest.approx(es, abs=1e-6), q


def test_exhaustive_rank_identity_vs_oracle(spm_tokens_df, oracle_docs,
                                            query_pieces):
    for q, pieces in query_pieces[:8]:
        exp = bm25_topk_oracle(oracle_docs, pieces, 10)
        got = bm25_topk(spm_tokens_df, pieces, 10).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], q
        for r, (ed, es) in zip(got, exp):
            assert r["score"] == pytest.approx(es, abs=1e-6), q


def test_planted_phrase_docs_rank(index, oracle_docs):
    """Docs with the planted phrase must surface for the phrase query."""
    postings, stats = index
    v = get_vocab()
    pieces = v.encode_as_pieces("watermelon festival season")
    res = search_blocks(postings, stats, [pieces], k=10).toPandas()
    assert len(res) > 0
    top = bm25_topk_oracle(oracle_docs, pieces, 10)
    assert int(res.sort_values("rank")["doc_id"].iloc[0]) == top[0][0]


def test_zero_hit_query(index):
    postings, stats = index
    res = search_blocks(postings, stats, [["▁zzzznothere"]], k=10).toPandas()
    assert len(res) == 0


def test_hot_term_salting_equivalence(spm_tokens_df, oracle_docs,
                                      query_pieces):
    """Force a fine doc_range salt (8 ranges at 240 docs) and verify
    WAND results are identical to the single-range build."""
    from pyspark.sql import functions as F
    postings, stats = build_postings(spm_tokens_df, range_shift=61)
    postings = postings.persist()
    n_ranges = postings.select("doc_range").distinct().count()
    assert n_ranges > 1  # salting actually engaged
    queries = [p for _, p in query_pieces[:8]]
    res = search_blocks(postings, stats, queries, k=10).toPandas()
    for qid, (q, pieces) in enumerate(query_pieces[:8]):
        exp = bm25_topk_oracle(oracle_docs, pieces, 10)
        sub = res[res.query_id == qid].sort_values("rank")
        assert [int(d) for d in sub["doc_id"]] == [d for d, _ in exp], q


def test_searcher_scatter_gather_rank_identity(index, oracle_docs,
                                               query_pieces):
    """The serving path (doc_range-partitioned cache, one mapInArrow
    stage, driver merge) must match the oracle exactly."""
    from pears_lite_spark.search.bm25 import Searcher
    postings, stats = index
    s = Searcher(postings, stats)
    queries = [p for _, p in query_pieces]
    res = s.search(queries, k=10)
    for (q, pieces), got in zip(query_pieces, res):
        exp = bm25_topk_oracle(oracle_docs, pieces, 10)
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, abs=1e-6), q


def test_flat_jvm_path_rank_identity(index, oracle_docs, query_pieces):
    """The single-query pure-JVM flat path (decoded impact projection,
    no Python worker in the loop) must rank identically to the numpy
    oracle AND to the batch mapInArrow path, scores equal to summation
    order."""
    from pears_lite_spark.search.bm25 import Searcher
    postings, stats = index
    s = Searcher(postings, stats)
    assert s.flat is not None
    queries = [p for _, p in query_pieces]
    batch = s.search(queries, k=10)           # > FLAT_BATCH_MAX -> kernel
    for (q, pieces), via_batch in zip(query_pieces, batch):
        one = s.search([pieces], k=10)[0]     # routes through _search_flat
        exp = bm25_topk_oracle(oracle_docs, pieces, 10)
        assert [d for d, _ in one] == [d for d, _ in exp], q
        assert [d for d, _ in one] == [d for d, _ in via_batch], q
        for (gd, gs), (ed, es) in zip(one, exp):
            assert gs == pytest.approx(es, abs=1e-6), q


def test_flat_path_disabled_falls_back(index, query_pieces):
    from pears_lite_spark.search.bm25 import Searcher
    postings, stats = index
    s = Searcher(postings, stats, flat_cache=False)
    assert s.flat is None
    assert s.search([query_pieces[0][1]], k=3)[0]  # batch kernel serves


def test_concurrent_flat_queries_rank_identical(index, oracle_docs,
                                                query_pieces):
    """4 threads hammering the flat path concurrently (ADVICE r02: the
    path mutates session confs around its action — the Searcher lock
    must make that safe, not just documented). Every result must equal
    the sequential answer AND the numpy oracle; afterwards the scoped
    confs must be restored."""
    import threading
    from pears_lite_spark.search.bm25 import Searcher
    postings, stats = index
    s = Searcher(postings, stats)
    spark = s.flat.sparkSession
    codegen_before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    work = [(qid, pieces) for qid, (q, pieces)
            in enumerate(query_pieces[:8])] * 3     # 24 queries, 4 threads
    results: dict = {}
    errors: list = []

    def worker(chunk):
        try:
            for qid, pieces in chunk:
                got = s.search([pieces], k=10)[0]
                prev = results.setdefault(qid, got)
                assert got == prev, f"nondeterministic result for q{qid}"
        except Exception as e:  # surface into the main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(work[i::4],))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for qid, (q, pieces) in enumerate(query_pieces[:8]):
        exp = bm25_topk_oracle(oracle_docs, pieces, 10)
        assert [d for d, _ in results[qid]] == [d for d, _ in exp], q
    assert spark.conf.get("spark.sql.codegen.wholeStage",
                          "true") == codegen_before
