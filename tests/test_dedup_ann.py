"""Dedup + ANN: planted near-dups must be found; LSH recall vs brute."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = ("the silver river bridge crosses the green valley near the old "
            "stone mill where travelers rest and merchants trade goods")
    near = base.replace("merchants", "sailors")  # one-word edit
    far = ("violin concert melody fills the grand theater hall while the "
           "audience listens in complete silence tonight again")
    rows = [(1, base), (2, base), (3, near), (4, far),
            (5, "tiny text"), (6, "tiny text")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(dup_docs):
    from pears_lite_spark.dedup import exact_dedup
    kept = sorted(r["doc_id"] for r in exact_dedup(dup_docs).collect())
    assert kept == [1, 3, 4, 5]


def test_minhash_lsh_finds_near_dups(dup_docs):
    from pears_lite_spark.dedup import jaccard_pairs, lsh_candidate_pairs
    cands = lsh_candidate_pairs(dup_docs, num_hashes=16, bands=8, n=3)
    pairs = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    assert (1, 2) in pairs            # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup should collide
    verified = jaccard_pairs(dup_docs, candidates=cands, n=3, threshold=0.5)
    vp = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in verified.collect()}
    assert vp[(1, 2)] == pytest.approx(1.0)
    assert (1, 4) not in vp


def test_simhash_identical_docs_same_fingerprint(dup_docs):
    from pears_lite_spark.dedup import simhash64, simhash_dup_groups
    fps = {r["doc_id"]: r["simhash"] for r in simhash64(dup_docs).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[4]
    groups = simhash_dup_groups(dup_docs).collect()
    grouped_ids = {tuple(r["doc_ids"]) for r in groups}
    assert (1, 2) in grouped_ids


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_lsh_ann_recall_vs_brute(spark, emb):
    from pears_lite_spark.ann import brute_topk, lsh_topk
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in brute_topk(emb, qvec, 10).collect()]
    approx = [r["vec_id"] for r in
              lsh_topk(emb, qvec, 10, n_planes=8, max_hamming=2).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert exact[0] == 3  # self is nearest
    assert recall >= 0.5, (exact, approx)


def test_brute_topk_matches_numpy(spark, emb):
    from pears_lite_spark.ann import brute_topk
    pdf = emb.toPandas()
    mat = np.vstack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    q = mat[0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))[:10]
    exp = pdf["vec_id"].to_numpy()[order].tolist()
    got = [r["vec_id"] for r in brute_topk(emb, list(q), 10).collect()]
    assert got == exp


def test_span_dedup_drops_repeated_spans_keeps_first(spark):
    """C4-style span dedup: a 12-token boilerplate block shared by two
    docs survives only in the earlier one; unique spans all survive."""
    from pears_lite_spark.dedup import span_dedup
    boiler = " ".join(f"b{i}" for i in range(12))
    uniq_a = " ".join(f"a{i}" for i in range(12))
    uniq_b = " ".join(f"c{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, boiler + " " + uniq_a), (2, boiler + " " + uniq_b),
         (3, "short tail")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup(docs, k=12).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_clean"] == boiler + " " + uniq_a
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_clean"] == uniq_b          # boilerplate dropped
    assert out[3]["n_kept"] == 1 and out[3]["text_clean"] == "short tail"


def test_unigram_loglik_matches_hand_computation(spark):
    from pears_lite_spark.functions.textstats import unigram_loglik
    from pears_lite_spark.vocab import UNK_LOGPROB, get_vocab
    v = get_vocab()
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "zzqqj xq")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_loglik(docs).collect()}
    for did, text in [(1, "hello world"), (2, "zzqqj xq")]:
        pieces = v.encode_as_pieces(text)
        want = sum(int(round(v.logprob.get(p, UNK_LOGPROB) * 1e6))
                   for p in pieces)
        assert out[did]["n_pieces"] == len(pieces)
        assert out[did]["sum_lp_e6"] == want       # exact integer sum
    # rarer pieces -> lower mean log-prob
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"]


def test_jaccard_candidates_prune_before_shingle_join(spark, dup_docs):
    """The candidates semi-join must land UPSTREAM of the shingle
    self-join (the 100 TB guard): non-candidate docs never reach the
    quadratic stage, and results equal the unpruned run restricted to
    the candidate pairs."""
    from pears_lite_spark.dedup import jaccard_pairs
    cands = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    pruned = jaccard_pairs(dup_docs, candidates=cands, n=3)
    full = jaccard_pairs(dup_docs, n=3)
    want = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in full.collect()
            if (r["doc_a"], r["doc_b"]) in {(1, 2), (1, 3)}}
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pruned.collect()}
    assert got == want
    # the semi-join on doc_id must sit in the subtree FEEDING the
    # shingle equi-join (plan toString prints children after parents,
    # so its position is after the shingle join's)
    plan = pruned._jdf.queryExecution().optimizedPlan().toString()
    shingle_join = plan.find("= shingle#")
    id_semi = plan.find("Join LeftSemi, (doc_id#")
    assert shingle_join >= 0 and id_semi > shingle_join, plan


def test_jaccard_hot_shingle_cap_bounds_pairs(spark):
    """A stopword shingle shared by every doc must not explode the pair
    space when max_shingle_df caps it."""
    from pears_lite_spark.dedup import jaccard_pairs
    # 30 docs all sharing one hot 2-gram, otherwise disjoint
    rows = [(i, f"common prefix word{i}a word{i}b word{i}c") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = jaccard_pairs(df, n=2)
    capped = jaccard_pairs(df, n=2, max_shingle_df=5)
    assert uncapped.count() == 30 * 29 // 2   # quadratic without the cap
    assert capped.count() == 0                # hot shingle dropped
    # cap must not change pairs that share NON-hot shingles
    rows2 = rows + [(100, "common prefix word0a word0b word0c")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]) for r in
           jaccard_pairs(df2, n=2, max_shingle_df=5).collect()}
    assert got == {(0, 100)}


def test_embedding_lsh_bucket_occupancy_shrinks(spark, emb):
    """More sign bits -> strictly smaller max bucket occupancy (the
    quadratic-tail guard the 4-bit bucket lacked)."""
    from pears_lite_spark.ann import hyperplanes, with_lsh_bucket
    from pyspark.sql import functions as F
    occ = {}
    for bits in (2, 8):
        planes = hyperplanes(64, bits, seed=7)
        occ[bits] = (with_lsh_bucket(emb, planes)
                     .groupBy("lsh_bucket").count()
                     .agg(F.max("count")).collect()[0][0])
    assert occ[8] < occ[2]


def test_embedding_near_dup_lsh_recall_vs_exact(spark, emb):
    """The multi-table LSH path must recover the exact near-dup pairs
    at a high threshold (recall amplification across tables)."""
    from pears_lite_spark.dedup import embedding_near_dup_pairs
    # wide-angle threshold (0.35 -> theta ~1.21 rad -> per-bit agreement
    # p ~0.61) needs shorter bucket keys + more tables than the 0.95
    # near-dup default: expected recall 1-(1-p^3)^10 ~ 0.93
    exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(
        emb, threshold=0.35, method="exact").collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(
        emb, threshold=0.35, method="lsh", n_planes=3,
        n_tables=10).collect()}
    assert lsh <= exact                      # verify stage is exact
    assert len(lsh) >= 0.7 * len(exact), (len(lsh), len(exact))


def test_embedding_near_dup_pairs_self_consistency(spark):
    from pears_lite_spark.dedup import embedding_near_dup_pairs
    rows = [(1, [1.0, 0.0, 0.0, 0.0] * 16, 0),
            (2, [1.0, 0.001, 0.0, 0.0] * 16, 0),
            (3, [0.0, 1.0, 0.0, 0.0] * 16, 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(df, threshold=0.9).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.999
    assert (1, 3) not in pairs


def test_exact_dedup_skinny_shuffle(spark, dup_docs):
    """exact_dedup must not shuffle the text column: the exchange keys
    on md5(text) over an (id, hash) projection; full rows come back via
    a semi-join."""
    from pears_lite_spark.dedup import exact_dedup
    out = exact_dedup(dup_docs)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 3, 4, 5]
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    agg_part = plan.split("Join LeftSemi")[1]  # winner subtree
    assert "md5" in agg_part
    assert "Aggregate" in agg_part


def test_simhash_near_dup_band_rotation(spark, dup_docs):
    """Hamming<=k pairs via band rotation: identical docs at distance 0,
    the one-word-edit pair within a few bits, unrelated docs absent."""
    from pears_lite_spark.dedup import simhash64, simhash_near_dup_pairs
    import numpy as np
    fps = {r["doc_id"]: r["simhash"] for r in simhash64(dup_docs).collect()}
    d13 = bin(fps[1] ^ fps[3]).count("1")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_dup_pairs(dup_docs,
                                             max_hamming=7).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(5, 6)] == 0
    if d13 <= 7:
        assert pairs[(1, 3)] == d13
    # exhaustive ground truth: band rotation must find EVERY pair
    # within the bound (pigeonhole guarantees recall 1.0)
    ids = sorted(fps)
    expect = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
              if bin(fps[a] ^ fps[b]).count("1") <= 7}
    assert set(pairs) == expect
    import pytest as _pt
    with _pt.raises(ValueError):
        simhash_near_dup_pairs(dup_docs, max_hamming=9)


def test_ivf_topk_recall_and_pruning(spark, emb):
    """IVF-Flat: probing nprobe cells must recover most of the exact
    top-k and scan only the probed cells' vectors."""
    from pears_lite_spark.ann import (brute_topk, ivf_topk,
                                      train_ivf_centroids, with_ivf_cell)
    cents = train_ivf_centroids(emb, n_cells=8)
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in brute_topk(emb, qvec, 10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(emb, qvec, 10, nprobe=3, centroids=cents).collect()]
    assert approx[0] == 3                       # self lives in a probed cell
    assert len(set(exact) & set(approx)) >= 5   # recall with 3/8 cells
    # assignment is total and balanced enough to prune
    cells = with_ivf_cell(emb, cents).groupBy("ivf_cell").count().collect()
    assert sum(r["count"] for r in cells) == emb.count()
    assert max(r["count"] for r in cells) < emb.count()  # >1 cell in use
    # deterministic training
    c2 = train_ivf_centroids(emb, n_cells=8)
    assert (cents == c2).all()


def test_connected_components_min_label(spark):
    """CC by min-label propagation: transitive chains collapse to one
    cluster labeled by the smallest member; isolated nodes are their
    own cluster."""
    from pears_lite_spark.dedup import connected_components
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (11, 12)], "doc_a long, doc_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in (2, 5, 9, 11, 12, 40)], "doc_id long")
    out = {r["doc_id"]: r["cluster_id"] for r in
           connected_components(pairs, nodes).collect()}
    assert out == {2: 2, 5: 2, 9: 2, 11: 11, 12: 11, 40: 40}


def test_deterministic_sample_stable_and_proportional(spark):
    from pears_lite_spark.functions.sampling import deterministic_sample
    docs = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.3, seed=1).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(docs.repartition(7), 0.3, seed=1).collect()}
    assert a == b                      # partitioning-independent
    assert 0.25 < len(a) / 4000 < 0.35
    c = {r["doc_id"] for r in deterministic_sample(docs, 0.3, seed=2).collect()}
    assert c != a                      # seeds give different splits
    sub = {r["doc_id"] for r in deterministic_sample(docs, 0.1, seed=1).collect()}
    assert sub <= a                    # lower rate is a subset (nested)


def test_token_budget_take_cuts_at_the_line(spark):
    from pears_lite_spark.functions.sampling import token_budget_take
    rows = [(i, "s", " ".join(["w"] * 10)) for i in range(10)]  # 10 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sorted(r["doc_id"] for r in
                 token_budget_take(docs, budget=35).collect())
    # docs 0..3 START before token 35 (0,10,20,30); doc 4 starts at 40
    assert out == [0, 1, 2, 3]


def test_token_budget_two_phase_matches_naive_and_splits(spark):
    """The two-phase cumsum must be bit-identical to the naive
    single-window form AND actually split one source's work across
    many id-range buckets (the round-3 scale flag: a plain
    partitionBy(source) window serializes each source into one
    task)."""
    from pears_lite_spark.functions import sampling
    rows = [(i, "s", " ".join(["w"] * (1 + i % 7))) for i in range(4000)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: r["cum_tokens"] for r in
           sampling.token_budget_take(docs, budget=5000,
                                      num_buckets=16).collect()}
    cum, ref = 0, {}
    for i in range(4000):
        dl = 1 + i % 7
        if cum < 5000:
            ref[i] = cum + dl
        cum += dl
    assert got == ref
    # Parallelism evidence: the single source splits across >=8 ranges.
    nb = (docs.select(sampling._bucket_expr(docs, "doc_id", 16).alias("b"))
          .distinct().count())
    assert nb >= 8


def test_token_budget_string_ids_use_prefix_surrogate(spark):
    """String ids bucket via a 7-byte big-endian prefix surrogate;
    the cumsum must still follow full lexicographic id order."""
    from pears_lite_spark.functions.sampling import token_budget_take
    ids = [f"doc-{i:05d}" for i in range(500)]
    rows = [(d, "s", " ".join(["w"] * 3)) for d in ids]
    docs = spark.createDataFrame(
        rows, "doc_id string, source string, text string")
    out = sorted((r["doc_id"], r["cum_tokens"]) for r in
                 token_budget_take(docs, budget=300,
                                   num_buckets=8).collect())
    # 3 tokens/doc: first 100 ids start before token 300.
    assert [d for d, _ in out] == ids[:100]
    assert [c for _, c in out] == [3 * (k + 1) for k in range(100)]


def test_connected_components_long_chain_converges(spark):
    """A 40-hop transitive chain must collapse to ONE cluster well
    inside max_iters (pointer jumping gives O(log L) convergence; the
    naive propagation needed L iterations and silently returned wrong
    labels past the cap — review finding r3)."""
    from pears_lite_spark.dedup import connected_components
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(i,) for i in range(41)], "doc_id long")
    out = {r["doc_id"]: r["cluster_id"] for r in
           connected_components(pairs, nodes, max_iters=10).collect()}
    assert set(out.values()) == {0}


def test_hot_key_salting_star_graph(spark):
    """VERDICT r03 item 4: a celebrity node (star of ~100k edges into
    one hub) must not funnel its whole adjacency through one join
    task. prepare_salted_edges spreads the hub's rows across all
    salts, and CC/PageRank results are bit-identical to the unsalted
    path (min/sum are order-free)."""
    from pears_lite_spark import dedup
    from pears_lite_spark.sources import pagerank

    n = 100_000
    pairs = (spark.range(1, n + 1)
             .selectExpr("0L as doc_a", "id as doc_b"))
    und = (pairs.selectExpr("doc_a as src", "doc_b as dst")
           .unionByName(pairs.selectExpr("doc_b as src", "doc_a as dst")))

    salted, hot, n_hot = dedup.prepare_salted_edges(
        und, num_salts=8, hot_threshold=1_000)
    assert n_hot == 1  # only the hub is hot
    hub_salts = (salted.filter("src = 0")
                 .select("_salt").distinct().count())
    assert hub_salts == 8          # hub adjacency splits 8 ways
    cold_salts = (salted.filter("src <> 0")
                  .select("_salt").distinct().collect())
    assert [r["_salt"] for r in cold_salts] == [0]

    nodes = (und.select(F.col("src").alias("doc_id")).distinct())
    out = {r["doc_id"]: r["cluster_id"] for r in
           dedup.connected_components(
               pairs, nodes, hot_threshold=1_000).collect()}
    assert len(out) == n + 1 and set(out.values()) == {0}

    # PageRank: salted vs unsalted must agree to the exact integer.
    edges = pairs.selectExpr("doc_b as src", "doc_a as dst")
    a = {r["node"]: r["rank_e12"] for r in
         pagerank(edges, iters=3, hot_threshold=10**9).collect()}
    b = {r["node"]: r["rank_e12"] for r in
         pagerank(edges, iters=3, hot_threshold=1_000).collect()}
    assert a == b


def test_jaccard_dice_guard_raises_on_large_side(spark):
    """VERDICT r04 #6: parity.jaccard_dice is a crossJoin parity helper
    (reference compares single vectors) — the guard must fail loudly
    when either side is corpus-sized instead of launching O(n*m)."""
    import pytest as _pytest
    from pears_lite_spark.search.parity import jaccard_dice
    small = spark.createDataFrame(
        [(1, ["a", "b"])], "doc_id long, tokens array<string>")
    big = spark.range(50).selectExpr("id as doc_id",
                                     "array('a') as tokens")
    with _pytest.raises(ValueError, match="jaccard_pairs"):
        jaccard_dice(small, big, max_side=10)
    out = jaccard_dice(small, big.limit(5), max_side=10)
    assert out.count() == 5


def test_pairwise_topk_partial_group_limit_plan_and_values(spark, emb):
    """VERDICT r04 #7: the batch k-NN's rank<=k filter must compile to
    a map-side WindowGroupLimit(Partial) BEFORE the qid exchange
    (SPARK-37099 rank-limit pushdown) so the shuffle carries at most
    n_partitions*k rows per query, never the full cross product — and
    with no Python crossing anywhere in the plan. Values are checked
    against an independent numpy top-k with the same
    (cosine desc, vec_id asc) tie-break."""
    import numpy as np
    from pears_lite_spark.ann import pairwise_topk_join
    queries = (emb.filter(F.col("vec_id") < 4)
               .select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("qvec")))
    # spread the doc side over many partitions so Partial is exercised
    docs = emb.repartition(8)
    out = pairwise_topk_join(docs, queries, k=5)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    # toString prints top-down: everything before the qid exchange is
    # reduce-side (Final); the Partial limit must sit below it (map-side)
    cut = plan.find("Exchange hashpartitioning(qid")
    assert cut > 0, plan
    assert "Partial" not in plan[:cut] and "Final" in plan[:cut], plan
    assert "Partial" in plan[cut:], plan

    got = {(r["qid"], r["rank"]): (r["vec_id"], r["cosine"])
           for r in out.collect()}
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    want = {}
    for r in rows:
        if r["vec_id"] >= 4:
            continue
        qv = np.asarray(r["embedding"], dtype=np.float64)
        cosine = (V @ qv) / (norms * np.linalg.norm(qv))
        order = np.lexsort((ids, -cosine))[:5]
        for rank, i in enumerate(order, start=1):
            want[(r["vec_id"], rank)] = (int(ids[i]), float(cosine[i]))
    assert len(got) == 4 * 5 and got.keys() == want.keys()
    for key, (vid, cos_np) in want.items():
        gvid, gcos = got[key]
        assert gvid == vid, (key, got[key], want[key])
        assert abs(gcos - cos_np) < 1e-9, (key, gcos, cos_np)
