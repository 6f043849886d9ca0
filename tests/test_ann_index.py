"""Materialized ANN index artifact: write once with bucket/cell as a
stored parquet partition key, probe with partition pruning.

The scale claim under test: a probe reads ONLY the probed `ivf_cell=`
(or `(lsh_table, lsh_bucket)=`) partition directories — asserted
against the physical plan's PartitionFilters, the same proof PLANS.md
§3 gives for `term_bucket` pruning in the posting store. The vector-
scale analogue of the reference's pod-pruned search
(`/root/reference/app/search/score_pages.py:81-93`).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pears_lite_spark.ann import (brute_topk, ivf_topk, ivf_topk_indexed,
                                  lsh_topk, lsh_topk_indexed, read_ann_meta,
                                  train_ivf_centroids, write_ann_index)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(99)
    X = rng.standard_normal((400, 16)).astype(np.float32)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").cache()


@pytest.fixture(scope="module")
def index_path(spark, emb_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "idx")
    write_ann_index(emb_df, path, n_cells=8, n_planes=6, n_tables=3)
    return path


def _query_vec(emb_df, vid=0):
    row = emb_df.filter(F.col("vec_id") == vid).first()
    return [float(x) for x in row["embedding"]]


def test_meta_sidecar(index_path):
    meta = read_ann_meta(index_path)
    assert meta["n_cells"] == 8 and meta["dim"] == 16
    assert meta["n_tables"] == 3 and meta["n_planes"] == 6


def test_ivf_indexed_matches_recomputed(spark, emb_df, index_path):
    """Same centroids + nprobe -> the pruned probe is result-identical
    to the per-query recompute path."""
    q = _query_vec(emb_df)
    cents = train_ivf_centroids(emb_df, n_cells=8)
    a = [(r["vec_id"], round(r["cosine"], 9)) for r in
         ivf_topk(emb_df, q, k=10, nprobe=3, centroids=cents).collect()]
    b = [(r["vec_id"], round(r["cosine"], 9)) for r in
         ivf_topk_indexed(spark, index_path, q, k=10, nprobe=3).collect()]
    assert a == b and len(a) == 10


def test_lsh_indexed_matches_recomputed(spark, emb_df, index_path):
    q = _query_vec(emb_df, vid=7)
    a = [(r["vec_id"], round(r["cosine"], 9)) for r in
         lsh_topk(emb_df, q, k=10, n_planes=6, max_hamming=1,
                  n_tables=3).collect()]
    b = [(r["vec_id"], round(r["cosine"], 9)) for r in
         lsh_topk_indexed(spark, index_path, q, k=10,
                          max_hamming=1).collect()]
    assert a == b and len(a) > 0


def test_ivf_probe_plan_partition_prunes(spark, emb_df, index_path):
    """The probe scan must carry the cell predicate as a PARTITION
    filter (directory pruning), not a data filter — at 100 TB this is
    the difference between reading nprobe/n_cells of the table and all
    of it."""
    q = _query_vec(emb_df)
    plan = ivf_topk_indexed(spark, index_path, q, k=10, nprobe=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan
    # and the probed-cell count is bounded by nprobe
    files_scan = re.search(r"ivf_cell.* IN \(([^)]*)\)", m.group(1))
    assert files_scan and len(files_scan.group(1).split(",")) == 3, plan


def test_lsh_probe_plan_partition_prunes(spark, emb_df, index_path):
    q = _query_vec(emb_df, vid=7)
    plan = lsh_topk_indexed(spark, index_path, q, k=10, max_hamming=1) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lsh_bucket" in m.group(1) and "lsh_table" in m.group(1), plan


def test_ivf_full_probe_equals_brute(spark, emb_df, index_path):
    """nprobe = n_cells -> the index path degrades to exact search."""
    q = _query_vec(emb_df, vid=3)
    a = [r["vec_id"] for r in brute_topk(emb_df, q, k=10).collect()]
    b = [r["vec_id"] for r in
         ivf_topk_indexed(spark, index_path, q, k=10, nprobe=8).collect()]
    assert a == b


def test_append_then_probe_sees_union(spark, emb_df, tmp_path):
    """Incremental maintenance: append assigns with the FROZEN stored
    quantizer and lands only in the touched partitions; a full-probe
    query over the appended index equals brute force over the union."""
    from pears_lite_spark.ann import append_ann_index
    path = str(tmp_path / "idx")
    first = emb_df.filter(F.col("vec_id") < 300)
    write_ann_index(first, path, n_cells=8, n_planes=6, n_tables=3)
    append_ann_index(emb_df.filter(F.col("vec_id") >= 300), path)
    q = _query_vec(emb_df, vid=1)
    a = [r["vec_id"] for r in brute_topk(emb_df, q, k=10).collect()]
    b = [r["vec_id"] for r in
         ivf_topk_indexed(spark, path, q, k=10, nprobe=8).collect()]
    assert a == b
    # appended ids are findable through the pruned LSH probe too
    got = {r["vec_id"] for r in
           lsh_topk_indexed(spark, path, q, k=400).collect()}
    assert any(v >= 300 for v in got)


def test_ivf_pq_stored_codes_and_probe(spark, emb_df, index_path):
    """The materialized index stores PQ codes; the IVF-PQ probe prunes
    partitions, LUT-scores the stored codes, and the exact refine makes
    full-probe + large-refine degrade to brute force."""
    from pears_lite_spark.ann import ivf_pq_topk_indexed, read_ann_meta
    meta = read_ann_meta(index_path)
    assert meta["pq_m"] == 16 and meta["pq_ks"] == 16
    row = spark.read.parquet(index_path + "/ivf").first()
    assert len(row["pq_codes"]) == 16
    assert all(0 <= c < 16 for c in row["pq_codes"])
    q = _query_vec(emb_df, vid=2)
    a = [r["vec_id"] for r in brute_topk(emb_df, q, k=10).collect()]
    b = [r["vec_id"] for r in
         ivf_pq_topk_indexed(spark, index_path, q, k=10, nprobe=8,
                             refine=400).collect()]
    assert a == b  # refine >= table size + all cells -> exact


def test_ivf_pq_probe_plan_partition_prunes(spark, emb_df, index_path):
    import re
    from pears_lite_spark.ann import ivf_pq_topk_indexed
    q = _query_vec(emb_df, vid=2)
    plan = ivf_pq_topk_indexed(spark, index_path, q, k=10, nprobe=3) \
        ._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan


def test_pq_topk_recall(spark, emb_df):
    """ADC + refine keeps high top-10 recall on the algorithm path."""
    from pears_lite_spark.ann import pq_topk, train_pq_codebooks
    books = train_pq_codebooks(emb_df, m=16)
    hits = total = 0
    for vid in range(5):
        q = _query_vec(emb_df, vid=vid)
        truth = {r["vec_id"] for r in brute_topk(emb_df, q, k=10).collect()}
        got = {r["vec_id"] for r in
               pq_topk(emb_df, q, books, k=10, refine=100).collect()}
        hits += len(truth & got)
        total += len(truth)
    assert hits / total >= 0.7, f"recall {hits}/{total}"


def test_lsh_indexed_recall_vs_brute(spark, emb_df, index_path):
    """Multi-table Hamming-1 probing keeps high top-10 recall."""
    hits = total = 0
    for vid in range(6):
        q = _query_vec(emb_df, vid=vid)
        truth = {r["vec_id"] for r in brute_topk(emb_df, q, k=10).collect()}
        got = {r["vec_id"] for r in
               lsh_topk_indexed(spark, index_path, q, k=10).collect()}
        hits += len(truth & got)
        total += len(truth)
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_trainer_sample_on_hashed_ids(spark, emb_df):
    """VERDICT r04 #3: the trainer must not degenerate when embeddings
    are keyed by xxhash64 doc_ids instead of dense 0..n — the old
    `id < n_train` rule selects every NEGATIVE hash there (~half the
    corpus: an unbounded driver collect at scale, then k-means on a
    sample whose size ignores n_train entirely). The orderBy+limit rule
    takes exactly the lowest n_train hashed ids (a uniform sample) and,
    on a dense-id table, exactly the ids 0..n_train-1 (oracle parity)."""
    hashed = emb_df.select(
        F.xxhash64(F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding")
    # the dense rule's degeneracy on hashed ids: sample size ~n/2
    # (all negative hashes), not n_train — unbounded as the corpus grows
    dense_rule_n = hashed.filter(F.col("vec_id") < 256).count()
    assert dense_rule_n > 100 and dense_rule_n != 256
    cents = train_ivf_centroids(hashed, n_cells=8, n_train=256)
    # k-means trained on a real sample: 8 distinct, finite centroids
    assert cents.shape == (8, 16)
    assert np.isfinite(cents).all()
    assert len({tuple(np.round(c, 6)) for c in cents}) == 8
    # dense-id parity: orderBy+limit == the old id<n_train sample
    dense = train_ivf_centroids(emb_df, n_cells=8, n_train=256)
    old_rows = (emb_df.filter(F.col("vec_id") < 256)
                .orderBy("vec_id").select("embedding").collect())
    from pears_lite_spark.ann import lloyd_kmeans
    X = np.asarray([list(map(float, r[0])) for r in old_rows])
    assert np.allclose(dense, lloyd_kmeans(X, 8, 5))
