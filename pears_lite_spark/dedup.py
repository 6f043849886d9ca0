"""Large-scale deduplication operators over the `documents` table.

These are the training-data-pipeline ops a 100 TB corpus needs before
indexing (exact dup removal, near-dup clustering). All hashing is MD5 so
every operator has a bit-identical DuckDB oracle (Spark's xxhash64 /
hash() have no cross-engine twin; md5 does).

Scale notes:
- exact dedup is one hash aggregate (map-side partial combine);
- MinHash-LSH is the standard shingle -> K minhashes -> band buckets ->
  bucket join pipeline (Broder 1997; Leskovec et al., MMDS ch.3): the
  candidate join is an equi-join on (band_id, band_signature), so Spark
  shuffles only bucket collisions, never the O(n^2) pair space;
- SimHash (Charikar 2002) reduces each doc to a 32-bit sign fingerprint;
  near-dups = fingerprints at small Hamming distance, found by exact
  bucket join on the fingerprint (distance 0) or band rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_SHINGLE = 3


def exact_dedup(docs_df: DataFrame, key_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per identical `key_col` — hash-groupBy
    dedup (P4's left_anti insert-dedup generalized to batch).

    The wide exchange moves only (md5(key), id) pairs; winners return
    via a semi-join on the id. At corpus scale the text column dwarfs
    the ids, so never shuffle it to find duplicates (a window over the
    raw key would). md5 equality stands in for key equality (128-bit —
    no practical collisions; nulls group together either way)."""
    h = F.md5(F.col(key_col).cast("string")).alias("_h")
    winners = (docs_df.select(h, F.col(id_col))
               .groupBy("_h").agg(F.min(id_col).alias(id_col))
               .select(id_col))
    return docs_df.join(winners, id_col, "left_semi")


def span_dedup(docs_df: DataFrame, k: int = 12, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Sub-document dedup, C4/RefinedWeb-style: split each doc into
    consecutive k-token spans, drop every span that already occurred
    anywhere in the corpus (first occurrence by (doc_id, position)
    wins), reassemble the survivors. Returns
    (doc_id, n_spans, n_kept, text_clean).

    Scale shape: the only wide exchange is the span-keyed window (one
    shuffle of (span, doc_id, pos) — the reassembly groupBy reuses the
    doc partitioning); no pair space, no cross join. Boilerplate
    sentences repeated across a web crawl (cookie banners, footers) are
    exactly this operator's target. At 100 TB hash the span to a 128-bit
    key before the shuffle if span strings are long (here they join the
    oracle bit-for-bit as strings)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = (docs_df.select(id_col, toks.alias("_t"))
            .filter(F.size("_t") > 0))
    nsp = F.ceil(F.size("_t") / F.lit(float(k))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), nsp - 1),
        lambda i: F.concat_ws(" ", F.slice("_t", i * k + 1, k)))
    ex = base.select(id_col, F.posexplode(spans).alias("pos", "span"))
    w = Window.partitionBy("span").orderBy(F.asc(id_col), F.asc("pos"))
    kept = (ex.withColumn("_rnk", F.row_number().over(w))
            .filter(F.col("_rnk") == 1))
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "span"))),
            lambda s: s["span"])).alias("text_clean"))
    return (base.select(id_col, nsp.alias("n_spans"))
            .join(agg, id_col, "left")
            .select(id_col, "n_spans",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean")))


def line_dedup(docs_df: DataFrame, min_doc_freq: int = 5,
               id_col: str = "doc_id", text_col: str = "text",
               sep: str = "\n") -> DataFrame:
    """Corpus-frequency line dedup (the C4/CCNet/RefinedWeb boilerplate
    rule): a line whose trimmed form occurs in >= min_doc_freq DISTINCT
    documents is boilerplate (cookie banners, legal footers, nav text);
    every occurrence is removed and each doc is reassembled from its
    surviving lines in order. Returns (doc_id, n_lines, n_kept,
    text_clean).

    Scale shape: lines are keyed by md5 before any wide exchange, so
    the frequency aggregate shuffles (16-byte key, doc_id) pairs with
    map-side partial distinct — never line text. The anti-join that
    removes flagged lines shuffles on the same key (AQE broadcasts the
    flagged side when it is small, the common case: few lines cross a
    corpus-level df threshold). Reassembly is one groupBy(doc_id) of
    surviving (pos, line) pairs. No pair space anywhere."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
    ex = (docs_df.select(id_col, F.posexplode(lines).alias("pos", "line"))
          .withColumn("_t", F.trim("line"))
          .filter(F.col("_t") != "")
          .withColumn("_k", F.md5("_t")))
    flagged = (ex.groupBy("_k")
               .agg(F.count_distinct(id_col).alias("_df"))
               .filter(F.col("_df") >= min_doc_freq)
               .select("_k"))
    kept = ex.join(flagged, "_k", "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(sep, F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "line"))),
            lambda s: s["line"])).alias("text_clean"))
    base = (ex.groupBy(id_col)
            .agg(F.count("*").alias("n_lines")))
    return (base.join(agg, id_col, "left")
            .select(id_col, "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean")))


def shingles(docs_df: DataFrame, n: int = DEFAULT_SHINGLE,
             id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    df = docs_df.select(id_col, toks.alias("_t"))
    # shingle i = tokens[i..i+n-1] joined by space
    idx = F.sequence(F.lit(0), F.size("_t") - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_t", i + 1, n)))
    return (df.filter(F.size("_t") >= n)
            .select(id_col, F.explode(F.array_distinct(sh)).alias("shingle")))


def minhash_signatures(docs_df: DataFrame, num_hashes: int = 16,
                       n: int = DEFAULT_SHINGLE) -> DataFrame:
    """(doc_id, hash_id, minhash): minhash_k = min over shingles of
    md5(k || ':' || shingle) — fixed-width lowercase hex, so string MIN
    == 128-bit numeric MIN, identically in Spark and DuckDB.

    Shape: `num_hashes` min() aggregate expressions over the shingle
    rows (ONE row per shingle pre-shuffle), not an explode to
    num_hashes x shingles rows — map-side partial aggregation then
    moves at most num_hashes hex strings per (doc, map task), ~16x
    less map-side volume at web scale. posexplode restores the long
    (doc_id, hash_id, minhash) layout after the aggregate."""
    sh = shingles(docs_df, n)
    aggs = [F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("shingle"))))
            .alias(f"_h{i}") for i in range(num_hashes)]
    wide = sh.groupBy("doc_id").agg(*aggs)
    sig = F.array(*[F.col(f"_h{i}") for i in range(num_hashes)])
    return wide.select("doc_id",
                       F.posexplode(sig).alias("hash_id", "minhash"))


def lsh_candidate_pairs(docs_df: DataFrame, num_hashes: int = 16,
                        bands: int = 4, n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Near-dup candidate pairs via banding: docs sharing any band's full
    minhash signature. Returns (doc_a, doc_b) with doc_a < doc_b."""
    rows = num_hashes // bands
    sig = (minhash_signatures(docs_df, num_hashes, n)
           .withColumn("band", (F.col("hash_id") / rows).cast("int"))
           .groupBy("doc_id", "band")
           .agg(F.concat_ws("|", F.sort_array(F.collect_list(
               F.concat_ws(":", F.col("hash_id").cast("string"), "minhash"))))
                .alias("band_sig")))
    a = sig.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    b = sig.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    return (a.join(b, ["band", "band_sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def jaccard_pairs(docs_df: DataFrame, candidates: DataFrame | None = None,
                  n: int = DEFAULT_SHINGLE,
                  threshold: float = 0.0,
                  max_shingle_df: int | None = None) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (or all pairs that
    share >= 1 shingle). (doc_a, doc_b, jaccard).

    Scale guards (the 100 TB path is candidates=LSH pairs + a df cap):
    - `candidates` prunes BEFORE the shingle self-join (semi-join the
      shingle table down to candidate doc_ids, then re-check exact
      pairs after the intersect) — the quadratic pair space is never
      materialized for non-candidate docs;
    - `max_shingle_df` drops shingles whose document frequency exceeds
      the cap from the JOIN side only (denominator set sizes stay
      exact): one stopword shingle shared by 1% of a web corpus is a
      quadratic bomb; dropping it makes `jaccard` a tight lower bound
      while candidate recall is carried by the remaining shingles.
    """
    sh = shingles(docs_df, n)
    if candidates is not None:
        cand_ids = (candidates.select(F.col("doc_a").alias("doc_id"))
                    .unionByName(candidates.select(F.col("doc_b")
                                                   .alias("doc_id")))
                    .distinct())
        sh = sh.join(cand_ids, "doc_id", "left_semi")
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    joinable = sh
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
               .filter(F.col("df") > max_shingle_df).select("shingle"))
        joinable = sh.join(hot, "shingle", "left_anti")
    a = joinable.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = joinable.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (inter.join(na, "doc_a").join(nb, "doc_b")
            .select("doc_a", "doc_b",
                    (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def simhash64(docs_df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (tf-weighted): bit i of the
    fingerprint = sign of sum over tokens of tf * (+1 if bit i of the
    md5-derived token hash else -1). (doc_id, simhash:long, two's
    complement — bit 63 set makes the value negative).

    64 bits (two 32-bit md5 words — md5 supplies 128) instead of 32 so
    that band rotation at max_hamming=3 yields 16-bit band keys: with
    8-bit keys (32-bit fingerprint, k=3) every band bucket holds ~n/256
    docs at web scale and the bucket join degenerates toward all-pairs."""
    tok = docs_df.select(
        id_col, F.explode(F.filter(F.split(F.col(text_col), " "),
                                   lambda x: x != "")).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # token hash = two 32-bit md5 words as longs (conv gives unsigned);
    # bit i of the 64-bit hash reads from h_lo (i<32) or h_hi (i>=32) —
    # no combined 64-bit value is built, so no signed-overflow games
    tf = (tf.withColumn("h_lo", F.conv(F.substring(F.md5("term"), 1, 8),
                                       16, 10).cast("long"))
            .withColumn("h_hi", F.conv(F.substring(F.md5("term"), 9, 8),
                                       16, 10).cast("long")))
    aggs = []
    for i in range(64):
        word, off = ("h_lo", i) if i < 32 else ("h_hi", i - 32)
        bit = F.when(
            F.shiftright(F.col(word), off).bitwiseAND(1) == 1, 1).otherwise(-1)
        aggs.append(F.sum(bit * F.col("tf")).alias(f"s{i}"))
    sums = tf.groupBy(id_col).agg(*aggs)
    fp = None
    for i in range(64):
        # bit 63 is the sign bit: its weight is long-min (two's
        # complement); bits 0..62 sum to at most 2^63-1 first, so the
        # running total never overflows on either engine
        weight = (1 << i) if i < 63 else -(1 << 63)
        term = F.when(F.col(f"s{i}") > 0, F.lit(weight)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(id_col, fp.cast("long").alias("simhash"))


def simhash_dup_groups(docs_df: DataFrame) -> DataFrame:
    """Docs sharing an identical SimHash fingerprint (Hamming distance
    0 bucket join). (simhash, n_docs, doc_ids)."""
    return (simhash64(docs_df)
            .groupBy("simhash")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
            .filter(F.col("n_docs") > 1))


def simhash_near_dup_pairs(docs_df: DataFrame,
                           max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs within `max_hamming` bit flips, found by
    band rotation (pigeonhole: fingerprints differing in <= k bits agree
    EXACTLY on at least one of k+1 disjoint bands): bucket-join per
    band on the band's bits — never the O(n^2) pair space — then exact
    popcount verify on the candidate pairs.
    (doc_a, doc_b, hamming:int as long).

    With the 64-bit fingerprint, max_hamming=3 gives 16-bit band keys
    (~n/65536 docs per bucket) — the web-scale setting; max_hamming=7
    still gives 8-bit keys, usable to ~1M docs."""
    if not 0 <= max_hamming <= 7:
        # 8+ bands over 64 bits -> <=7-bit band keys -> the bucket join
        # degenerates toward all-pairs; use MinHash-LSH for looser
        # similarity instead
        raise ValueError("max_hamming must be in [0, 7]")
    fp = simhash64(docs_df)
    bands = max_hamming + 1
    width = 64 // bands
    pairs = None
    for i in range(bands):
        lo = i * width
        w = 64 - lo if i == bands - 1 else width
        # arithmetic shift + mask reads bits [lo, lo+w) correctly even
        # when the sign bit is set (the fill bits are masked away);
        # a full-width band (max_hamming=0) is the fingerprint itself
        if w == 64:
            bits = F.col("simhash")
        else:
            bits = F.shiftright(F.col("simhash"), lo).bitwiseAND((1 << w) - 1)
        b = fp.select(F.col("doc_id"), bits.alias("bb"))
        p = (b.alias("x").join(b.alias("y"), "bb")
             .filter(F.col("x.doc_id") < F.col("y.doc_id"))
             .select(F.col("x.doc_id").alias("doc_a"),
                     F.col("y.doc_id").alias("doc_b")))
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.distinct()
    fa = fp.select(F.col("doc_id").alias("doc_a"),
                   F.col("simhash").alias("ha"))
    fb = fp.select(F.col("doc_id").alias("doc_b"),
                   F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (pairs.join(fa, "doc_a").join(fb, "doc_b")
            .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def embedding_near_dup_pairs(emb_df: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             method: str = "lsh",
                             n_planes: int = 8,
                             n_tables: int = 6) -> DataFrame:
    """Embedding-cosine near-dup pairs above `threshold`.

    method='lsh' (the 100 TB path): multi-table random-hyperplane LSH
    (reusing ann.hyperplanes — seeded, dimension-agnostic): `n_tables`
    independent `n_planes`-bit sign buckets; candidate pairs = docs
    sharing a full bucket in ANY table (banding-style recall
    amplification: P(candidate) = 1-(1-p^n_planes)^n_tables with
    p = 1-theta/pi; defaults give ~0.96 at cosine 0.95). Expected
    bucket occupancy is n/2^n_planes per table, so the within-bucket
    join is never globally quadratic; only id pairs flow through the
    union/distinct, vectors re-join once for the exact verify.

    method='exact': full O(n^2) self-join with exact cosine — the
    correctness oracle / verify stage; at scale run it only on LSH
    candidates, never globally."""
    v = emb_df.select(F.col(id_col).alias("vid"),
                      F.transform(F.col(vec_col),
                                  lambda x: x.cast("double")).alias("v"))
    if method == "exact":
        a = v.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
        b = v.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        from .ann import LSH_SEED, hyperplanes, with_lsh_bucket
        dim = int(emb_df.select(F.size(F.col(vec_col)).alias("d"))
                  .first()["d"])
        pair_ids = None
        for t in range(n_tables):
            planes = hyperplanes(dim, n_planes, seed=LSH_SEED + 101 + t)
            vb = with_lsh_bucket(v, planes, "v").select("vid", "lsh_bucket")
            a = vb.select(F.col("vid").alias("id_a"), "lsh_bucket")
            b = vb.select(F.col("vid").alias("id_b"), "lsh_bucket")
            p = (a.join(b, "lsh_bucket")
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b"))
            pair_ids = p if pair_ids is None else pair_ids.unionByName(p)
        pair_ids = pair_ids.distinct()
        joined = (pair_ids
                  .join(v.select(F.col("vid").alias("id_a"),
                                 F.col("v").alias("va")), "id_a")
                  .join(v.select(F.col("vid").alias("id_b"),
                                 F.col("v").alias("vb")), "id_b"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return (joined
            .withColumn("cosine", dot / (na * nb))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def prepare_salted_edges(edges_df: DataFrame, num_salts: int,
                         hot_threshold: int, key_col: str = "src",
                         spread_col: str = "dst"):
    """Hot-key guard shared by the iterative graph ops (CC, PageRank):
    a celebrity node — one URL linked by a visible fraction of the
    crawl — puts its whole adjacency into ONE task of the per-iteration
    `key_col`-keyed edges><labels join. Detect keys with degree >=
    `hot_threshold` ONCE (degrees are static across iterations), give
    their edge rows a deterministic salt in [0, num_salts) hashed from
    `spread_col`, and salt 0 everywhere else. Returns
    (edges + `_salt` column, hot-keys DataFrame, n_hot). The label side
    replicates its (single) row per hot key across all salts via
    `replicate_salted` each iteration, so the join splits a hot key's
    rows num_salts ways; results are unchanged because the downstream
    aggregates (min / sum) are order-free."""
    deg = edges_df.groupBy(key_col).agg(F.count("*").alias("_deg"))
    hot = (deg.filter(F.col("_deg") >= hot_threshold)
           .select(F.col(key_col).alias("_hot_key")))
    n_hot = hot.count()
    if n_hot == 0:
        return edges_df.withColumn("_salt", F.lit(0)), hot, 0
    salted = (edges_df
              .join(F.broadcast(hot),
                    edges_df[key_col] == hot["_hot_key"], "left")
              .withColumn("_salt", F.when(
                  F.col("_hot_key").isNotNull(),
                  F.pmod(F.xxhash64(spread_col),
                         F.lit(num_salts)).cast("int")).otherwise(0))
              .drop("_hot_key"))
    return salted, hot, n_hot


def replicate_salted(one_per_key_df: DataFrame, key_col: str,
                     hot: DataFrame, n_hot: int,
                     num_salts: int) -> DataFrame:
    """Other half of the hot-key guard: replicate the (unique-per-key)
    rows of hot keys across every salt so each salted edge partition
    finds its match; cold keys ride on salt 0."""
    if n_hot == 0:
        return one_per_key_df.withColumn("_salt", F.lit(0))
    is_hot = one_per_key_df[key_col] == hot["_hot_key"]
    hot_rows = (one_per_key_df.join(F.broadcast(hot), is_hot)
                .drop("_hot_key")
                .withColumn("_salt", F.explode(F.array(
                    *[F.lit(i) for i in range(num_salts)]))))
    cold_rows = (one_per_key_df.join(F.broadcast(hot), is_hot,
                                     "left_anti")
                 .withColumn("_salt", F.lit(0)))
    return cold_rows.unionByName(hot_rows)


def connected_components(pairs_df: DataFrame, nodes_df: DataFrame,
                         a_col: str = "doc_a", b_col: str = "doc_b",
                         id_col: str = "doc_id",
                         max_iters: int = 25,
                         num_salts: int = 8,
                         hot_threshold: int = 1_000_000,
                         stats_out: dict | None = None) -> DataFrame:
    """Undirected connected components by min-label propagation: every
    node's label converges to the smallest node id in its component
    (exact — `min` is order-free, so the result is independent of
    partitioning and iteration batching). Iterates until a fixpoint
    (component diameter bounds the count; `max_iters` is a runaway
    guard). One edges><labels join + one min-aggregate per iteration —
    the standard scalable CC shape (label propagation, no driver-side
    graph)."""
    # localCheckpoint (not mere persist): an iterative DataFrame's plan
    # tree otherwise doubles per iteration (labels appears in both the
    # update and the convergence check) until the analyzer OOMs —
    # checkpointing truncates lineage to the materialized data, the
    # standard pattern for iterative Spark algorithms.
    und = (pairs_df.select(F.col(a_col).alias("src"),
                           F.col(b_col).alias("dst"))
           .unionByName(pairs_df.select(F.col(b_col).alias("src"),
                                        F.col(a_col).alias("dst")))
           .localCheckpoint())  # ids only; also avoids re-running the
    #                            (possibly expensive) pair-finding
    # hot-key guard (see prepare_salted_edges): degrees are static, so
    # salt once up front; per-iteration label rows of hot nodes are
    # replicated across the salts.
    und_s, hot, n_hot = prepare_salted_edges(
        und, num_salts, hot_threshold)
    if n_hot > 0:
        und_s = und_s.localCheckpoint()
    labels = (nodes_df.select(F.col(id_col).alias("node"))
              .withColumn("label", F.col("node")).localCheckpoint())
    converged = False
    n_iters = 0
    for _ in range(max_iters):
        n_iters += 1
        lab_s = replicate_salted(labels, "node", hot, n_hot, num_salts)
        neigh = (und_s.join(lab_s,
                            (und_s["src"] == lab_s["node"])
                            & (und_s["_salt"] == lab_s["_salt"]))
                 .groupBy("dst").agg(F.min("label").alias("nl")))
        half = (labels.join(neigh, labels["node"] == neigh["dst"], "left")
                .select("node", F.least(
                    "label", F.coalesce("nl", "label")).alias("label")))
        # pointer jumping: also adopt the label OF my label — collapses
        # an L-hop chain in O(log L) iterations instead of O(L), so
        # max_iters bounds pathological diameters comfortably
        lol = half.select(F.col("node").alias("l_node"),
                          F.col("label").alias("l_label"))
        new = (half.join(lol, half["label"] == lol["l_node"], "left")
               .select("node", F.least(
                   "label", F.coalesce("l_label", "label")).alias("label"))
               .localCheckpoint())
        changed = (new.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label")).count())
        labels.unpersist()
        labels = new
        if changed == 0:
            converged = True
            break
    if stats_out is not None:
        stats_out["cc_iters"] = n_iters
        stats_out["cc_hot_nodes"] = n_hot
    und.unpersist()
    if n_hot > 0:
        und_s.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "iterations — raise max_iters (labels would be silently "
            "wrong if returned)")
    return labels.select(F.col("node").alias(id_col),
                         F.col("label").alias("cluster_id"))


def dedup_clusters(docs_df: DataFrame, max_hamming: int = 3,
                   id_col: str = "doc_id",
                   stats_out: dict | None = None) -> DataFrame:
    """Transitive near-dup clustering: SimHash Hamming<=k pairs ->
    connected components -> (doc_id, cluster_id = min doc in cluster).
    The cluster-then-keep-one step of a C4/RefinedWeb-style dedup
    pipeline (pairwise drop alone over- or under-deletes on transitive
    chains A~B~C).

    Band-width note for scale: max_hamming=k means k+1 bands of 64/(k+1)
    bits; the default k=3 gives 16-bit band keys, which keeps band
    buckets small (~n/65536 docs each) out to web scale."""
    pairs = simhash_near_dup_pairs(docs_df, max_hamming=max_hamming)
    return connected_components(pairs, docs_df.select(id_col),
                                id_col=id_col, stats_out=stats_out)
