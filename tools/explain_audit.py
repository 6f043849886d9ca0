"""Physical-plan audit: verifies the plans we claim (predicate/projection
pushdown to parquet, term_bucket partition pruning, broadcast joins,
whole-stage codegen) and prints the evidence. Output is committed as
PLANS.md.

    python tools/explain_audit.py [sf_dir] > PLANS.md
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def grab(text: str, *needles: str) -> list[str]:
    out = []
    for line in text.splitlines():
        if any(n in line for n in needles):
            out.append(line.rstrip())
    return out


def main(sf_dir: str):
    from bench import make_session
    from pyspark.sql import functions as F
    from pears_lite_spark.index.build import (build_postings, read_index,
                                              tokenize_whitespace,
                                              write_index)
    from pears_lite_spark.search.bm25 import bm25_topk, search_blocks
    spark = make_session(8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("# PLANS — physical-plan audit (tools/explain_audit.py)\n")
    print("Checks that the optimizer actually gets what the code is "
          "shaped to give it.\n")

    # 1. scan pushdown: filter + 2-col projection must reach parquet
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    t = explain(q)
    print("## 1. Parquet scan: predicate + projection pushdown\n")
    print("`documents.filter(lang=='en').select(doc_id, n_chars)`\n")
    print("```")
    print("\n".join(grab(t, "PushedFilters", "ReadSchema")))
    print("```")
    ok = "IsNotNull(lang)" in t and "doc_id" in t and "html" not in t
    print(f"\npushdown+pruning: {'OK' if ok else 'CHECK MANUALLY'}\n")

    # 2. BM25 exhaustive: broadcasts + codegen spans (AQE hides codegen
    # subtrees before execution, so probe with AQE off)
    toks = tokenize_whitespace(docs).select("doc_id", "tokens")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    q2 = bm25_topk(toks, ["spark", "join"], 10)
    t = explain(q2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q2.explain("codegen")
    n_wsc = buf.getvalue().count("WholeStageCodegen subtree")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print("## 2. Exhaustive BM25: broadcast joins + whole-stage codegen\n")
    n_bcast = len(set(grab(t, "BroadcastExchange")))
    print(f"```\nBroadcastExchange nodes: {n_bcast // 2 or n_bcast} "
          f"(term df stats + corpus stats)\n"
          f"WholeStageCodegen subtrees: {n_wsc}\n"
          f"TakeOrderedAndProject: {'yes' if 'TakeOrderedAndProject' in t else 'no'}\n```\n")

    # 3. block-index scan: term_bucket partition pruning
    idx_path = "/tmp/pears_plan_idx"
    if not os.path.exists(idx_path):
        postings, stats = build_postings(toks)
        write_index(postings, idx_path, stats=stats)
    postings, stats = read_index(spark, idx_path)
    hits = search_blocks(postings, stats, [["spark", "join"]], k=10,
                         n_buckets=64)
    t = explain(hits)
    print("## 3. Query-time index scan: partition pruning on term_bucket\n")
    part_lines = grab(t, "PartitionFilters", "partition_filters",
                      "PushedFilters")
    print("```")
    print("\n".join(part_lines[:4]))
    print("```")
    pruned = "term_bucket" in t
    print(f"\nterm_bucket pruning present: {'OK' if pruned else 'NO'}\n")

    # 4. index build: shuffle count + what moves through it
    postings_df, _ = build_postings(toks)
    t = explain(postings_df)
    import re
    n_exch = len(re.findall(r"^\(\d+\) Exchange", t, re.M))
    print("## 4. Index build: one non-broadcast exchange, bytes not rows\n")
    print(f"```\nnon-broadcast Exchange count: {n_exch}\n"
          f"exchange payload: partial-run binary blobs "
          f"(schema p/terms/docs/tfs/dls/poss)\n```\n")
    print("The occurrence stream (35M rows / 99k docs at bench scale) "
          "never appears in the plan as rows: phase A emits partial "
          "blobs inside the tokenizing mapInPandas, so the only wide "
          "exchange moves packed bytes (see index/build.py docstring "
          "and BASELINE.md for the measured bridge economics).\n")

    # 5. flat serving path: single stage, no exchange, pruned cache scan
    from pears_lite_spark.search.bm25 import Searcher
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    s = Searcher(postings, stats)
    q5 = (s.flat.filter(F.col("term_id").isin([1, 2]))
          .groupBy("doc_range", "doc_id")
          .agg(F.sum("impact").alias("sc"))
          .orderBy(F.desc("sc")).limit(10))
    t = q5._jdf.queryExecution().executedPlan().toString()
    query_part = t.split("InMemoryRelation")[0]  # cache FILL plan excluded
    print("## 5. Single-query flat serving path: one stage, no shuffle\n")
    print("```")
    for ln in query_part.splitlines():
        print(ln.rstrip()[:100])
    print("```")
    no_exch = "Exchange" not in query_part
    pruned5 = "InMemoryTableScan" in t and "IN (1,2)" in t
    print(f"\nno exchange in the query (partial+final agg in one stage, "
          f"hashpartitioning(doc_range) satisfies the clustering): "
          f"{'OK' if no_exch else 'NO'}")
    print(f"filter pushed into the cached-batch scan (min/max batch "
          f"pruning over the term-sorted cache): "
          f"{'OK' if pruned5 else 'NO'}\n")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # 6. write_index exchange width: >= max(n_buckets, slots) partitions
    n_out = max(64, spark.sparkContext.defaultParallelism)
    w = (postings
         .withColumn("term_bucket", F.pmod("term_id", F.lit(64)).cast("int"))
         .repartition(n_out, "term_bucket", "term_id"))
    t = w._jdf.queryExecution().executedPlan().toString()
    line = [ln for ln in t.splitlines() if "hashpartitioning" in ln]
    print("## 6. Index write: exchange keyed (term_bucket, term_id), "
          "not capped at n_buckets\n")
    print("```")
    print("\n".join(ln.strip()[:110] for ln in line[:1]))
    print("```")
    okw = f"{n_out}" in (line[0] if line else "")
    print(f"\nwrite exchange width {n_out} >= slot count: "
          f"{'OK' if okw else 'CHECK'}\n")

    # 7. lang_id: zero exchanges (per-row column algebra)
    from pears_lite_spark.functions.textstats import lang_id
    t = lang_id(docs)._jdf.queryExecution().executedPlan().toString()
    print("## 7. lang_id: zero exchanges\n")
    print("```")
    print(f"Exchange nodes: {t.count('Exchange')}")
    print("```\n")

    # 8. materialized ANN probe: partition pruning on ivf_cell
    from pears_lite_spark.ann import ivf_topk_indexed, write_ann_index
    ann_path = "/tmp/pears_plan_ann2"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # always rebuild: a stale cached index (old format / regenerated
    # testdata) would audit the wrong artifact
    write_ann_index(emb, ann_path)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    t = (ivf_topk_indexed(spark, ann_path, qv, k=10, nprobe=4)
         ._jdf.queryExecution().executedPlan().toString())
    print("## 8. Materialized ANN probe: partition pruning on ivf_cell\n")
    import re as _re
    pf = _re.search(r"PartitionFilters: \[[^\]]*\]", t)
    print("```")
    print(pf.group(0) if pf else "(no PartitionFilters found)")
    print("```")
    ok8 = "ivf_cell" in t and "PartitionFilters" in t
    print(f"\nprobe scan prunes to nprobe cells (reads nprobe/n_cells "
          f"of the table, not all of it): {'OK' if ok8 else 'NO'}\n")

    # 9. minhash signatures: aggregate over shingle rows, no 16x explode
    from pears_lite_spark.dedup import minhash_signatures
    t = (minhash_signatures(docs.limit(500))
         ._jdf.queryExecution().executedPlan().toString())
    n_gen = sum(1 for ln in t.splitlines() if "Generate explode" in ln)
    print("## 9. MinHash signatures: map-side partial aggregate, "
          "no num_hashes x row explode\n")
    print("```")
    print(f"Generate(explode) nodes: {n_gen} "
          f"(1 = the shingle explode only; the 16 hash slots are "
          f"min() aggregate expressions)")
    print(f"Exchange nodes: {t.count('Exchange')}")
    print("```\n")

    # 10. IVF-PQ probe: LUT scoring entirely JVM-side (no Python eval)
    from pears_lite_spark.ann import ivf_pq_topk_indexed
    t = (ivf_pq_topk_indexed(spark, ann_path, qv, k=10, nprobe=4,
                             refine=100)
         ._jdf.queryExecution().executedPlan().toString())
    pf = _re.search(r"PartitionFilters: \[[^\]]*\]", t)
    print("## 10. IVF-PQ probe: stored codes, JVM-only LUT scoring\n")
    print("```")
    print(pf.group(0) if pf else "(no PartitionFilters found)")
    n_py = t.count("EvalPython")  # Batch/ArrowEvalPython nodes
    print(f"Python-eval nodes in the probe plan: {n_py}")
    print("```")
    print(f"\nLUT-sum over stored pq_codes runs in column algebra "
          f"(no Python worker): {'OK' if n_py == 0 else 'NO'}\n")

    # 11. token_budget: two-phase cumsum — the only full-data exchange
    # keys (source, id-range bucket); offsets arrive by broadcast
    from pears_lite_spark.functions.sampling import token_budget_take
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t = (token_budget_take(docs, budget=600)
         ._jdf.queryExecution().executedPlan().toString())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    exch = [ln.strip() for ln in t.splitlines()
            if "Exchange hashpartitioning" in ln]
    data_exch = [ln for ln in exch if "_tb_bucket" in ln]
    print("## 11. token_budget: per-source cumsum split across "
          "id-range buckets\n")
    print("```")
    for ln in exch:
        print(ln[:110])
    print(f"BroadcastHashJoin for per-bucket offsets: "
          f"{'yes' if 'BroadcastHashJoin' in t else 'no'}")
    print("```\n")
    ok11 = len(data_exch) >= 1 and "BroadcastHashJoin" in t
    print(f"Full corpus rows shuffle ONCE on (source, _tb_bucket) — "
          f"per-source work splits across buckets instead of one task "
          f"per source; the remaining exchanges carry only the "
          f"~buckets x sources offset rows (then broadcast back): "
          f"{'OK' if ok11 else 'NO'}\n")

    # 12. CC/PageRank hot-key guard: star-graph join key includes _salt
    from pears_lite_spark.dedup import (prepare_salted_edges,
                                        replicate_salted)
    star = spark.range(1, 50_001).selectExpr("0L as src", "id as dst")
    und = star.unionByName(star.selectExpr("dst as src", "src as dst"))
    salted, hot, n_hot = prepare_salted_edges(und, num_salts=8,
                                              hot_threshold=1_000)
    n_salts = salted.filter("src = 0").select("_salt").distinct().count()
    labels = und.select(F.col("src").alias("node")).distinct() \
        .withColumn("label", F.col("node"))
    lab_s = replicate_salted(labels, "node", hot, n_hot, 8)
    j = salted.join(lab_s, (salted["src"] == lab_s["node"])
                    & (salted["_salt"] == lab_s["_salt"]))
    t = j._jdf.queryExecution().optimizedPlan().toString()
    keyline = [ln.strip() for ln in t.splitlines() if "Join" in ln][:1]
    print("## 12. Iterative graph ops: celebrity-node salting\n")
    print("```")
    print(f"hot nodes detected (star hub, 100k edges): {n_hot}")
    print(f"distinct salts on the hub's edge rows: {n_salts}")
    for ln in keyline:
        print(ln[:110])
    print("```\n")
    ok12 = n_hot == 1 and n_salts == 8
    print(f"Hub adjacency splits {n_salts} ways in the per-iteration "
          f"join (salt in the join key; label rows replicated per "
          f"salt): {'OK' if ok12 else 'NO'}\n")
    print("## 13. line_dedup: md5-keyed exchanges, map-side distinct, "
          "no line text in the df shuffle\n")
    from pears_lite_spark.dedup import line_dedup
    lined = docs.withColumn(
        "text", F.regexp_replace("text", r"((\S+\s+){9}\S+)\s", "$1\n"))
    t = explain(line_dedup(lined, min_doc_freq=5))
    exch = [ln.strip()[:110] for ln in t.splitlines()
            if "Exchange" in ln and "Reused" not in ln]
    partial_distinct = "partial_count(distinct" in t
    reused = t.count("ReusedExchange")
    print("```")
    for ln in exch:
        print(ln)
    print(f"map-side partial distinct df aggregate: {partial_distinct}")
    print(f"ReusedExchange nodes: {reused}")
    print("```\n")
    ok13 = partial_distinct and all("hashpartitioning" in e or
                                    "SinglePartition" not in e for e in exch)
    print(f"df aggregate combines map-side; every wide exchange is "
          f"hash-keyed (md5 line key / doc_id), none single-partition: "
          f"{'OK' if ok13 else 'NO'}\n")

    print("## 14. anchor_text_rollup: celebrity targets collapse "
          "map-side before the top-k window\n")
    from pears_lite_spark.sources import anchor_text_rollup
    anchors = spark.createDataFrame(
        [(f"https://p{i}.example/", "https://hub.example/",
          f"anchor {i % 40}") for i in range(2000)],
        "url string, link string, anchor string")
    t = explain(anchor_text_rollup(anchors))
    pre = [ln.strip()[:110] for ln in t.splitlines()
           if ln.strip().startswith("Functions") and "partial_" in ln]
    exch14 = [ln.strip()[:110] for ln in t.splitlines()
              if "hashpartitioning" in ln]
    n_exch = sum(1 for ln in t.splitlines()
                 if ln.strip().startswith("(") and ") Exchange" in ln)
    print("```")
    for ln in pre + exch14:
        print(ln)
    print(f"Exchange nodes: {n_exch} "
          f"(the final link rollup reuses the window's partitioning)")
    print("```\n")
    ok14 = "partial_count(1)" in t and n_exch == 2
    print(f"(link, anchor) pre-aggregate is partial before any "
          f"exchange — a hub target linked from every page reduces to "
          f"its distinct anchor strings per map task — and the top-k "
          f"window + final rollup share one link-keyed exchange: "
          f"{'OK' if ok14 else 'NO'}\n")
    print("## 15. pack_sequences: global cumsum splits across id-range "
          "buckets\n")
    from pears_lite_spark.functions.sampling import pack_sequences
    t = explain(pack_sequences(docs, seq_len=2048))
    parts = [ln.strip()[:110] for ln in t.splitlines()
             if "hashpartitioning(_tb_bucket" in ln]
    single = [ln.strip()[:110] for ln in t.splitlines()
              if "SinglePartition" in ln]
    print("```")
    for ln in parts[:2]:
        print(ln)
    print(f"SinglePartition exchanges: {len(single)} "
          f"(only the <= num_buckets offset rows, never data rows)")
    print("```\n")
    ok15 = bool(parts)
    print(f"Full corpus rows shuffle on the id-range bucket — the "
          f"global token cumsum parallelizes O(num_buckets) instead of "
          f"one task, and the offsets branch touches only per-bucket "
          f"totals: {'OK' if ok15 else 'NO'}\n")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
