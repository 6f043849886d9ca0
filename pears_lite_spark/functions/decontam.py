"""Benchmark decontamination: n-gram overlap of a training corpus
against an eval/benchmark set.

The standard pretraining hygiene step (the GPT-3 appendix-C /
Llama-style "13-gram dedup against the benchmarks" rule): any training
document sharing at least one word n-gram with a benchmark prompt or
answer is flagged (and usually dropped) so eval numbers aren't inflated
by leakage.

Execution shape, sized for a 100 TB corpus vs a ~millions-of-ngrams
benchmark suite:
  * the benchmark side is tiny by construction — its distinct n-gram
    hashes are BROADCAST, so the corpus never shuffles for the match;
  * the corpus side computes its shingle-hash array per row (pure
    column algebra, map-side), explodes, and broadcast-joins; only the
    MATCHED (rare) rows reach the per-doc aggregate, so the one real
    shuffle is keyed by doc_id over hits only;
  * per-doc n-gram totals ride on the base row (array size), not the
    exploded stream, so the common all-clean document costs one array
    expression and no shuffle rows at all.

No Python in the path; md5 shingle hashing keeps the DuckDB oracle
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _shingle_hashes(df: DataFrame, n: int, id_col: str, text_col: str,
                    lower: bool = True) -> DataFrame:
    """(id_col, _sh: array<string>) — md5 of every n-token shingle of
    the whitespace tokenization; empty array when the doc is shorter
    than n tokens."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    if lower:
        t = F.lower(t)
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    base = df.select(id_col, toks.alias("_t"))
    idx = F.sequence(F.lit(0), F.size("_t") - n)
    sh = F.transform(idx, lambda i: F.md5(
        F.concat_ws(" ", F.slice("_t", i + 1, n))))
    return base.select(
        id_col,
        F.when(F.size("_t") >= n, sh)
        .otherwise(F.array().cast("array<string>")).alias("_sh"))


def benchmark_ngrams(bench_df: DataFrame, n: int,
                     text_col: str = "text") -> DataFrame:
    """Distinct n-gram hashes of the benchmark set: (h: string).
    Small by construction (benchmarks are thousands of prompts, not
    terabytes) — callers broadcast it."""
    sh = _shingle_hashes(bench_df.select(text_col), n,
                         text_col, text_col)
    return (sh.select(F.explode("_sh").alias("h")).distinct())


def ngram_contamination(docs_df: DataFrame, bench_df: DataFrame,
                        n: int = 13, id_col: str = "doc_id",
                        text_col: str = "text",
                        bench_text_col: str = "text") -> DataFrame:
    """Flag corpus docs sharing >= 1 word n-gram with the benchmark
    set. Returns (doc_id, n_ngrams, n_hit, contaminated) where n_hit
    counts DISTINCT matching n-grams (a doc repeating one leaked
    benchmark line scores 1, not its repeat count)."""
    bench = benchmark_ngrams(bench_df, n, bench_text_col)
    base = _shingle_hashes(docs_df, n, id_col, text_col)
    hits = (base.select(id_col, F.explode("_sh").alias("h"))
            .join(F.broadcast(bench), "h")
            .groupBy(id_col)
            .agg(F.count_distinct("h").alias("n_hit")))
    return (base.select(id_col, F.size("_sh").alias("n_ngrams"))
            .join(hits, id_col, "left")
            .select(id_col,
                    F.col("n_ngrams").cast("long").alias("n_ngrams"),
                    F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
                    (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated")))
