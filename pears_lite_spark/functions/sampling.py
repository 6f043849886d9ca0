"""Corpus mixing utilities: deterministic sampling + token budgeting.

The last mile of a training-data pipeline is MIXING: sample each source
at a rate and cap each source's token contribution. Both operators are
deterministic functions of (doc_id, seed) — no RNG state, so a re-run,
a resume, or a different partitioning selects the IDENTICAL subset
(the property `df.sample()` does NOT give you across retries), and the
driver's DuckDB oracle can reproduce them bit-for-bit via md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_SPACE = 1 << 32


def deterministic_sample(docs_df: DataFrame, rate: float, seed: int = 0,
                         id_col: str = "doc_id") -> DataFrame:
    """Keep a doc iff the first 8 hex chars of md5(seed:doc_id), read
    as a uint32, fall below rate * 2^32 — a fixed hash-threshold
    sample: stable under re-runs and partitioning, stratified-uniform
    over ids, and O(1) per row with no shuffle. Different seeds give
    independent samples (held-out splits)."""
    threshold = int(rate * HASH_SPACE)
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("long")
    return docs_df.filter(h < F.lit(threshold))


def token_budget_take(docs_df: DataFrame, budget: int,
                      group_col: str = "source", id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-source token budgeting: walk each source's docs in id order
    and keep every doc that STARTS before the source's budget is
    exhausted (cumulative whitespace-token count, window cumsum — one
    shuffle on the group key). The standard per-source cap of a mixing
    recipe; deterministic because id order is. Returns the kept docs
    plus (dl, cum_tokens) for audit."""
    dl = F.size(F.filter(F.split(F.col(text_col), " "),
                         lambda x: x != ""))
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (docs_df.withColumn("dl", dl.cast("long"))
           .withColumn("cum_tokens", F.sum("dl").over(w)))
    return out.filter(F.col("cum_tokens") - F.col("dl") < budget)
