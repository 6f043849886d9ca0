"""Driver-side XXH64 must equal Spark's xxhash64 (seed 42) so pytest
oracles can reproduce engine doc ids."""

import numpy as np
from pyspark.sql import functions as F

from pears_lite_spark.xxh64 import xxh64_signed


def test_xxh64_matches_spark_strings(spark):
    rng = np.random.default_rng(3)
    strings = ["", "a", "abc", "https://site0.example/en/page0",
               "▁the quick", "x" * 100] + [
        "s%d" % rng.integers(0, 10**9) for _ in range(50)]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r["s"]: r["h"] for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in strings:
        assert got[s] == xxh64_signed(s), repr(s)


def test_xxh64_matches_spark_longs(spark):
    vals = [0, 1, -1, 42, 2**62, -2**62, 1234567890123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in
           df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        expected = xxh64_signed(int(v).to_bytes(8, "little", signed=True))
        assert got[v] == expected, v
