"""Multimodal plumbing + driver-contract self-checks."""

import pytest
from pyspark.sql import functions as F


def test_media_features_deterministic(spark):
    from pears_lite_spark.functions.multimodal import (FEATURE_DIM,
                                                       extract_features_df,
                                                       synth_media)
    media = synth_media(spark, 30)
    a = extract_features_df(media).toPandas().sort_values("doc_id")
    b = extract_features_df(media).toPandas().sort_values("doc_id")
    assert len(a) == 30
    assert all(len(f) == FEATURE_DIM for f in a["features"])
    assert a["features"].map(tuple).tolist() == b["features"].map(tuple).tolist()
    assert (a["n_bytes"] > 0).all()


def test_media_strict_mode_raises(spark):
    from pears_lite_spark.functions.multimodal import (extract_features_df,
                                                       synth_media)
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception):
        extract_features_df(synth_media(spark, 3), strict=True).collect()


def test_frame_sample_plan(spark):
    from pears_lite_spark.functions.multimodal import (frame_sample_plan,
                                                       synth_media)
    plan = frame_sample_plan(synth_media(spark, 30), every_ms=1000).toPandas()
    assert (plan["ts_ms"] == plan["frame_idx"] * 1000).all()
    assert plan.groupby("doc_id").size().min() >= 1


def test_contract_query_names_have_oracles_or_are_rowsonly():
    from pears_lite_spark import contract
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20
    # every oracle reads a registered table, or is a table-free oracle
    # over inline literals / generated rows / self-provisioned fixtures
    for name, sql in oracles.items():
        assert any(t in sql for t in ("documents", "embeddings", "events",
                                      "orders", "lineitem", "read_csv",
                                      "read_text", "read_parquet",
                                      "unnest(ARRAY[", "unnest(range(",
                                      "VALUES")), name
    # round 2: every single query is value-checked — no rows-only left
    assert set(oracles) == set(qs)


def test_pdf_extract_roundtrip(spark):
    from pears_lite_spark.functions.pdf import (extract_pdf_df,
                                                extract_pdf_text, synth_pdf)
    texts = ["hello pdf world", "parens (nested) and \\ backslash",
             "second page text"]
    assert extract_pdf_text(synth_pdf(texts[1])) == texts[1]
    assert extract_pdf_text(b"") == ""
    assert extract_pdf_text(None) == ""
    df = spark.createDataFrame(
        [(i, bytearray(synth_pdf(t))) for i, t in enumerate(texts)],
        "doc_id long, payload binary")
    got = {r["doc_id"]: r["text"] for r in extract_pdf_df(df).collect()}
    assert got == dict(enumerate(texts))
