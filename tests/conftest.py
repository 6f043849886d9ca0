import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pears_lite_spark.session import get_spark
    s = get_spark(app_name="pears-tests", master="local[4]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    from pears_lite_spark.corpus import gen_corpus
    return gen_corpus(240)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    from pears_lite_spark.index.build import with_doc_id
    return with_doc_id(spark.createDataFrame(corpus_pdf)).cache()


@pytest.fixture(scope="session")
def spm_tokens_df(spark, corpus_df):
    from pears_lite_spark.index.build import tokenize_spm
    return (tokenize_spm(corpus_df.select("doc_id", "text"))
            .select("doc_id", "tokens").cache())
