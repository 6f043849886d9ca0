"""Serving-latency decomposition: Searcher p50 vs partition count.

    python tools/p50_probe.py [index_dir]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(idx: str):
    from bench import make_session
    from pears_lite_spark.corpus import gen_corpus, gen_query_set
    from pears_lite_spark.index.build import read_index
    from pears_lite_spark.search.bm25 import Searcher
    from pears_lite_spark.vocab import get_vocab
    spark = make_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    postings, stats = read_index(spark, idx)
    v = get_vocab()
    qs = [v.encode_as_pieces(q) for q in gen_query_set(gen_corpus(2000))]
    qs = [p for p in qs if p]
    for nparts in (32, 8, 4):
        s = Searcher(postings, stats, n_partitions=nparts)
        s.search([qs[0]], k=10)
        lat = []
        for p in qs[:30]:
            t0 = time.time()
            s.search([p], k=10)
            lat.append(time.time() - t0)
        print(f"nparts={nparts}: p50={statistics.median(lat)*1000:.0f}ms "
              f"min={min(lat)*1000:.0f}ms", flush=True)
        s.df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/tmp/pears_bench_idx_high32_0")
