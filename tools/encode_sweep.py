"""Encode-phase config sweep with subprocess isolation (min of reps).

    python tools/encode_sweep.py            # sweep
    python tools/encode_sweep.py ONE <cores> <mem> <batch>   # one run
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CORPUS = "/tmp/pears_bench_corpus_100000_f64.parquet"


def one(cores: int, mem: str, batch: int):
    os.environ["PEARS_DRIVER_MEM"] = mem
    import bench
    from pears_lite_spark.index.build import (build_postings, corpus_stats,
                                              ingest_tokens)
    spark = bench.make_session(cores)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(CORPUS).select("url", "html")
    toks = ingest_tokens(corpus).select("doc_id", "tokens").persist()
    toks.count()
    stats = corpus_stats(toks)
    postings, _ = build_postings(toks.limit(2000), stats=stats)
    postings.count()          # warm every python worker
    t0 = time.time()
    postings, _ = build_postings(toks, stats=stats)
    nb = postings.count()
    print(f"RESULT {time.time()-t0:.1f} {nb}")
    spark.stop()


def sweep():
    for cores in (2, 8, 32):
        for mem in ("8g", "32g"):
            for batch in (10000, 65536):
                ts = []
                for _ in range(2):
                    p = subprocess.run(
                        [sys.executable, __file__, "ONE", str(cores), mem,
                         str(batch)], capture_output=True, text=True,
                        timeout=1200)
                    for ln in p.stdout.splitlines():
                        if ln.startswith("RESULT"):
                            ts.append(float(ln.split()[1]))
                print(f"cores={cores} mem={mem} batch={batch}: "
                      f"min={min(ts):.1f}s runs={['%.1f' % t for t in ts]}",
                      flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ONE":
        one(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
    else:
        sweep()
