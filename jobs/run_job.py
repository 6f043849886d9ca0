"""Thin spark-submit launcher: the package itself ships via --py-files.

    spark-submit --py-files /tmp/pears_lite_spark.zip jobs/run_job.py \
        build --input <corpus.parquet> --output <index_dir> [--resume]
"""
import sys

from pears_lite_spark.jobs import main

if __name__ == "__main__":
    sys.exit(main())
