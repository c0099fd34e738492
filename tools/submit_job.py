"""Minimal spark-submit entry: one bootstrap + one crawl epoch.

The north rule requires the engine to run "via spark-submit --py-files
on a multi-executor cluster"; this is that entry point. The package
arrives as a zip on the executors' PYTHONPATH (--py-files), the driver
gets its SparkSession from spark-submit, and all engine state goes to
--workdir tables.

Usage:
  spark-submit --master local[8] \
    --py-files hiispider_spark.zip tools/submit_job.py \
    <sf_dir> <workdir>
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hiispider_submit"

    spark = (
        SparkSession.builder.appName("hiispider-submit-smoke")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    # imports resolve from the --py-files zip, not the repo checkout
    from hiispider_spark.plans.epoch import EpochConfig, bootstrap, run_epoch
    from hiispider_spark.sources.catalog import IcebergLike
    from hiispider_spark.sources.synth import (
        SynthConfig,
        synth_pages,
        synth_robots,
        synth_seeds,
    )

    cfg_s = SynthConfig(n_pages=2000, n_docs=500)
    pages = synth_pages(spark, sf_dir, cfg_s)
    cat = IcebergLike(spark, workdir)
    cfg = EpochConfig(
        k_per_partition=32, n_partitions=8, bloom_m_bits=1 << 18,
        collect_stats=False,
    )
    bootstrap(spark, cat, synth_seeds(spark, sf_dir, cfg_s), cfg)
    stats = run_epoch(spark, cat, pages, synth_robots(spark, sf_dir, cfg_s), cfg)
    print("SUBMIT_SMOKE_RESULT " + json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
