"""Benchmark harness (driver contract + scaling evidence).

Default run: headline suite at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] — a multi-epoch crawl (north metric: URLs
fetched+extracted per second) plus representative operator timings.
Prints ONE JSON line.

``python bench.py --scaling``: runs one production-shaped heavy epoch
(corpus ×$BENCH_SCALING_MULT, politeness budget = 1h) at two
parallelism levels, median of $BENCH_SCALING_RUNS runs each, and
appends the N→4N efficiency evidence to BENCH/BASELINE.md.

Why the scaling pair is local[4]→local[16] by default: this sandbox
advertises 32 vCPUs but raw CPU throughput (measured: parallel busy
loops) scales 1→8 cores at 1.00× per core, 8→16 at 0.95×, and 16→32 at
only 1.13× total — i.e. ~16 effective cores. (T_32/T_8)/4 is therefore
capped at ~0.54 by the platform regardless of software. 4→16 is the
largest 4× pair inside the hardware's linear region, so it measures
the ENGINE's scaling rather than SMT saturation. Override with
$BENCH_SCALING_CPUS="8,32" to reproduce the platform-capped pair.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EPOCHS = int(os.environ.get("BENCH_EPOCHS", "3"))
SCALING_MULT = int(os.environ.get("BENCH_SCALING_MULT", "20"))
SCALING_RUNS = int(os.environ.get("BENCH_SCALING_RUNS", "3"))
SCALING_CPUS = [
    int(x) for x in os.environ.get("BENCH_SCALING_CPUS", "4,16").split(",")
]


def _corpus(spark, sf_dir: str, mult: int, pages_dir: str):
    """Synthesize the corpus once and land pages as a parquet table —
    the production shape (a page store is scanned, never cached)."""
    from hiispider_spark.sources.synth import (
        SynthConfig,
        synth_pages,
        synth_robots,
        synth_seeds,
    )

    base = SynthConfig.from_sf_dir(spark, sf_dir)
    cfg_s = SynthConfig(n_pages=base.n_pages * mult, n_docs=base.n_docs)
    synth_pages(spark, sf_dir, cfg_s).write.mode("overwrite").parquet(
        f"{pages_dir}/pages"
    )
    pages = spark.read.parquet(f"{pages_dir}/pages")
    robots = synth_robots(spark, sf_dir, cfg_s).persist()
    robots.count()
    return pages, synth_seeds(spark, sf_dir, cfg_s), robots


def _warm_python_workers(spark, cpus: int):
    from pyspark.sql import functions as F

    from hiispider_spark.functions.siphash import url_hash_udf

    spark.range(10**6, numPartitions=cpus * 2).select(
        F.max(url_hash_udf(F.format_string("u%d", F.col("id"))))
    ).collect()


def run_crawl(
    cpus: int,
    sf_dir: str,
    n_epochs: int = N_EPOCHS,
    mult: int = 1,
    epoch_seconds: float = 600.0,
    n_runs: int = 1,
) -> dict:
    """Bootstrap + crawl epochs; corpus synth and worker warmup are
    outside the timed region. n_runs>1 → median throughput."""
    from hiispider_spark.plans.epoch import EpochConfig, bootstrap, run_epoch
    from hiispider_spark.session import get_spark
    from hiispider_spark.sources.catalog import IcebergLike

    spark = get_spark(app=f"bench-local{cpus}", cpus=cpus, shuffle_partitions=32)
    pages_dir = tempfile.mkdtemp(prefix=f"bench_pages_{cpus}_")
    try:
        pages, seeds, robots = _corpus(spark, sf_dir, mult, pages_dir)
        cfg = EpochConfig(
            k_per_partition=1 << 17,
            n_partitions=32,
            bloom_m_bits=1 << 24,
            collect_stats=False,
            epoch_seconds=epoch_seconds,
        )
        _warm_python_workers(spark, cpus)
        if n_runs > 1:
            # full-pipeline warmup epoch: JIT + codegen + python workers
            # (first-run walls measured ~2× the warm steady state)
            wroot = tempfile.mkdtemp(prefix=f"bench_warm_{cpus}_")
            wcat = IcebergLike(spark, wroot)
            bootstrap(spark, wcat, seeds, cfg)
            run_epoch(spark, wcat, pages, robots, cfg)
            shutil.rmtree(wroot, ignore_errors=True)
        runs = []
        for _ in range(n_runs):
            root = tempfile.mkdtemp(prefix=f"bench_cat_{cpus}_")
            cat = IcebergLike(spark, root)
            bootstrap(spark, cat, seeds, cfg)
            t0 = time.time()
            total_urls = 0
            epoch_walls = []
            for _e in range(n_epochs):
                te = time.time()
                st = run_epoch(spark, cat, pages, robots, cfg)
                epoch_walls.append(round(time.time() - te, 2))
                total_urls += st["n_extracted"]
            wall = time.time() - t0
            runs.append(
                {
                    "wall_s": round(wall, 2),
                    "epoch_walls": epoch_walls,
                    "urls_extracted": int(total_urls),
                    "urls_per_sec": round(total_urls / wall, 1),
                }
            )
            shutil.rmtree(root, ignore_errors=True)
        med = statistics.median(r["urls_per_sec"] for r in runs)
        return {
            "cpus": cpus,
            "n_epochs": n_epochs,
            "mult": mult,
            "median_urls_per_sec": med,
            "runs": runs,
        }
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)
        spark.stop()


def run_queries(sf_dir: str, cpus: int) -> dict[str, float]:
    """Representative operator timings (seconds, action = count)."""
    import __spark_entry__ as entrymod

    from hiispider_spark.session import get_spark

    headline = [
        "crawl_epoch_flagship",
        "dedup_exact",
        "dedup_minhash_lsh",
        "text_profile",
        "ann_cosine_topk",
        "host_stats",
        "seen_antijoin",
        "politeness_budget",
    ]
    spark = get_spark(app="bench-queries", cpus=cpus, shuffle_partitions=32)
    out: dict[str, float] = {}
    try:
        _warm_python_workers(spark, cpus)
        qs = entrymod.queries()
        for name in headline:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            out[name] = round(time.time() - t0, 2)
    finally:
        spark.stop()
    return out


def main() -> None:
    scaling = "--scaling" in sys.argv
    result: dict = {}
    if scaling:
        lo_c, hi_c = SCALING_CPUS
        lo = run_crawl(
            lo_c, SF_DIR, n_epochs=1, mult=SCALING_MULT,
            epoch_seconds=3600.0, n_runs=SCALING_RUNS,
        )
        hi = run_crawl(
            hi_c, SF_DIR, n_epochs=1, mult=SCALING_MULT,
            epoch_seconds=3600.0, n_runs=SCALING_RUNS,
        )
        eff = (hi["median_urls_per_sec"] / lo["median_urls_per_sec"]) / (
            hi_c / lo_c
        )
        result["scaling"] = {
            "pair": [lo_c, hi_c],
            "lo": lo,
            "hi": hi,
            "efficiency": round(eff, 3),
        }
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as f:
            f.write(
                f"\n| {time.strftime('%Y-%m-%d %H:%M')} | sf0.1×{SCALING_MULT} | "
                f"T_{lo_c}={lo['median_urls_per_sec']} urls/s | "
                f"T_{hi_c}={hi['median_urls_per_sec']} urls/s | "
                f"eff={eff:.3f} (median of {SCALING_RUNS}) |"
            )
    qtimes = run_queries(SF_DIR, CPUS)
    crawl = run_crawl(CPUS, SF_DIR, n_epochs=N_EPOCHS)
    wall = crawl["runs"][0]["wall_s"]
    result.update(
        {
            "metric": "crawl_epochs_plus_headline_queries_wall",
            "value": round(wall + sum(qtimes.values()), 2),
            "unit": "sec",
            "queries": {**qtimes, "crawl_epochs": wall},
            "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
            "cpus": CPUS,
            "crawl": crawl,
        }
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
