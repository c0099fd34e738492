"""Checkpoint/resume exactness (SURVEY.md §2 O-25, BASELINE.json:6
"checkpoints frontier + seen-set + per-partition lineage/metrics to
Iceberg so runs resume exactly")."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from hiispider_spark.plans.epoch import EpochConfig, bootstrap, run_epoch
from hiispider_spark.sources.catalog import IcebergLike

CFG = EpochConfig(
    k_per_partition=8, n_partitions=8, bloom_m_bits=1 << 17, epoch_seconds=60.0
)


def _snapshot(cat):
    ex = sorted(
        (r.epoch, r.url_hash)
        for r in cat.read("extracted").select("epoch", "url_hash").collect()
    )
    fr = sorted(
        (r.url_hash, str(r.next_fetch_ts), r.state, r.retry_count)
        for r in cat.read("frontier").collect()
    )
    lin = sorted(
        (r.epoch, r.partition_id, r.n_dequeued, r.n_fetched, r.n_extracted)
        for r in cat.read("lineage").collect()
    )
    return ex, fr, lin


def test_resume_after_crash_is_exact(spark, tiny_pages, tiny_seeds, tiny_robots):
    # uninterrupted: bootstrap + 3 epochs
    root_a = tempfile.mkdtemp(prefix="resume_a_")
    cat_a = IcebergLike(spark, root_a)
    bootstrap(spark, cat_a, tiny_seeds, CFG)
    for _ in range(3):
        run_epoch(spark, cat_a, tiny_pages, tiny_robots, CFG)

    # interrupted: 2 epochs, process "dies", new catalog resumes epoch 3
    root_b = tempfile.mkdtemp(prefix="resume_b_")
    cat_b = IcebergLike(spark, root_b)
    bootstrap(spark, cat_b, tiny_seeds, CFG)
    for _ in range(2):
        run_epoch(spark, cat_b, tiny_pages, tiny_robots, CFG)
    cat_b2 = IcebergLike(spark, root_b)  # fresh instance = restart
    assert cat_b2.epoch == 2
    run_epoch(spark, cat_b2, tiny_pages, tiny_robots, CFG)

    assert _snapshot(cat_a) == _snapshot(cat_b2)
    shutil.rmtree(root_a, ignore_errors=True)
    shutil.rmtree(root_b, ignore_errors=True)


def test_staged_writes_invisible_until_commit(spark, tiny_seeds):
    from hiispider_spark.operators.frontier import build_frontier

    root = tempfile.mkdtemp(prefix="stage_")
    cat = IcebergLike(spark, root)
    fr = build_frontier(tiny_seeds, n_partitions=4)
    cat.stage_overwrite("frontier", fr)
    # a concurrent/crashed-then-restarted reader sees nothing
    other = IcebergLike(spark, root)
    assert other.read("frontier").count() == 0
    cat.commit(epoch=0)
    assert IcebergLike(spark, root).read("frontier").count() == fr.count()
    shutil.rmtree(root, ignore_errors=True)


def test_rollback_staged_discards_uncommitted(spark, tiny_seeds):
    from hiispider_spark.operators.frontier import build_frontier

    root = tempfile.mkdtemp(prefix="rb_")
    cat = IcebergLike(spark, root)
    fr = build_frontier(tiny_seeds, n_partitions=4)
    cat.stage_overwrite("frontier", fr)
    cat.commit(epoch=0)
    n0 = cat.read("frontier").count()
    cat.stage_overwrite("frontier", fr.limit(3))
    cat.rollback_staged()
    assert cat.read("frontier").count() == n0
    # the abandoned version directory is gone from disk
    vdirs = sorted(os.listdir(os.path.join(root, "frontier")))
    assert vdirs == [p.split("/")[-1] for p in cat.manifest["tables"]["frontier"]["paths"]]
    shutil.rmtree(root, ignore_errors=True)


def test_append_tables_accumulate_across_commits(spark, tiny_pages, tiny_seeds, tiny_robots):
    root = tempfile.mkdtemp(prefix="app_")
    cat = IcebergLike(spark, root)
    bootstrap(spark, cat, tiny_seeds, CFG)
    counts = []
    for _ in range(2):
        run_epoch(spark, cat, tiny_pages, tiny_robots, CFG)
        counts.append(cat.read("extracted").count())
    assert counts[1] > counts[0]
    # per-epoch rows survive in the same table
    eps = sorted(
        r.epoch for r in cat.read("extracted").select("epoch").distinct().collect()
    )
    assert eps == [1, 2]
    shutil.rmtree(root, ignore_errors=True)
