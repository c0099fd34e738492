"""Epoch plan: the crawl micro-batch + checkpoint/resume."""

from hiispider_spark.plans.epoch import (  # noqa: F401
    EpochConfig,
    bootstrap,
    epoch_timestamp,
    run_epoch,
    run_epochs,
)
