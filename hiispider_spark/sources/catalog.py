"""IcebergLike — snapshot-versioned parquet tables with atomic commits.

hiispider keeps durable state in MySQL/Cassandra/Redis and recovers by
re-reading it at boot [hs: hiispider/servers/scheduler.py (boot load) †].
Our equivalent (SURVEY.md §2 O-25) is an Iceberg-style table layer:
every table is a set of immutable parquet version directories plus one
JSON manifest naming the current snapshot. The manifest rename is the
single atomic commit point — partially-written epochs are invisible, so
"runs resume exactly" (BASELINE.json:6).

No Iceberg jars exist in this sandbox (SURVEY.md §0); on a real cluster
this class swaps for ``spark.table`` / ``df.writeTo(...).append()`` with
identical call sites — the pipeline code only touches
read/stage_overwrite/stage_append/commit.

Scale note (100 TB): version dirs are written with the producing plan's
partitioning (the frontier stays bucketed by ``part_id``); the manifest
holds only paths+counts, never data, so commit cost is O(1) regardless
of table size, like an Iceberg snapshot pointer swap.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from hiispider_spark import schemas

_MANIFEST = "manifest.json"


class IcebergLike:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._staged: dict[str, dict[str, Any]] = {}
        self.manifest = self._load_manifest()

    # ------------------------------------------------------------- manifest
    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def _load_manifest(self) -> dict[str, Any]:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"snapshot_id": 0, "epoch": -1, "tables": {}}

    @property
    def epoch(self) -> int:
        """Last committed epoch (-1 before the first commit)."""
        return int(self.manifest["epoch"])

    # ----------------------------------------------------------------- read
    def read(self, name: str) -> DataFrame:
        """Current committed snapshot of ``name`` (staged writes invisible,
        exactly like reading an Iceberg table mid-transaction)."""
        entry = self.manifest["tables"].get(name)
        if entry is None or not entry["paths"]:
            schema = schemas.ALL_TABLES.get(name)
            if schema is None:
                raise KeyError(f"unknown table {name!r} with no snapshot")
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, p) for p in entry["paths"]]
        return self.spark.read.parquet(*paths)

    def read_staged(self, name: str) -> DataFrame:
        """Read the staged (not-yet-committed) version of ``name`` if one
        exists, else the committed snapshot — used when a later stage of
        the same epoch consumes an earlier stage's output."""
        entry = self._staged.get(name)
        if entry is None:
            return self.read(name)
        paths = [os.path.join(self.root, p) for p in entry["paths"]]
        return self.spark.read.parquet(*paths)

    # ---------------------------------------------------------------- write
    def _new_version_dir(self, name: str) -> tuple[str, str]:
        ver = self.manifest["tables"].get(name, {}).get("next_version", 1)
        staged = self._staged.get(name)
        if staged:
            ver = max(ver, staged["next_version"])
        rel = os.path.join(name, f"v{ver:06d}")
        return rel, os.path.join(self.root, rel)

    def stage_overwrite(self, name: str, df: DataFrame) -> None:
        """Write a full replacement snapshot for ``name`` (frontier,
        seen_set, politeness — the read-modify-write state tables)."""
        rel, absdir = self._new_version_dir(name)
        df.write.mode("overwrite").parquet(absdir)
        self._staged[name] = {
            "paths": [rel],
            "next_version": int(rel.rsplit("v", 1)[1]) + 1,
        }

    def stage_append(self, name: str, df: DataFrame) -> None:
        """Append a new data file set to ``name`` (extracted, lineage —
        the append-only fact tables)."""
        rel, absdir = self._new_version_dir(name)
        df.write.mode("overwrite").parquet(absdir)
        prev = self._staged.get(name, {}).get("paths")
        if prev is None:
            prev = list(self.manifest["tables"].get(name, {}).get("paths", []))
        self._staged[name] = {
            "paths": prev + [rel],
            "next_version": int(rel.rsplit("v", 1)[1]) + 1,
        }

    # --------------------------------------------------------------- commit
    def commit(self, epoch: int) -> None:
        """Atomically publish all staged table versions as epoch ``epoch``.

        The ``os.replace`` of the manifest is the commit point (crash
        before it → old snapshot intact; crash after → new snapshot
        fully visible). Mirrors Iceberg's atomic metadata swap.
        """
        new = {
            "snapshot_id": self.manifest["snapshot_id"] + 1,
            "epoch": epoch,
            "tables": dict(self.manifest["tables"]),
        }
        for name, entry in self._staged.items():
            new["tables"][name] = {
                "paths": entry["paths"],
                "next_version": entry["next_version"],
            }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())
        self.manifest = new
        self._staged = {}

    def rollback_staged(self) -> None:
        """Drop staged (uncommitted) writes — crash-recovery analogue."""
        for name, entry in self._staged.items():
            for rel in entry["paths"]:
                p = os.path.join(self.root, rel)
                if os.path.exists(p) and rel not in self.manifest["tables"].get(
                    name, {}
                ).get("paths", []):
                    shutil.rmtree(p, ignore_errors=True)
        self._staged = {}
