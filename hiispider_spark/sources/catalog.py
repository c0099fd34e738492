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
    @staticmethod
    def _entry_paths(entry: dict[str, Any]) -> list[str]:
        """Relative data paths of a manifest entry — full-snapshot form
        ("paths": [...]) or partition-level form ("parts": {pid: path})."""
        if "parts" in entry:
            return list(entry["parts"].values())
        return list(entry.get("paths", []))

    def _read_entry(self, name: str, entry: dict[str, Any] | None) -> DataFrame:
        rels = self._entry_paths(entry) if entry else []
        if not rels:
            schema = schemas.ALL_TABLES.get(name)
            if schema is None:
                raise KeyError(f"unknown table {name!r} with no snapshot")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(
            *[os.path.join(self.root, p) for p in rels]
        )

    def read(self, name: str) -> DataFrame:
        """Current committed snapshot of ``name`` (staged writes invisible,
        exactly like reading an Iceberg table mid-transaction)."""
        return self._read_entry(name, self.manifest["tables"].get(name))

    def read_parts(
        self, name: str, parts: list[int], part_col: str = "part_id"
    ) -> DataFrame:
        """Committed snapshot restricted to the given partitions —
        partition pruning at the manifest level: untouched buckets'
        files are never opened (the Iceberg partition-scan analogue)."""
        entry = self.manifest["tables"].get(name)
        if entry is None or "parts" not in entry:
            from pyspark.sql import functions as F

            return self.read(name).filter(F.col(part_col).isin(list(parts)))
        rels = [entry["parts"][str(p)] for p in parts if str(p) in entry["parts"]]
        if not rels:
            return self.spark.createDataFrame([], schemas.ALL_TABLES[name])
        return self.spark.read.parquet(
            *[os.path.join(self.root, p) for p in rels]
        )

    def read_staged(self, name: str) -> DataFrame:
        """Read the staged (not-yet-committed) version of ``name`` if one
        exists, else the committed snapshot — used when a later stage of
        the same epoch consumes an earlier stage's output."""
        entry = self._staged.get(name)
        if entry is None:
            return self.read(name)
        return self._read_entry(name, entry)

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

    def stage_overwrite_parts(
        self,
        name: str,
        df: DataFrame,
        part_col: str,
        touched_parts: list[int],
    ) -> None:
        """Partition-level overwrite: replace only ``touched_parts``;
        untouched partitions carry over **by manifest reference** — no
        read, no rewrite (the Iceberg dynamic-partition-overwrite
        analogue). An epoch that touches 2 of 10k frontier buckets
        writes 2 bucket directories, not the 10^10-row table.

        ``df`` may contain rows outside ``touched_parts`` — they are
        filtered out (their buckets' committed files stay authoritative).
        A touched partition with zero surviving rows is dropped from the
        manifest. ``part_col`` stays a data column (``_pid`` duplicates
        it for the directory layout, so per-partition files read back
        with the full schema).
        """
        from pyspark.sql import functions as F

        touched = sorted({int(p) for p in touched_parts})
        prev = self._staged.get(name) or self.manifest["tables"].get(name, {})
        if prev.get("paths"):
            raise ValueError(
                f"table {name!r} has a full-snapshot manifest; partition-level "
                "overwrite requires parts-form history (bootstrap it with "
                "stage_overwrite_parts)"
            )
        parts = dict(prev.get("parts", {}))
        next_version = prev.get("next_version", 1)
        if touched:
            rel, absdir = self._new_version_dir(name)
            (
                df.filter(F.col(part_col).isin(touched))
                .withColumn("_pid", F.col(part_col))
                .write.mode("overwrite")
                .partitionBy("_pid")
                .parquet(absdir)
            )
            for p in touched:
                pdir = os.path.join(absdir, f"_pid={p}")
                if os.path.isdir(pdir):
                    parts[str(p)] = os.path.join(rel, f"_pid={p}")
                else:
                    parts.pop(str(p), None)  # partition emptied
            next_version = int(rel.rsplit("v", 1)[1]) + 1
        self._staged[name] = {"parts": parts, "next_version": next_version}

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
            new["tables"][name] = dict(entry)
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
            committed = set(
                self._entry_paths(self.manifest["tables"].get(name, {}))
            )
            for rel in self._entry_paths(entry):
                p = os.path.join(self.root, rel)
                if os.path.exists(p) and rel not in committed:
                    shutil.rmtree(p, ignore_errors=True)
        self._staged = {}
