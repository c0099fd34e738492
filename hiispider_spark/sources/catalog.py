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

# Tables that support merge-on-read delta commits: key column whose
# latest version wins at read time. An epoch appends O(changed-rows)
# delta files instead of rewriting O(table) partition snapshots; reads
# resolve base-vs-delta with a BROADCAST anti-join on the (small) delta
# key set, so the base scan keeps its filter pushdown and no O(table)
# shuffle is added. Compaction folds deltas back into partition files.
MERGE_KEYS = {"frontier": "url_hash"}


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
        """ALL relative data paths of a manifest entry (incl. delta
        files) — full-snapshot form ("paths": [...]) or partition-level
        form ("parts": {pid: path}, optional "deltas": [...])."""
        if "parts" in entry:
            return list(entry["parts"].values()) + list(entry.get("deltas", []))
        return list(entry.get("paths", []))

    def _read_rels(self, name: str, rels: list[str]) -> DataFrame:
        if not rels:
            schema = schemas.ALL_TABLES.get(name)
            if schema is None:
                raise KeyError(f"unknown table {name!r} with no snapshot")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(
            *[os.path.join(self.root, p) for p in rels]
        )

    def _delta_latest(self, name: str, entry: dict[str, Any]) -> DataFrame:
        """Latest version of every key present in any delta file of
        ``entry`` — last-written delta wins. O(delta rows): deltas are
        per-epoch change sets, never the table."""
        from pyspark.sql import functions as F

        key = MERGE_KEYS[name]
        dl: DataFrame | None = None
        # explicit schema: an all-deferred epoch writes a 0-row delta
        # (no part files), which plain parquet reads can't infer
        schema = schemas.ALL_TABLES[name]
        for seq, rel in enumerate(entry.get("deltas", [])):
            df = self.spark.read.schema(schema).parquet(
                os.path.join(self.root, rel)
            )
            df = df.withColumn("_seq", F.lit(seq))
            dl = df if dl is None else dl.unionByName(df)
        assert dl is not None
        cols = [c for c in dl.columns if c != "_seq"]
        val = [c for c in cols if c != key]
        return (
            dl.groupBy(key)
            .agg(F.max_by(F.struct(*val), F.col("_seq")).alias("_s"))
            .select(key, "_s.*")
            .select(*cols)
        )

    def _resolve(self, name: str, base: DataFrame, latest: DataFrame) -> DataFrame:
        """Merge-on-read: a base row survives unless its key appears in
        a delta. The delta key set is small (epoch change sets), so the
        invalidation is a BROADCAST anti-join — predicates still push
        into the base parquet scan, and no O(table) shuffle happens."""
        from pyspark.sql import functions as F

        key = MERGE_KEYS[name]
        return base.join(
            F.broadcast(latest.select(key)), key, "left_anti"
        ).unionByName(latest.select(*base.columns))

    def _read_entry(self, name: str, entry: dict[str, Any] | None) -> DataFrame:
        if entry and entry.get("deltas"):
            base = self._read_rels(name, list(entry["parts"].values()))
            return self._resolve(name, base, self._delta_latest(name, entry))
        rels = self._entry_paths(entry) if entry else []
        return self._read_rels(name, rels)

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
        from pyspark.sql import functions as F

        entry = self.manifest["tables"].get(name)
        if entry is None or "parts" not in entry:
            return self.read(name).filter(F.col(part_col).isin(list(parts)))
        rels = [entry["parts"][str(p)] for p in parts if str(p) in entry["parts"]]
        base = self._read_rels(name, rels) if rels else (
            self.spark.createDataFrame([], schemas.ALL_TABLES[name])
        )
        if entry.get("deltas"):
            # a key's bucket never changes across versions, so pruning
            # deltas by part_col before resolution is exact
            latest = self._delta_latest(name, entry).filter(
                F.col(part_col).isin(list(parts))
            )
            return self._resolve(name, base, latest)
        return base

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
        clear_deltas: bool = False,
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
        if prev.get("deltas") and not clear_deltas:
            raise ValueError(
                f"table {name!r} has pending delta files; a partition "
                "overwrite that ignores them would resurrect stale base "
                "rows — compact() first (or pass clear_deltas=True with "
                "touched_parts covering every delta row's partition)"
            )
        parts = dict(prev.get("parts", {}))
        next_version = prev.get("next_version", 1)
        if touched:
            rel, absdir = self._new_version_dir(name)
            (
                df.filter(F.col(part_col).isin(touched))
                # co-locate each bucket into one task before partitionBy:
                # without this every input partition writes a file into
                # every bucket directory (P×P small files), and the
                # driver-side commit protocol is SERIAL in file count —
                # measured as the dominant non-scaling cost of the write
                # phase. One shuffle of the (small) touched slice buys a
                # ~P× smaller file inventory.
                .repartition(len(touched), F.col(part_col))
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

    def stage_append_delta(self, name: str, df: DataFrame) -> None:
        """Merge-on-read upsert commit (the Iceberg/Delta MERGE shape at
        its cheapest): append ONE file set holding only this epoch's
        changed rows. Write cost is O(changed), not O(table) — the shape
        that survives a 10^10-row frontier where partition-level
        overwrite still rewrites every bucket the epoch dequeued from.
        Reads resolve newest-key-wins (see ``_resolve``); ``compact``
        folds deltas back into partition files to bound read fan-in.
        """
        if name not in MERGE_KEYS:
            raise KeyError(f"no merge key registered for table {name!r}")
        prev = self._staged.get(name) or self.manifest["tables"].get(name, {})
        if prev.get("paths"):
            raise ValueError(
                f"table {name!r} has a full-snapshot manifest; delta commits "
                "require parts-form history"
            )
        rel, absdir = self._new_version_dir(name)
        df.write.mode("overwrite").parquet(absdir)
        self._staged[name] = {
            "parts": dict(prev.get("parts", {})),
            "deltas": list(prev.get("deltas", [])) + [rel],
            "next_version": int(rel.rsplit("v", 1)[1]) + 1,
        }

    def delta_count(self, name: str) -> int:
        """Number of pending delta file sets (staged view) — the
        compaction trigger."""
        entry = self._staged.get(name) or self.manifest["tables"].get(name, {})
        return len(entry.get("deltas", []))

    def compact(self, name: str, part_col: str = "part_id") -> list[int]:
        """Fold pending deltas into partition-level base files.

        Only partitions that appear in some delta row are rewritten
        (resolved base∪delta for those buckets); every other bucket
        carries over by manifest reference. Runs inside the current
        transaction — staged, atomic with the epoch's commit. Returns
        the rewritten partition ids.
        """
        entry = self._staged.get(name) or self.manifest["tables"].get(name, {})
        if not entry.get("deltas"):
            return []
        latest = self._delta_latest(name, entry).persist()
        try:
            dparts = sorted(
                r[0] for r in latest.select(part_col).distinct().collect()
            )
            rels = [
                entry["parts"][str(p)] for p in dparts if str(p) in entry["parts"]
            ]
            base = self._read_rels(name, rels) if rels else (
                self.spark.createDataFrame([], schemas.ALL_TABLES[name])
            )
            resolved = self._resolve(name, base, latest)
            self.stage_overwrite_parts(
                name, resolved, part_col, dparts, clear_deltas=True
            )
        finally:
            latest.unpersist()
        return dparts

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
