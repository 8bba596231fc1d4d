"""Snapshot-table source: Iceberg-style atomic snapshots + incremental reads
over plain parquet (the stand-in for an Iceberg catalog in this environment;
swap ``SnapshotTable`` for ``spark.read.format("iceberg")`` +
``option("start-snapshot-id", ...)`` on a real cluster — the pipeline code
does not change).

Layout::

    table/
      data/<commit-uuid>/part-*.parquet     immutable data files per commit
      _snapshots/v000001.json               {"version", "parent", "files"}
      _snapshots/CURRENT                    -> latest version number

Commit protocol (single-writer): write data files -> write v<N>.json
(tmp + atomic rename) -> atomically update CURRENT.  Readers resolve CURRENT
(or a pinned version) and read exactly that file set — crash between steps
leaves orphan data files, never a torn snapshot (the WAL property the
reference gets from its journal, ``internal/controller/journal.go``).

``read_incremental(a, b)`` returns only rows in files added after snapshot a
up to b — the batch-incremental feed of the north star: each pipeline run
processes the new snapshot delta, checkpoints its position, and is rerunnable.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.snap_dir = os.path.join(path, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    def current_version(self) -> int:
        cur = os.path.join(self.snap_dir, "CURRENT")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip())

    def _snapshot(self, version: int) -> dict:
        with open(os.path.join(self.snap_dir, f"v{version:06d}.json")) as f:
            return json.load(f)

    def files(self, version: int | None = None) -> list[str]:
        version = self.current_version() if version is None else version
        if version == 0:
            return []
        return self._snapshot(version)["files"]

    # -- write -------------------------------------------------------------
    def commit(self, df: DataFrame) -> int:
        """Append ``df`` as one atomic snapshot; returns the new version."""
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.path, "data", commit_id)
        df.write.mode("error").parquet(data_dir)
        new_files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        parent = self.current_version()
        version = parent + 1
        snap = {
            "version": version,
            "parent": parent,
            "files": self.files(parent) + new_files,
            "added": new_files,
        }
        tmp = os.path.join(self.snap_dir, f".v{version:06d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.rename(tmp, os.path.join(self.snap_dir, f"v{version:06d}.json"))
        cur_tmp = os.path.join(self.snap_dir, ".CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(str(version))
        os.rename(cur_tmp, os.path.join(self.snap_dir, "CURRENT"))
        return version

    # -- read --------------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        files = self.files(version)
        if not files:
            raise ValueError("empty table: no snapshot to read")
        return self.spark.read.parquet(*files)

    def read_incremental(self, from_version: int, to_version: int | None = None) -> DataFrame | None:
        """Rows added strictly after ``from_version`` up to ``to_version``
        (default CURRENT).  None when there is nothing new."""
        to_version = self.current_version() if to_version is None else to_version
        added: list[str] = []
        v = to_version
        while v > from_version:
            snap = self._snapshot(v)
            added.extend(snap.get("added", []))
            v = snap["parent"]
        if not added:
            return None
        return self.spark.read.parquet(*sorted(added))


class IncrementalPosition:
    """Tiny checkpoint: the last snapshot version a consumer processed
    (the batch-incremental twin of a Kafka consumer offset)."""

    def __init__(self, path: str):
        self.path = path

    def get(self) -> int:
        if not os.path.exists(self.path):
            return 0
        with open(self.path) as f:
            return int(f.read().strip())

    def set(self, version: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.rename(tmp, self.path)
