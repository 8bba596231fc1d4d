"""Sink table writers: the one seam between the pipeline and physical
storage, so swapping the parquet-directory stand-in for a real Iceberg
catalog is a ONE-LINER at the call site (pass ``IcebergWriter(catalog)``
instead of the default ``ParquetDirWriter(out_dir)``) — the pipeline,
dispatcher, and manifest code do not change.

- :class:`ParquetDirWriter` — what this environment runs: one
  ``sink=<name>`` directory per sink, hive-partitioned by the given columns,
  atomic-by-directory overwrite (commit semantics layered on top by
  ``plans/manifest.py`` / ``sources/snapshots.py``).
- :class:`IcebergWriter` — the production path on a cluster with the Iceberg
  runtime: DataFrameWriterV2 against a catalog table, which brings the
  atomic-commit / time-travel / incremental-read semantics the stand-ins
  reproduce locally (``sources/snapshots.py`` documents the mapping).  It is
  import-safe here but requires ``spark.sql.catalog.<name>`` Iceberg configs
  at runtime, which this environment lacks — construction is allowed, write
  raises a clear error without the runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class ParquetDirWriter:
    """Hive-partitioned parquet directories, one per sink (the local
    stand-in for a table catalog)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def write(
        self, df: DataFrame, sink: str, partition_cols: tuple[str, ...] = ("tag",)
    ) -> str:
        path = os.path.join(self.out_dir, f"sink={sink}")
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        return path


class IcebergWriter:
    """DataFrameWriterV2 against an Iceberg catalog table — the swap-in for
    real clusters.  ``table`` resolves to ``<catalog>.<namespace>.<sink>``;
    ``createOrReplace`` gives the same replace semantics the parquet writer's
    overwrite has, but as one atomic Iceberg snapshot commit."""

    def __init__(self, catalog: str, namespace: str = "pipeline"):
        self.catalog = catalog
        self.namespace = namespace

    def table_name(self, sink: str) -> str:
        return f"{self.catalog}.{self.namespace}.{sink}"

    def write(
        self, df: DataFrame, sink: str, partition_cols: tuple[str, ...] = ("tag",)
    ) -> str:
        from pyspark.sql import functions as F

        target = self.table_name(sink)
        writer = df.writeTo(target).using("iceberg")
        if partition_cols:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
        writer.createOrReplace()  # raises without the Iceberg runtime configs
        return target
