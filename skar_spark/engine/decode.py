"""The Spark decode/scan path over encoded part files.

Mirror of the reference's query-side read pipeline: folder pruning via the
index (db/mod.rs:217-305) → row-group selection via zone maps + blooms
(data_provider.rs:185-333) → projected parallel column decode
(data_provider.rs:112-119). Here:

- partition pruning happens on the driver against the lineage table
  (min/max warc_ts zone maps + host split-block bloom) — the analog of
  the folder index seek + bloom-based query pruning (handler.rs:144-250);
- row-group pruning + projection happen inside the mapInArrow kernel
  against the part-file footer;
- decode is vectorized (numpy/pyarrow) per column chunk.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from skar_spark.engine.bloom import bloom_might_contain
from skar_spark.engine.decode_schema import spark_ddl_for
from skar_spark.engine.encode import read_lineage
from skar_spark.engine.partfile import read_footer, read_part_file


def list_part_files(out_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(out_dir, "parts", "part-*.skar")))


def prune_partitions(spark: SparkSession, out_dir: str,
                     host_eq: str | None = None,
                     ts_range: tuple[int, int] | None = None) -> list[str]:
    """Driver-side partition pruning via lineage zone maps + host blooms —
    the mirror of prune_query folder skipping (handler.rs:144-158)."""
    files = list_part_files(out_dir)
    lin = read_lineage(spark, out_dir)
    if lin is None or (host_eq is None and ts_range is None):
        return files
    rows = lin.select("file", "min_warc_ts", "max_warc_ts",
                      "host_bloom").collect()
    keep = []
    by_file = {r.file: r for r in rows}
    for f in files:
        r = by_file.get(f)
        if r is None:
            keep.append(f)  # no lineage info → cannot prune
            continue
        if ts_range is not None and r.min_warc_ts is not None:
            lo_us = int(r.min_warc_ts.timestamp() * 1_000_000)
            hi_us = int(r.max_warc_ts.timestamp() * 1_000_000)
            if lo_us >= ts_range[1] or hi_us < ts_range[0]:
                continue
        if host_eq is not None and r.host_bloom is not None:
            if not bloom_might_contain(bytes(r.host_bloom), host_eq):
                continue
        keep.append(f)
    return keep


def scan(spark: SparkSession, out_dir: str,
         columns: list[str] | None = None,
         host_eq: str | None = None,
         ts_range: tuple[int, int] | None = None) -> DataFrame:
    """Distributed decode: one task per part file, Arrow batches out."""
    files = prune_partitions(spark, out_dir, host_eq, ts_range)
    if not files:
        files = []
    # schema from the first footer (fixed schema across partitions)
    all_files = files or list_part_files(out_dir)
    if not all_files:
        raise FileNotFoundError(f"no part files under {out_dir}")
    footer = read_footer(all_files[0])
    cols = columns or footer["columns"]
    ddl = spark_ddl_for(footer["schema"], cols)

    paths_df = spark.createDataFrame(
        [(f,) for f in files] or [], "path string").repartition(
        max(1, len(files)))

    def decode_fn(batches):
        for batch in batches:
            for p in batch.column("path").to_pylist():
                t = read_part_file(p, columns=cols, host_eq=host_eq,
                                   ts_range=ts_range)
                for rb in t.to_batches(max_chunksize=16384):
                    yield rb

    return paths_df.mapInArrow(decode_fn, schema=ddl)
