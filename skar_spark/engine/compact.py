"""Compaction — consolidate small part files into full-size ones.

Streaming ingest commits one batch of parts per micro-batch epoch
(streaming.stream_encode), which at scale accumulates the classic
small-files problem: pruning metadata grows per part, scan tasks go
launch-bound, and row groups stay under-filled. `compact_parts` is the
cold-tier consolidation step — the batch analog of the reference's
hot→cold flush building FULL block-range folders out of the in-memory
tail (skar/src/skar_runner.rs:285-353), and of Iceberg's
rewrite_data_files.

Semantics:

- parts whose committed `row_count` is below `small_rows` are decoded
  (vectorized, one task per part), re-partitioned to full-size NEW
  part ids allocated ABOVE the table's high-water index (names keep
  sorting after every existing file), and re-encoded through the same
  codec-auto-selected kernel — blooms, zone maps, and checksums are
  rebuilt per compacted part;
- the lineage table is rewritten in one atomic swap (temp + rename,
  the vacuum discipline) to {untouched latest rows} ∪ {compacted
  rows}, then the superseded small files are deleted;
- the table is marked ARCHIVAL (`meta/compacted`) BEFORE any new file
  is written: the marker flips every reader to lineage-resolved
  membership (no directory-listing fast path), making the whole
  operation crash-safe — at any interruption point lineage still
  describes a consistent table and orphaned files are ignored. Resume,
  late-data rollback, and streaming append refuse the marker,
  because partition membership no longer matches the persisted
  salt-map/plan (a replanned pid could collide with a compacted id and
  silently supersede it). STOP in-flight writers before compacting —
  the marker blocks new writers, not ones already running, and a
  concurrent lineage append between the snapshot read and the swap
  below would be lost.
- snapshot-retaining tables are rejected: pid-level supersede of a
  retained attempt set has no meaningful time-travel semantics.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skar_spark.config import ARCHIVE, DEFAULT, EngineConfig
from skar_spark.engine.encode import (
    FOOTER_DDL,
    _encode_kernel,
    _meta_dir,
    is_retained,
    lineage_dir,
    read_lineage,
    with_host,
)


def _compact_marker(out_dir: str) -> str:
    return os.path.join(_meta_dir(out_dir), "compacted")


def is_compacted(out_dir: str) -> bool:
    from skar_spark.engine import storage
    return storage.exists(_compact_marker(out_dir))


def compaction_high_water(out_dir: str) -> int | None:
    """First part id ABOVE every id a compaction may have allocated, or
    None when the table isn't compacted / the marker predates high-water
    recording. A streaming append that namespaces its new pids at or
    above this value can never collide with (and thus supersede) a
    compacted partition — see streaming.stream_encode."""
    import json

    from skar_spark.engine import storage

    try:
        meta = json.loads(storage.get_bytes(_compact_marker(out_dir)))
        return int(meta["pid_high_water"])
    except FileNotFoundError:
        return None
    except (ValueError, KeyError, TypeError):
        return None  # legacy plain-text marker: high water unknown


def assert_not_compacted(out_dir: str, op: str) -> None:
    if is_compacted(out_dir):
        raise ValueError(
            f"{op} refused: {out_dir} was compacted — partition "
            "membership no longer matches the persisted plan, so "
            "further writes could collide with compacted part ids")


def compact_parts(spark: SparkSession, out_dir: str,
                  cfg: EngineConfig = DEFAULT,
                  small_rows: int | None = None,
                  min_parts: int = 2,
                  profile: EngineConfig | None = None) -> dict:
    """Compact all committed parts smaller than `small_rows` (default:
    cfg.target_partition_rows // 2) into ~target_partition_rows parts.
    Returns {"compacted_parts", "new_parts", "rows"}; no-op (and no
    archival marker) when fewer than `min_parts` parts qualify.

    Compaction IS the hot→cold tiering step (VERDICT r04 item 5): the
    re-encode takes its CODEC knobs (symbol budget, zstd level, fsst
    margins) from `profile` — default ``config.ARCHIVE``, the
    size-optimized cold profile (0.775× the plain+zstd9 golden vs
    DEFAULT's 0.972×) — while layout and partition sizing stay on the
    caller's `cfg`. The consolidated cold set is write-once, so paying
    the deeper symbol table once at compaction is the same trade the
    reference makes flushing its hot tail to Zstd(9) full folders
    (skar_runner.rs:285-353, write_parquet.rs:232-244). Pass
    ``profile=cfg`` to keep the ingest codec unchanged."""
    from skar_spark.engine import storage
    from skar_spark.engine.decode import (
        _file_part_index,
        list_part_files,
        read_part_file,
    )
    from skar_spark.engine.decode_schema import spark_ddl_for
    from skar_spark.engine.partfile import read_footer

    storage.require_posix(out_dir, "compact_parts")
    if is_retained(out_dir):
        raise ValueError("compact_parts does not support "
                         "retain_superseded tables")
    small_rows = small_rows or cfg.target_partition_rows // 2
    lin = read_lineage(spark, out_dir, latest=True)
    if lin is None:
        raise FileNotFoundError(f"no lineage under {out_dir}")
    lin = lin.filter(F.col("status") == "committed").cache()
    cand = lin.filter(F.col("row_count") < small_rows) \
        .select("file", "row_count").collect()
    if len(cand) < min_parts:
        lin.unpersist()
        return {"compacted_parts": 0, "new_parts": 0, "rows": 0}
    files = [r.file for r in cand]
    total_rows = sum(r.row_count for r in cand)
    n_new = max(1, -(-total_rows // cfg.target_partition_rows))
    hw = max((_file_part_index(f) for f in list_part_files(out_dir)),
             default=-1) + 1
    attempt = "compact-" + uuid.uuid4().hex[:8]

    # build the ENTIRE lazy plan — including the lineage union, whose
    # analysis validates schema compatibility — BEFORE the irreversible
    # archival marker below: a table encoded by an older engine version
    # (e.g. lineage without lang_bloom) must fail pre-flight while the
    # table is still writable, not after the marker is durable
    import pyarrow as pa  # noqa: F401  (mapInArrow contract)
    # merged table schema: an evolved table (engine/schema_evo.py) has
    # parts written before a column existed — decode them null-filled so
    # the compacted parts all carry the CURRENT schema (Iceberg rewrite
    # materializes evolution, same here)
    from skar_spark.engine.schema_evo import load_table_schema
    # the footer read doubles as the pre-flight storage probe: it must
    # run (and be allowed to fail) BEFORE the irreversible archival
    # marker even when the merged schema comes from meta/schema.json
    footer = read_footer(files[0])
    ts = load_table_schema(out_dir)
    if ts is None:
        ts = (footer["columns"], footer["schema"])
    tcols, ttypes = ts
    ddl = spark_ddl_for(ttypes, tcols)
    fill = {c: ttypes[c] for c in tcols}
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "path string").repartition(len(files))

    def decode_fn(batches):
        for batch in batches:
            for p in batch.column("path").to_pylist():
                t = read_part_file(p, columns=tcols, fill_missing=fill)
                yield from t.to_batches(max_chunksize=16384)

    df = with_host(paths_df.mapInArrow(decode_fn, schema=ddl))
    planned = df.withColumn(
        "part_id",
        (F.pmod(F.xxhash64("url"), F.lit(n_new)) + F.lit(hw)).cast("int"))

    from dataclasses import replace as _dc_replace
    p = profile if profile is not None else ARCHIVE
    enc_cfg = _dc_replace(
        cfg, fsst_max_symbols=p.fsst_max_symbols, zstd_level=p.zstd_level,
        selector_margin_fsst=p.selector_margin_fsst,
        fsst_sample_bytes=p.fsst_sample_bytes,
        fsst_min_pair_count_frac=p.fsst_min_pair_count_frac)
    new_footers = planned.groupBy("part_id").applyInArrow(
        _encode_kernel(out_dir, enc_cfg, attempt), FOOTER_DDL)

    # one atomic lineage swap: untouched latest rows + compacted rows.
    # allowMissingColumns backfills nulls for footer columns an older
    # lineage lacks (readers presence/null-guard every optional column,
    # e.g. a null lang_bloom just can't prune) — analysis still raises
    # here, pre-marker, on genuinely incompatible column types.
    keep = lin.filter(~F.col("file").isin(files))
    # schema_json is NOT a lineage column (append_lineage_rows strips it
    # after feeding schema evolution — ADVICE r05): the compacted parts
    # re-encode the table's already-merged schema (tcols/ttypes above),
    # so nothing new to merge — drop it so lineage schema stays
    # identical across write paths
    newlin = keep.unionByName(new_footers.drop("schema_json"),
                              allowMissingColumns=True)

    # archival marker BEFORE any new part file exists (part files are
    # written only when `newlin` executes below): from this point every
    # reader resolves membership through lineage (the directory-listing
    # fast path is disabled), so in-progress compacted files and
    # not-yet-deleted small files can never be double-read — including
    # after a mid-compaction crash, where lineage still describes the
    # pre-compaction table exactly and a re-run allocates fresh pids
    # above the orphans. New writers are refused from here on; writers
    # ALREADY in flight are the caller's responsibility (their lineage
    # appends after the swap below would be lost) — stop ingest first.
    os.makedirs(_meta_dir(out_dir), exist_ok=True)
    import json
    with open(_compact_marker(out_dir), "w") as fh:
        # pid_high_water = first id above everything this compaction may
        # allocate — recorded so streaming appends can continue above it
        fh.write(json.dumps({"attempt": attempt,
                             "pid_high_water": hw + n_new}) + "\n")
    path = lineage_dir(out_dir)
    tmp, old = path + ".compact", path + ".precompact"
    shutil.rmtree(tmp, ignore_errors=True)
    # globally sorted by min_warc_ts (range-partitioned files): keeps
    # the lineage seek index tight after compaction
    newlin.sort("min_warc_ts").write.mode("overwrite").parquet(tmp)
    lin.unpersist()
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)

    for f in files:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass

    return {"compacted_parts": len(files), "new_parts": n_new,
            "rows": total_rows}
