"""The Spark decode/scan path over encoded part files.

Mirror of the reference's query-side read pipeline: folder pruning via the
index (db/mod.rs:217-305) → row-group selection via zone maps + blooms
(data_provider.rs:185-333) → projected parallel column decode
(data_provider.rs:112-119). Here:

- partition pruning is DISTRIBUTED: zone-map predicates run as DataFrame
  filters over the lineage table and bloom probes run executor-side in a
  vectorized pass; only the surviving file paths (strings) ever reach the
  driver — never the bloom blobs. That is the Spark analog of the
  reference's index SEEK (db/mod.rs:217-305), not an index scan: at 10^6
  partitions the driver holds a file list, not GBs of filters;
- per-disjunct pruning (`prune_selections`) mirrors prune_query
  (handler.rs:187-250): each (hosts, ts_range) selection is tested against
  every partition's zone maps + bloom, dropping partitions no disjunct
  can touch;
- row-group pruning + projection + EXACT predicate apply happen inside
  the mapInArrow kernel against the part-file footer;
- decode is vectorized (numpy/pyarrow) per column chunk.

Storage: all path IO flows through `engine.storage` (the object-store
seam, VERDICT r04 item 2) — POSIX roots pass through to open/glob/
rename; non-POSIX roots route listing, part-file byte IO, and lineage
parquet through the storage primitives (tested end-to-end on the
dir-backed ``mock://`` fake). Every layer above works on opaque path
strings.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skar_spark.engine import storage
from skar_spark.engine.decode_schema import spark_ddl_for
from skar_spark.engine.encode import read_lineage
from skar_spark.engine.partfile import read_footer, read_part_file


def list_part_files(out_dir: str) -> list[str]:
    if storage.is_posix(out_dir):
        return sorted(glob.glob(
            os.path.join(out_dir, "parts", "part-*.skar")))
    # object store: directory = key prefix, listing via the seam
    return [p for p in storage.list_prefix(f"{out_dir}/parts")
            if p.rsplit("/", 1)[1].startswith("part-")
            and p.endswith(".skar")]


def lineage_file_sets_local(out_dir: str
                            ) -> tuple[set[str], set[str]] | None:
    """(committed, all-recorded) file sets from lineage, read locally
    (streamed pyarrow, no Spark job — safe in DataSource planning
    workers). Returns None when the table has no lineage directory at
    all (a brand-new table or a static hand-built dir, where the listing
    IS the membership); a lineage that exists but can't be read raises —
    falling back to the raw listing would expose uncommitted files.
    Heals an interrupted vacuum/compaction lineage swap first."""
    import pyarrow.dataset as pads

    from skar_spark.engine.encode import lineage_dir, recover_lineage_swap

    recover_lineage_swap(out_dir)
    ldir = lineage_dir(out_dir)
    if not storage.dir_exists(ldir):
        return None
    d = pads.dataset(storage.localize_dir(ldir), format="parquet")
    committed: set[str] = set()
    recorded: set[str] = set()
    for b in d.to_batches(columns=["file", "status"]):
        for f, s in zip(b.column("file").to_pylist(),
                        b.column("status").to_pylist()):
            recorded.add(f)
            if s == "committed":
                committed.add(f)
    return committed, recorded


def committed_files_local(out_dir: str) -> set[str] | None:
    sets = lineage_file_sets_local(out_dir)
    return None if sets is None else sets[0]


def hot_tail_files(out_dir: str) -> list[str]:
    """The HOT TAIL: part files on disk with no lineage row at all —
    the in-progress (not yet committed) streaming epoch or batch. The
    mirror of the reference serving its uncommitted in-memory tail
    alongside cold folders (query/data_provider.rs:56-105,
    state.rs:82-107). Only meaningful on plain tables: retained /
    compacted tables delete files, so an unrecorded file there is a
    crash orphan, not fresh data — refused."""
    from skar_spark.engine.compact import is_compacted
    from skar_spark.engine.encode import is_retained

    if is_retained(out_dir) or is_compacted(out_dir):
        raise ValueError(
            f"include_hot refused on {out_dir}: retained/compacted "
            "tables delete files, so unrecorded on-disk files are crash "
            "orphans — the hot tail exists only on plain tables")
    sets = lineage_file_sets_local(out_dir)
    if sets is None:
        return []
    _committed, recorded = sets
    return [f for f in list_part_files(out_dir) if f not in recorded]


def _lineage_keep_expr(host_eq: str | None,
                       ts_range: tuple[int, int] | None):
    """Zone-map survival predicate over lineage columns (JVM-side)."""
    keep = F.lit(True)
    if ts_range is not None:
        lo_us, hi_us = int(ts_range[0]), int(ts_range[1])
        keep = keep & (
            F.col("min_warc_ts").isNull()
            | ~((F.unix_micros(F.col("min_warc_ts")) >= F.lit(hi_us))
                | (F.unix_micros(F.col("max_warc_ts")) < F.lit(lo_us))))
    return keep


def _bloom_probe_udf(hosts: list[str]):
    """Vectorized executor-side bloom probe: True if ANY host in `hosts`
    might be in the partition's bloom (null bloom → can't prune)."""
    import pandas as pd

    from skar_spark.engine.bloom import bloom_might_contain

    def might(blobs):
        # one probe per PARTITION (metadata row), not per data row
        return pd.Series([
            b is None or any(bloom_might_contain(bytes(b), h)
                             for h in hosts)
            for b in blobs])

    # annotate at runtime (the module-level `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf rejects)
    might.__annotations__ = {"blobs": pd.Series, "return": pd.Series}
    return F.pandas_udf(might, "boolean")


def prune_partitions(spark: SparkSession, out_dir: str,
                     host_eq: str | None = None,
                     ts_range: tuple[int, int] | None = None,
                     lang_eq: str | None = None,
                     as_of: float | None = None,
                     include_hot: bool = False,
                     col_range: tuple[str, float, float] | None = None
                     ) -> list[str]:
    """Distributed partition pruning via lineage zone maps + the host and
    lang bloom families — the mirror of the folder index seek
    (db/mod.rs:217-305) + prune_query folder skipping (handler.rs:144-158).
    Bloom blobs are probed executor-side; the driver only ever sees
    surviving path strings.

    `as_of` selects the snapshot view (latest attempt committed at or
    before that unix time per partition — Iceberg time travel on tables
    encoded with ``retain_superseded``). On a snapshot-retaining table
    the surviving set always comes from lineage: superseded attempt
    files still on disk are never returned.

    `include_hot` additionally serves the HOT TAIL — part files whose
    lineage row has not committed yet (the in-progress streaming epoch)
    — alongside the committed cold set, the reference's hot-tier union
    (data_provider.rs:56-105). Hot files carry no pruning metadata, so
    they always survive pruning; exact predicates still apply inside
    the read kernel. Plain tables only."""
    from skar_spark.engine.compact import is_compacted
    from skar_spark.engine.encode import is_retained

    files = list_part_files(out_dir)
    hot = set(hot_tail_files(out_dir)) if include_hot else set()
    no_filters = (host_eq is None and ts_range is None
                  and lang_eq is None and col_range is None)
    # fast path: plain full scans resolve membership from the COMMITTED
    # lineage set read locally (no Spark job) — the same set the stream
    # reader tails. The raw listing alone would over-approximate by
    # uncommitted parts (a crashed batch/epoch), making rows appear on a
    # full scan that vanish once a predicate triggers lineage-resolved
    # pruning. Lineage-less directories (static/hand-built) keep
    # listing-only membership; retained/compacted tables (file deletion
    # possible) always take the full lineage path below.
    if no_filters and as_of is None and not is_retained(out_dir) \
            and not is_compacted(out_dir):
        committed = committed_files_local(out_dir)
        if committed is None:
            return files
        return [f for f in files if f in committed or f in hot]
    lin = read_lineage(spark, out_dir, latest=True, as_of=as_of)
    if lin is None:
        # a table where files may have been deleted (snapshot retention
        # / compaction) MUST resolve membership through lineage — an
        # unreadable lineage there (e.g. a vacuum swap in flight) would
        # otherwise over-approximate to every attempt of every
        # partition. Fail loudly instead of duplicating rows.
        if is_retained(out_dir) or is_compacted(out_dir):
            raise FileNotFoundError(
                f"lineage unreadable under {out_dir} but the table is "
                "retained/compacted — membership requires lineage")
        return files
    sel = lin.filter(_lineage_keep_expr(host_eq, ts_range))
    if host_eq is not None:
        sel = sel.filter(_bloom_probe_udf([host_eq])(F.col("host_bloom")))
    if lang_eq is not None and "lang_bloom" in lin.columns:
        sel = sel.filter(_bloom_probe_udf([lang_eq])(F.col("lang_bloom")))
    if col_range is not None and "col_stats" in lin.columns:
        # numeric zone maps for non-layout (evolved) columns: keep a
        # partition when its [min,max] overlaps [lo,hi) — or when it
        # has NO stats for the column (pre-evolution rows / hand-built
        # lineage: null-filled values can't match, but the safe default
        # is to let the caller's exact filter decide)
        c, lo, hi = col_range
        mn = F.get_json_object("col_stats", f"$.{c}[0]").cast("double")
        mx = F.get_json_object("col_stats", f"$.{c}[1]").cast("double")
        sel = sel.filter(mn.isNull()
                         | ((mx >= F.lit(float(lo))) & (mn < F.lit(float(hi)))))
    survived = {r.file for r in sel.select("file").collect()}
    # lineage is the SOURCE OF TRUTH for table membership: a part file
    # with no row in the selected view is either superseded (snapshot
    # retention), outside the as_of snapshot, not yet committed (its
    # writer re-encodes it on resume — atomic rename makes the eventual
    # commit idempotent), or orphaned by a crash between a vacuum/
    # compaction lineage swap and its file deletes. All four must not
    # be read; readers only ever see committed data exactly once.
    # (`include_hot` deliberately re-admits the not-yet-committed class
    # on plain tables — unprunable, exact-filtered in the kernel.)
    return [f for f in files if f in survived or f in hot]


def _iter_lineage_rowgroups(ldir: str, cols: list[str],
                            ts_range: tuple[int, int] | None,
                            seek_stats: dict | None = None):
    """Row-group-seeking lineage reader — the single-node analog of the
    reference's keyed mdbx range cursor (db/mod.rs:217-305). Lineage is
    written sorted by ``min_warc_ts`` (per batch/epoch file, globally
    after vacuum/compaction), so each parquet row group's statistics
    bound the partitions it describes; a ts-filtered planning pass reads
    only the row groups that could contain surviving partitions instead
    of streaming the whole lineage table. At 10^6 partitions this turns
    per-query planning from O(#partitions) into O(matching row groups).

    Skip rule (safe over-approximation of the per-row zone-map test): a
    row group is skipped only when EVERY row fails the ts test —
    min-of-min_warc_ts ≥ hi (each partition starts at/after the range
    end) or max-of-max_warc_ts < lo (each ends before the range start).
    Row groups with null stats or null ts rows are always read. Columns
    missing in older lineage files (schema evolution) are null-filled.

    `seek_stats`, when given, is filled with {"rg_total", "rg_read"}
    counters (test/observability hook)."""
    import glob as _glob

    import pyarrow.parquet as pq

    def _us(v):
        # parquet timestamp stats arrive as datetime (tz-aware or not)
        if hasattr(v, "timestamp"):
            import datetime as _dt
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            return v.timestamp() * 1e6
        return float(v)

    lo_q, hi_q = (ts_range if ts_range is not None else (None, None))
    for fp in sorted(_glob.glob(os.path.join(ldir, "*.parquet"))):
        pf = pq.ParquetFile(fp)
        md = pf.metadata
        names = [md.row_group(0).column(j).path_in_schema
                 for j in range(md.num_columns)] if md.num_row_groups \
            else []
        have = [c for c in cols if c in names]
        ci_lo = names.index("min_warc_ts") if "min_warc_ts" in names \
            else None
        ci_hi = names.index("max_warc_ts") if "max_warc_ts" in names \
            else None
        for rg in range(md.num_row_groups):
            if seek_stats is not None:
                seek_stats["rg_total"] = seek_stats.get("rg_total", 0) + 1
            if ts_range is not None and ci_lo is not None \
                    and ci_hi is not None:
                s_lo = md.row_group(rg).column(ci_lo).statistics
                s_hi = md.row_group(rg).column(ci_hi).statistics
                if (s_lo is not None and s_hi is not None
                        and s_lo.has_min_max and s_hi.has_min_max
                        and not s_lo.null_count and not s_hi.null_count
                        and (_us(s_lo.min) >= hi_q
                             or _us(s_hi.max) < lo_q)):
                    continue  # no partition in this row group survives
            if seek_stats is not None:
                seek_stats["rg_read"] = seek_stats.get("rg_read", 0) + 1
            t = pf.read_row_group(rg, columns=have)
            for c in cols:  # null-backfill columns older files lack
                if c not in t.column_names:
                    t = t.append_column(
                        c, pa.nulls(t.num_rows, pa.binary()
                                    if c.endswith("bloom")
                                    else pa.string()))
            yield from t.select(cols).to_batches()


def prune_partitions_local(out_dir: str,
                           host_eq: str | None = None,
                           ts_range: tuple[int, int] | None = None,
                           any_hosts: list[str] | None = None,
                           lang_eq: str | None = None,
                           as_of: float | None = None,
                           include_hot: bool = False,
                           seek_stats: dict | None = None
                           ) -> list[str]:
    """Single-process partition pruning for contexts that cannot launch a
    Spark job (the Python DataSource planning worker). The analog of the
    reference's single-node index seek (db/mod.rs:217-305): STREAMS the
    lineage parquet batch-by-batch (projection: metadata columns + bloom),
    evaluates zone maps vectorized and blooms per surviving row, and
    retains only {partition_id → (committed_at, file, keep)} — never all
    bloom blobs at once, so memory stays O(#partitions) strings even at
    10^6 partitions.

    `any_hosts` prunes to partitions whose bloom might contain ANY of the
    given hosts (used for url-equality and host-IN pruning).
    """
    import numpy as np
    import pyarrow.dataset as pads

    from skar_spark.engine.bloom import bloom_might_contain
    from skar_spark.engine.compact import is_compacted
    from skar_spark.engine.encode import is_retained, lineage_dir

    files = list_part_files(out_dir)
    hot = set(hot_tail_files(out_dir)) if include_hot else set()
    probes = list(any_hosts or [])
    if host_eq is not None:
        probes = [host_eq]
    if (not probes and ts_range is None and lang_eq is None
            and as_of is None and not is_retained(out_dir)
            and not is_compacted(out_dir)):
        # same committed-membership fast path as prune_partitions: the
        # raw listing may contain parts whose lineage append never
        # committed — those must stay invisible on a full scan too
        # (unless the caller asked for the hot tail)
        committed = committed_files_local(out_dir)
        if committed is None:
            return files
        return [f for f in files if f in committed or f in hot]
    def _no_lineage():
        # same policy as prune_partitions: a retained/compacted table
        # without readable lineage must fail, not over-approximate
        if is_retained(out_dir) or is_compacted(out_dir):
            raise FileNotFoundError(
                f"lineage unreadable under {out_dir} but the table is "
                "retained/compacted — membership requires lineage")
        return files

    from skar_spark.engine.encode import recover_lineage_swap
    recover_lineage_swap(out_dir)  # heal an interrupted vacuum/compact
    try:
        d = pads.dataset(storage.localize_dir(lineage_dir(out_dir)),
                         format="parquet")
    except Exception:
        return _no_lineage()
    cols = ["partition_id", "file", "min_warc_ts", "max_warc_ts",
            "host_bloom"]
    names = set(d.schema.names)
    has_commit = "committed_at" in names
    if has_commit:
        cols.append("committed_at")
    has_lang_bloom = lang_eq is not None and "lang_bloom" in names
    if has_lang_bloom:
        cols.append("lang_bloom")
    if not {"file", "min_warc_ts", "max_warc_ts"} <= names:
        return _no_lineage()
    # ts-filtered planning on a plain live table SEEKS via the sorted
    # lineage's row-group stats instead of streaming every row (safe
    # over-approximation: a skipped row group contains only rows the
    # per-row zone-map test below would reject). Retained/as_of reads
    # need every attempt row for snapshot bookkeeping → full stream.
    #
    # INVARIANT the seek path depends on (ADVICE r04): on a
    # non-retained table every attempt for a pid writes the SAME
    # canonical file name (`part-{pid:06d}.skar`, _kernel_name_fmt), so
    # when the true-latest attempt row sits in a skipped row group but
    # an older attempt row survives, `latest` resolving from the
    # superseded row re-admits a file name identical to the latest
    # attempt's — an exact-filtered over-read, never a double-read.
    # If per-attempt file naming is ever extended to non-retained
    # tables, this branch must exclude pids whose resolved row is not
    # the true latest (or fall back to the full stream).
    if ts_range is not None and as_of is None \
            and not is_retained(out_dir):
        batches = _iter_lineage_rowgroups(
            storage.localize_dir(lineage_dir(out_dir)), cols, ts_range,
            seek_stats)
    else:
        batches = d.to_batches(columns=cols)
    latest: dict[int, tuple[float, str, bool]] = {}
    for batch in batches:
        n = batch.num_rows
        if n == 0:
            continue
        keep = np.ones(n, dtype=bool)
        if ts_range is not None:
            # normalize to microseconds regardless of the stored unit
            lo = batch.column("min_warc_ts").cast(pa.timestamp("us")).cast(
                pa.int64()).to_numpy(zero_copy_only=False).astype("float64")
            hi = batch.column("max_warc_ts").cast(pa.timestamp("us")).cast(
                pa.int64()).to_numpy(zero_copy_only=False).astype("float64")
            known = ~np.isnan(lo)
            keep &= ~known | ~((lo >= ts_range[1]) | (hi < ts_range[0]))
        pids = batch.column("partition_id").to_pylist()
        fnames = batch.column("file").to_pylist()
        commits = (batch.column("committed_at").to_pylist()
                   if has_commit else [None] * n)
        blooms = batch.column("host_bloom") if probes else None
        lblooms = batch.column("lang_bloom") if has_lang_bloom else None
        for i in range(n):  # per PARTITION metadata row, not per data row
            ts = commits[i] if commits[i] is not None else float("-inf")
            if as_of is not None and ts > as_of:
                continue  # attempt is outside the requested snapshot
            k = bool(keep[i])
            if k and probes:
                b = blooms[i].as_py()
                k = b is None or any(bloom_might_contain(bytes(b), h)
                                     for h in probes)
            if k and has_lang_bloom:
                b = lblooms[i].as_py()
                k = b is None or bloom_might_contain(bytes(b), lang_eq)
            prev = latest.get(pids[i])
            if prev is None or ts >= prev[0]:
                latest[pids[i]] = (ts, fnames[i], k)
    survived = {f for (_ts, f, k) in latest.values() if k}
    # lineage is the source of truth for membership (see
    # prune_partitions): superseded, out-of-snapshot, uncommitted, and
    # crash-orphaned files are all excluded — include_hot re-admits the
    # uncommitted class on plain tables (unprunable, exact-filtered)
    return [f for f in files if f in survived or f in hot]


def prune_selections(spark: SparkSession, out_dir: str,
                     selections: list[dict]) -> dict[str, list[int]]:
    """Per-disjunct pruning — the prune_query analog (handler.rs:187-250).

    `selections` is a list of disjuncts, each `{"hosts": [...] | None,
    "langs": [...] | None, "ts_range": (lo_us, hi_us) | None}`
    (conjunctive within a disjunct, OR across; langs prune via the
    second bloom family). Returns {file: [surviving disjunct indices]}
    containing
    only files at least one disjunct can touch. Evaluation is one
    distributed pass over the lineage table: zone maps as JVM-side
    expressions, blooms probed executor-side, per selection.
    """
    if not selections:
        # no disjuncts → nothing can match any file (the OR of an empty
        # set is false); mirror the natural SQL semantics instead of
        # building an unparsable filter("")
        return {}
    files = set(list_part_files(out_dir))
    lin = read_lineage(spark, out_dir, latest=True)
    if lin is None:
        return {f: list(range(len(selections))) for f in sorted(files)}
    has_lbloom = "lang_bloom" in lin.columns
    cols = ["file", "min_warc_ts", "max_warc_ts", "host_bloom"] + \
        (["lang_bloom"] if has_lbloom else [])
    sel_df = lin.select(*cols)
    for i, s in enumerate(selections):
        hosts = s.get("hosts")
        langs = s.get("langs")
        keep = _lineage_keep_expr(None, s.get("ts_range"))
        if hosts:
            keep = keep & _bloom_probe_udf(list(hosts))(F.col("host_bloom"))
        if langs and has_lbloom:
            # second bloom family: a partition survives this disjunct
            # only if ANY requested lang might be present
            keep = keep & _bloom_probe_udf(list(langs))(F.col("lang_bloom"))
        sel_df = sel_df.withColumn(f"_k{i}", keep)
    rows = sel_df.filter(
        " or ".join(f"_k{i}" for i in range(len(selections)))
    ).select("file", *[f"_k{i}" for i in range(len(selections))]).collect()
    out = {}
    for r in rows:
        if r.file in files:
            out[r.file] = [i for i in range(len(selections)) if r[f"_k{i}"]]
    # lineage is the source of truth for membership (see
    # prune_partitions): files without a latest-view lineage row are
    # superseded, uncommitted, or crash-orphaned — never read
    return out


def scan(spark: SparkSession, out_dir: str,
         columns: list[str] | None = None,
         host_eq: str | None = None,
         ts_range: tuple[int, int] | None = None,
         lang_eq: str | None = None,
         as_of: float | None = None,
         include_hot: bool = False,
         part_ids: set[int] | None = None,
         col_range: tuple[str, float, float] | None = None) -> DataFrame:
    """Distributed decode: one task per part file, Arrow batches out.

    Predicates are EXACT: partitions and row groups that can't match are
    pruned via zone maps + blooms (host and lang families), and surviving
    row groups are post-filtered inside the kernel (read_part_file
    exact=True), so the returned DataFrame contains precisely the
    matching rows.

    `as_of` (unix seconds) time-travels to the snapshot committed at or
    before that instant — meaningful on tables encoded with
    ``EngineConfig.retain_superseded=True`` (superseded attempt files are
    kept until ``vacuum``); before the first commit the scan is empty.

    ``include_hot=True`` unions the hot tail (uncommitted in-progress
    epoch) with the committed cold set — see prune_partitions.

    ``part_ids`` restricts the scan to those partition ids (after the
    predicate pruning above) — the partition-targeted read used by
    merge_updates/delete_rows to decode only the partitions they will
    rewrite."""
    files = prune_partitions(spark, out_dir, host_eq, ts_range, lang_eq,
                             as_of=as_of, include_hot=include_hot,
                             col_range=col_range)
    if part_ids is not None:
        files = [f for f in files if _file_part_index(f) in part_ids]
    # merged table schema (meta/schema.json — one driver-side GET, kept
    # current at every lineage commit; Iceberg add-column semantics).
    # Pre-evolution tables fall back to the first footer (fixed schema).
    from skar_spark.engine.schema_evo import load_table_schema
    tschema = load_table_schema(out_dir)
    if tschema is None:
        all_files = files or list_part_files(out_dir)
        if not all_files:
            raise FileNotFoundError(f"no part files under {out_dir}")
        footer = read_footer(all_files[0])
        tschema = (footer["columns"], footer["schema"])
    tcols, ttypes = tschema
    cols = columns or tcols
    ddl = spark_ddl_for(ttypes, cols)
    # parts written before a column existed null-fill it kernel-side
    fill = {c: ttypes[c] for c in cols}

    paths_df = spark.createDataFrame(
        [(f,) for f in files] or [], "path string").repartition(
        max(1, len(files)))

    def decode_fn(batches):
        for batch in batches:
            for p in batch.column("path").to_pylist():
                t = read_part_file(p, columns=cols, host_eq=host_eq,
                                   ts_range=ts_range, lang_eq=lang_eq,
                                   fill_missing=fill, col_range=col_range)
                for rb in t.to_batches(max_chunksize=16384):
                    yield rb

    return paths_df.mapInArrow(decode_fn, schema=ddl)


def validate_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Post-write validation re-read — the mirror of the reference's
    validate_parquet pass before publish (validate_parquet.rs:17-66,
    invoked at skar_runner.rs:309-312).

    Re-reads every committed part file executor-side, recomputes the
    (url, text) content checksum, and compares it to the lineage's stored
    `text_checksum`. Returns one row per part:
    (partition_id, file, ok, error). A corrupt / truncated / missing file
    yields ok=false with the exception text instead of crashing the job.
    """
    lin = read_lineage(spark, out_dir, latest=True)
    if lin is None:
        raise FileNotFoundError(f"no lineage under {out_dir}")
    meta = (lin.filter(F.col("status") == "committed")
            .select("partition_id", "file", "text_checksum"))

    def check_fn(batches):
        from skar_spark.engine.partfile import partition_checksum
        for batch in batches:
            pids = batch.column("partition_id").to_pylist()
            paths = batch.column("file").to_pylist()
            sums = batch.column("text_checksum").to_pylist()
            for pid, p, want in zip(pids, paths, sums):
                try:
                    t = read_part_file(p, columns=["url", "text"])
                    got = partition_checksum(t)
                    ok = (want is not None and bytes(want) == got)
                    err = None if ok else "checksum mismatch"
                except Exception as e:  # corrupt/missing file
                    ok, err = False, f"{type(e).__name__}: {e}"
                yield pa.record_batch({
                    "partition_id": pa.array([pid], pa.int32()),
                    "file": pa.array([p], pa.string()),
                    "ok": pa.array([ok], pa.bool_()),
                    "error": pa.array([err], pa.string()),
                })

    n = max(1, meta.count())
    return (meta.repartition(min(n, 256))
            .mapInArrow(check_fn,
                        "partition_id int, file string, ok boolean, "
                        "error string"))


def scan_changes(spark: SparkSession, out_dir: str,
                 since: float | None = None,
                 until: float | None = None,
                 columns: list[str] | None = None,
                 host_eq: str | None = None,
                 ts_range: tuple[int, int] | None = None,
                 lang_eq: str | None = None,
                 _stats: dict | None = None) -> DataFrame:
    """Change data feed: the rows of every partition whose latest
    attempt as of `until` committed in (since, until] — the
    incremental-read primitive (Delta CDF / Iceberg incremental-scan
    analog) that lets a downstream pipeline pay for the INCREMENT, not
    the table: changed partitions are resolved from lineage alone, so
    no unchanged part file is ever opened (at 10^12 docs, re-scanning
    history per downstream run is the difference between minutes and
    days).

    Contract: on append-only history (encode_documents +
    append_documents / streaming epochs) each window returns exactly
    the appended rows. A partition RE-STATED inside the window —
    late-data rollback, compaction, merge/delete copy-on-write —
    re-emits its full new content (no row-level diff tracking; same as
    Delta CDF without deletion vectors), so consumers must treat a
    re-encoded partition as a replace, not a delta. Predicates compose
    with the normal exact pruning inside the changed set."""
    lin = read_lineage(spark, out_dir, latest=True, as_of=until)
    if lin is None:
        raise FileNotFoundError(f"no lineage under {out_dir}; the "
                                "change feed requires a committed table")
    sel = lin.filter(F.col("status") == "committed")
    if since is not None:
        sel = sel.filter(F.col("committed_at") > float(since))
    pids = {int(r.partition_id) for r in
            sel.select("partition_id").collect()}  # metadata-scale
    if _stats is not None:
        _stats["n_changed_parts"] = len(pids)
    return scan(spark, out_dir, columns=columns, host_eq=host_eq,
                ts_range=ts_range, lang_eq=lang_eq, as_of=until,
                part_ids=pids)


def scan_paged(spark: SparkSession, out_dir: str,
               columns: list[str] | None = None,
               host_eq: str | None = None,
               ts_range: tuple[int, int] | None = None,
               lang_eq: str | None = None,
               cursor: int = 0,
               time_limit_ms: int | None = 5_000,
               page_files: int = 64):
    """Time-limited, cursor-resumable scan — the mirror of the
    reference's query loop: process folders in block order until the
    wall-clock budget is spent, then return partial results plus a
    `next_block` cursor (query/handler.rs:104-129, config.rs:22-29).

    Partitions are processed in file order starting at `cursor`
    (a partition index), `page_files` per distributed page. Returns
    (rows, next_cursor): `next_cursor` is None when the scan completed,
    otherwise pass it back to continue. Rows are collected per page —
    callers wanting a full-table DataFrame should use scan() instead;
    this API exists for interactive, bounded-latency reads.
    """
    files = prune_partitions(spark, out_dir, host_eq, ts_range, lang_eq)
    # cursor order must follow the numeric part index, not lexicographic
    # file order: streaming names (part-e{epoch}-{pid}) sort e10 < e2
    # textually while pids grow with epoch, which would make a resumed
    # cursor re-read returned partitions and skip unprocessed ones
    files = sorted((f for f in files if _file_part_index(f) >= cursor),
                   key=_file_part_index)
    if not files:
        return [], None
    from skar_spark.engine.schema_evo import load_table_schema
    ts = load_table_schema(out_dir)
    if ts is None:
        footer = read_footer(files[0])
        ts = (footer["columns"], footer["schema"])
    cols = columns or ts[0]
    ddl = spark_ddl_for(ts[1], cols)
    return paged_decode_loop(
        spark, files, cols, ddl, host_eq=host_eq, ts_range=ts_range,
        lang_eq=lang_eq, time_limit_ms=time_limit_ms,
        page_files=page_files, fill={c: ts[1][c] for c in cols})


def paged_decode_loop(spark: SparkSession, files: list[str],
                      stored_cols: list[str], ddl: str, *,
                      host_eq: str | None = None,
                      ts_range: tuple[int, int] | None = None,
                      lang_eq: str | None = None,
                      time_limit_ms: int | None = None,
                      page_files: int = 64,
                      row_limit: int | None = None,
                      post=None,
                      fill: dict[str, str] | None = None
                      ) -> tuple[list, int | None]:
    """THE page/cursor/budget loop — shared by scan_paged and the JSON
    query handler so the folder-granular truncation semantics exist in
    exactly one place. Decodes `files` (already pruned + part-index
    sorted) page by page, optionally pipes each page's DataFrame
    through `post` (filter/projection) before collecting, and stops
    when the wall-clock budget or row bound is reached — always at a
    page boundary, so the returned next_cursor never skips or re-reads
    rows. Returns (rows, next_cursor)."""
    import time as _time

    t0 = _time.time()
    rows: list = []
    pos = 0
    while pos < len(files):
        page = files[pos:pos + page_files]
        paths_df = spark.createDataFrame(
            [(f,) for f in page], "path string").repartition(len(page))

        def decode_fn(batches):
            for batch in batches:
                for p in batch.column("path").to_pylist():
                    t = read_part_file(p, columns=stored_cols,
                                       host_eq=host_eq, ts_range=ts_range,
                                       lang_eq=lang_eq, fill_missing=fill)
                    for rb in t.to_batches(max_chunksize=16384):
                        yield rb

        df = paths_df.mapInArrow(decode_fn, schema=ddl)
        if post is not None:
            df = post(df)
        rows.extend(df.collect())
        pos += len(page)
        if row_limit is not None and len(rows) >= row_limit:
            break
        if time_limit_ms is not None and \
                (_time.time() - t0) * 1000 >= time_limit_ms:
            break
    if pos >= len(files):
        return rows, None
    return rows, _file_part_index(files[pos])


def _file_part_index(path: str) -> int:
    """Order/cursor key of a part file: the trailing integer in its name
    (covers both batch `part-000007.skar` and streaming
    `part-e3-000000007.skar` namespaces)."""
    import re
    m = re.search(r"(\d+)\.skar$", os.path.basename(path))
    return int(m.group(1)) if m else 0
