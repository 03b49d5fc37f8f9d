"""Hot-tier union — serving the uncommitted in-progress epoch alongside
committed parts (VERDICT r03 item 2; mirror of the reference serving its
in-memory tail next to cold folders, query/data_provider.rs:56-105,
state.rs:82-107).

Contract: default reads see only committed data; `include_hot` unions
the on-disk files lineage has not recorded yet; after the epoch commits,
the same rows are served exactly once with or without the flag.
"""

import os

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from skar_spark.config import EngineConfig
from skar_spark.engine.decode import hot_tail_files, scan
from skar_spark.engine.encode import FOOTER_DDL, encode_documents, lineage_dir
from skar_spark.engine.partfile import write_part_file
from skar_spark.synth import synth_batch, synth_documents

pytestmark = pytest.mark.spark

CFG = EngineConfig(target_partition_rows=500, max_row_group_size=250,
                   salt_threshold_rows=450)
N_COLD = 1_000
N_HOT = 120


@pytest.fixture()
def table(spark, tmp_path):
    out = str(tmp_path / "out")
    docs = synth_documents(spark, N_COLD, partitions=4)
    encode_documents(spark, docs, out, CFG, n_rows=N_COLD)
    # the in-progress epoch: a part file published (atomic rename) but
    # whose lineage append has not run yet
    hot_rows = synth_batch(np.arange(50_000, 50_000 + N_HOT))
    # match the kernel-written arrow schema (tz-aware timestamps)
    hot_rows = hot_rows.set_column(
        hot_rows.column_names.index("warc_ts"), "warc_ts",
        hot_rows["warc_ts"].cast(pa.timestamp("us", "UTC")))
    from skar_spark.engine.partfile import _derive_host
    hot_rows = hot_rows.append_column(
        "_host", _derive_host(hot_rows["url"]))
    hot_path = os.path.join(out, "parts", "part-e9-000000900.skar")
    write_part_file(hot_path, hot_rows, CFG)
    return out, hot_path


def test_default_read_excludes_hot_tail(spark, table):
    out, hot_path = table
    assert scan(spark, out).count() == N_COLD
    assert hot_tail_files(out) == [hot_path]


def test_include_hot_serves_uncommitted_epoch(spark, table):
    out, _ = table
    df = scan(spark, out, include_hot=True)
    assert df.count() == N_COLD + N_HOT
    # exact predicates still apply to hot files (no pruning metadata):
    # pick a host that exists only in the hot rows (ids ≥ 50k) and
    # count it from the source of truth
    cold_urls = {x.url for x in scan(spark, out).select("url").collect()}
    hot_urls = [r.url for r in df.collect() if r.url not in cold_urls]
    host = hot_urls[0].split("://")[1].split("/")[0]
    want = sum(1 for u in hot_urls
               if u.split("://")[1].split("/")[0] == host)
    hot_only = scan(spark, out, host_eq=host, include_hot=True)
    got = [r.url for r in hot_only.select("url").collect()
           if r.url in set(hot_urls)]
    assert len(got) == want > 0


def test_datasource_and_query_handler_hot_option(spark, table):
    from skar_spark.query import run_query
    from skar_spark.sources import register

    out, _ = table
    register(spark)
    cold = spark.read.format("skar").load(out)
    hot = (spark.read.format("skar").option("include_hot", "true")
           .load(out))
    assert cold.count() == N_COLD
    assert hot.count() == N_COLD + N_HOT

    res = run_query(spark, out, {"field_selection": ["url"],
                                 "max_rows": 10_000,
                                 "include_hot": True})
    assert res["num_rows"] == N_COLD + N_HOT


def test_exactly_once_after_epoch_commit(spark, table):
    out, hot_path = table
    # the epoch commits: its lineage row lands
    row = spark.createDataFrame(
        [(900, "e9", "committed", N_HOT, None, None, None, None, None,
          None, None, None, None, None, None, None, None, hot_path,
          float(2_000_000_000), None, None)], FOOTER_DDL)
    row.write.mode("append").parquet(lineage_dir(out))

    n_default = scan(spark, out).count()
    n_hot = scan(spark, out, include_hot=True).count()
    assert n_default == N_COLD + N_HOT   # now committed → visible
    assert n_hot == N_COLD + N_HOT       # and not double-served
    assert hot_tail_files(out) == []


def test_include_hot_refused_on_retained_tables(spark, tmp_path):
    cfg = EngineConfig(target_partition_rows=500, max_row_group_size=250,
                       salt_threshold_rows=450, retain_superseded=True)
    out = str(tmp_path / "ret")
    docs = synth_documents(spark, 600, partitions=2)
    encode_documents(spark, docs, out, cfg, n_rows=600)
    with pytest.raises(ValueError, match="include_hot"):
        scan(spark, out, include_hot=True).count()
