"""spark.read.format("skar") — Python DataSource over encoded output."""

import pytest
from pyspark.sql import functions as F

from skar_spark.config import EngineConfig
from skar_spark.engine.encode import encode_documents
from skar_spark.sources import register
from skar_spark.synth import T0_US, synth_documents

pytestmark = pytest.mark.spark

CFG = EngineConfig(target_partition_rows=1_000, max_row_group_size=500)


@pytest.fixture(scope="module")
def encoded(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds") / "out")
    docs = synth_documents(spark, 4_000, partitions=8)
    encode_documents(spark, docs, out, CFG, n_rows=4_000)
    register(spark)
    return out


def test_full_read(spark, encoded):
    df = spark.read.format("skar").load(encoded)
    assert df.count() == 4_000
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_projection(spark, encoded):
    df = (spark.read.format("skar").option("columns", "url,lang")
          .load(encoded))
    assert df.columns == ["url", "lang"]
    assert df.count() == 4_000


def test_ts_window_pruned_read(spark, encoded):
    lo, hi = T0_US + 500 * 1_000_000, T0_US + 1_500 * 1_000_000
    df = (spark.read.format("skar")
          .option("ts_lo", str(lo)).option("ts_hi", str(hi)).load(encoded))
    exact = df.filter((F.unix_micros("warc_ts") >= lo)
                      & (F.unix_micros("warc_ts") < hi))
    # zone-map reads may over-return, never under-return
    want = 4_000  # upper bound sanity; exact value checked vs full read
    full = spark.read.format("skar").load(encoded).filter(
        (F.unix_micros("warc_ts") >= lo) & (F.unix_micros("warc_ts") < hi))
    assert exact.count() == full.count() > 0
    assert df.count() <= want


def test_content_matches_source(spark, encoded):
    df = spark.read.format("skar").load(encoded).select("url", "text")
    src = synth_documents(spark, 4_000, partitions=8).select("url", "text")
    assert df.exceptAll(src).count() == 0
    assert src.exceptAll(df).count() == 0
