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
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang",
                               "host"}
    # derived host column matches the url
    bad = df.filter(~F.col("url").contains(F.col("host"))).count()
    assert bad == 0


def _some_host(spark, encoded):
    df = spark.read.format("skar").load(encoded)
    return df.groupBy("host").count().orderBy("count").first()["host"]


def test_filter_pushdown_host_prunes_partitions(spark, encoded):
    """A plain .filter(col('host') == x) must prune partitions at plan
    time (the automatic constant pushdown of handler.rs:144-158) and
    return exactly the matching rows."""
    h = _some_host(spark, encoded)
    df = spark.read.format("skar").load(encoded)
    full_parts = df.rdd.getNumPartitions()
    filtered = df.filter(F.col("host") == h)
    assert filtered.rdd.getNumPartitions() < full_parts
    want = df.filter(F.col("host") == h).count()
    assert filtered.count() == want > 0
    # exactness end-to-end vs source-of-truth
    src = synth_documents(spark, 4_000, partitions=8)
    src_n = src.filter(
        F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]*).*$", 1)
        == h).count()
    assert filtered.count() == src_n


def test_filter_pushdown_ts_range(spark, encoded):
    lo = T0_US + 500 * 1_000_000
    hi = T0_US + 1_500 * 1_000_000
    df = spark.read.format("skar").load(encoded)
    filtered = df.filter(
        (F.unix_micros("warc_ts") >= lo) & (F.unix_micros("warc_ts") < hi))
    pushed = df.filter(
        (F.col("warc_ts") >= F.timestamp_micros(F.lit(lo)))
        & (F.col("warc_ts") < F.timestamp_micros(F.lit(hi))))
    assert pushed.count() == filtered.count() > 0


def test_filter_pushdown_url_point_lookup(spark, encoded):
    df = spark.read.format("skar").load(encoded)
    url = df.select("url").first()["url"]
    full_parts = df.rdd.getNumPartitions()
    hit = df.filter(F.col("url") == url)
    assert hit.count() == 1
    assert hit.rdd.getNumPartitions() < full_parts


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


def test_filter_pushdown_lang_prunes_partitions(spark, encoded):
    """.filter(col('lang') == rare) is absorbed by pushFilters: planning
    prunes partitions via the lang bloom family and the read task applies
    the equality exactly."""
    df = spark.read.format("skar").load(encoded)
    counts = {r.lang: r["count"] for r in
              df.groupBy("lang").count().collect()}
    rare = min(counts, key=counts.get)
    full_parts = df.rdd.getNumPartitions()
    filtered = df.filter(F.col("lang") == rare)
    assert filtered.rdd.getNumPartitions() < full_parts
    assert filtered.count() == counts[rare] > 0
    assert set(r.lang for r in filtered.select("lang").collect()) == {rare}


def test_paged_read_cursor_resumes_to_completion(spark, encoded):
    """DataSource pagination (the next_block cursor analog): bounded
    pages, resume via cursor, full coverage with no duplicates."""
    from skar_spark.sources import read_paged

    full = spark.read.format("skar").load(encoded)
    total = full.count()
    full_parts = full.rdd.getNumPartitions()
    assert full_parts > 2

    seen = 0
    pages = 0
    cursor = 0
    urls = set()
    while cursor is not None:
        df, cursor = read_paged(spark, encoded, cursor=cursor, page_files=2)
        assert df.rdd.getNumPartitions() <= 2
        rows = df.select("url").collect()
        seen += len(rows)
        urls.update(r.url for r in rows)
        pages += 1
        assert pages < 100
    assert pages >= (full_parts + 1) // 2
    assert seen == total          # no duplicates (set size == row count)
    assert len(urls) == total


def test_stream_read_drains_completed_table(spark, encoded, tmp_path):
    """readStream.format("skar") over a completed batch table drains it
    exactly once (availableNow) and matches the batch read."""
    q = (spark.readStream.format("skar").load(encoded)
         .writeStream.outputMode("append").format("memory")
         .queryName("skar_tail_full")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT url, text FROM skar_tail_full")
    src = spark.read.format("skar").load(encoded).select("url", "text")
    assert got.count() == src.count()
    assert got.exceptAll(src).count() == 0


def test_stream_read_tails_new_commits(spark, tmp_path):
    """The follow-mode pairing: stream_encode appends new epochs, a
    restarted skar readStream (same checkpoint) emits ONLY the newly
    committed part files — no re-reads, no gaps."""
    import numpy as np
    import pyarrow.parquet as pq

    from skar_spark.streaming import stream_encode
    from skar_spark.synth import synth_batch

    register(spark)
    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "tail_out")
    scfg = EngineConfig(max_row_group_size=500)
    pq.write_table(synth_batch(np.arange(0, 1000)), str(landing / "f0.parquet"))
    stream_encode(spark, str(landing), out, scfg,
                  parts_per_batch=4).awaitTermination(120)

    ckpt = str(tmp_path / "tail_ckpt")
    sink = str(tmp_path / "tail_sink")

    def drain():
        # parquet sink: supports restart-from-checkpoint (memory sink
        # does not), so the second drain proves incremental tailing
        q = (spark.readStream.format("skar").load(out)
             .select("url")
             .writeStream.outputMode("append").format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(sink)

    assert drain().count() == 1000

    # new landing data → new epoch with strictly higher part indices
    pq.write_table(synth_batch(np.arange(1000, 1600)),
                   str(landing / "f1.parquet"))
    stream_encode(spark, str(landing), out, scfg,
                  parts_per_batch=4).awaitTermination(120)

    got = drain()
    assert got.count() == 1600             # sink accumulates old + new
    assert got.distinct().count() == 1600  # and nothing was re-read


def test_stream_read_rejects_retained_table(spark, tmp_path):
    from skar_spark.engine.encode import mark_retained
    register(spark)
    out = str(tmp_path / "ret_out")
    docs = synth_documents(spark, 500, partitions=2)
    encode_documents(spark, docs, out, CFG, n_rows=500)
    mark_retained(out)
    with pytest.raises(Exception, match="retain_superseded"):
        (spark.readStream.format("skar").load(out)
         .writeStream.format("memory").queryName("skar_tail_rej")
         .option("checkpointLocation", str(tmp_path / "rej_ckpt"))
         .trigger(availableNow=True).start().awaitTermination(60))
