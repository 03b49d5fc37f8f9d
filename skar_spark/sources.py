"""`spark.read.format("skar")` — Python DataSource over encoded part files.

PySpark 4's Python Data Source API wraps the engine's decode path as a
first-class reader, so the encoded output is queryable like any other
format:

    from skar_spark.sources import register
    register(spark)
    df = spark.read.format("skar").load(out_dir)
    df = (spark.read.format("skar")
          .option("columns", "url,lang")          # projection
          .option("host_eq", "www.example.com")   # bloom + zone pruning
          .option("ts_lo", "1704067200000000")    # [lo, hi) epoch-us
          .option("ts_hi", "1704153600000000")
          .load(out_dir))

One input partition per part file; partition pruning (lineage zone maps
+ host blooms) happens at planning time on the driver — the mirror of
the reference's folder-index seek (skar/src/db/mod.rs:217-305); row-group
pruning happens inside each task against the part-file footer.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SkarPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SkarDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "skar"

    def _cols(self):
        cols = self.options.get("columns")
        return [c.strip() for c in cols.split(",")] if cols else None

    def schema(self) -> str:
        from skar_spark.engine.decode import list_part_files
        from skar_spark.engine.decode_schema import spark_ddl_for
        from skar_spark.engine.partfile import read_footer

        files = list_part_files(self.options["path"])
        if not files:
            raise FileNotFoundError(
                f"no part files under {self.options['path']}")
        footer = read_footer(files[0])
        return spark_ddl_for(footer["schema"],
                             self._cols() or footer["columns"])

    def reader(self, schema) -> "SkarReader":
        return SkarReader(self.options, self._cols())


class SkarReader(DataSourceReader):
    def __init__(self, options, cols):
        self.path = options["path"]
        self.cols = cols
        self.host_eq = options.get("host_eq")
        lo, hi = options.get("ts_lo"), options.get("ts_hi")
        self.ts_range = (int(lo), int(hi)) if lo and hi else None
        # plan-time partition pruning via the lineage index (driver side)
        from skar_spark.engine.decode import prune_partitions
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        if spark is not None and (self.host_eq or self.ts_range):
            self.files = prune_partitions(spark, self.path,
                                          host_eq=self.host_eq,
                                          ts_range=self.ts_range)
        else:
            from skar_spark.engine.decode import list_part_files
            self.files = list_part_files(self.path)

    def partitions(self):
        return [SkarPartition(f) for f in self.files]

    def read(self, partition: SkarPartition):
        from skar_spark.engine.partfile import read_part_file

        t = read_part_file(partition.path, columns=self.cols,
                           host_eq=self.host_eq, ts_range=self.ts_range)
        yield from t.to_batches(max_chunksize=16384)


def register(spark) -> None:
    spark.dataSource.register(SkarDataSource)
