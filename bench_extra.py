#!/usr/bin/env python
"""Per-query isolation harness (guide §1.4): noop-sink timing + formatted
plans for a chosen subset of queries, without touching the frozen bench.py.

Usage:
  python bench_extra.py [query ...]          # default: the slow set
  SKAR_PLANS_DIR=plans/r06 python bench_extra.py --plans ngram_jaccard ...

Env:
  SPARK_GRAFT_SF_DIR  input tables dir (default /root/testdata/sf1.0)
  SPARK_GRAFT_CPUS    local[] cores (default 32)
  SKAR_BENCH_REPS     timed reps per query (default 2; reports all + min)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SKAR_BENCH_REPS", "2"))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    plans_dir = os.environ.get("SKAR_PLANS_DIR", "plans/r06")

    from skar_spark.session import get_spark
    spark = get_spark(cpus=cpus, app="skar_bench_extra")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    names = args or [
        "decontam", "dedup_clusters", "ngram_jaccard", "dedup_near",
        "line_dedup", "lsh_pairs", "pii_redact", "cosine_topk",
        "ann_ivfpq", "ann_lsh", "embed_dedup", "json_extract", "tpch_q3",
    ]
    # warm-up: parquet reader + codegen paths
    (qs["range_filter"](spark, sf_dir)
     .write.format("noop").mode("overwrite").save())
    (qs["token_count"](spark, sf_dir)
     .write.format("noop").mode("overwrite").save())

    out: dict[str, dict] = {}
    for name in names:
        if dump_plans:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        secs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            (qs[name](spark, sf_dir)
             .write.format("noop").mode("overwrite").save())
            secs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(secs), "reps": secs}
        print(f"  {name}: {min(secs)}s  {secs}", file=sys.stderr)

    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
