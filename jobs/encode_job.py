#!/usr/bin/env python
"""Standalone encode job — the spark-submit entry point.

Cluster launch (the north-rule deployment shape):
    zip -r skar_spark.zip skar_spark
    spark-submit --py-files skar_spark.zip jobs/encode_job.py \
        --input <parquet dir or 'synth:N'> --out <dir> [--resume]

Local sandbox launch (same code path, local[] master picked up from
--cpus): python jobs/encode_job.py --input synth:100000 --out /tmp/enc

Prints one JSON line with throughput + size stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow `python jobs/encode_job.py` without PYTHONPATH (spark-submit ships
# the package via --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet dir with (url,warc_ts,html,text,lang) "
                         "or synth:N for the deterministic generator")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--master", default=None,
                    help="spark:// URL for a standalone cluster "
                         "(default: local[cpus]); --cpus then = total "
                         "executor cores for shuffle sizing")
    ap.add_argument("--partitions", type=int, default=None,
                    help="number of output partitions (default: rows/target)")
    ap.add_argument("--target-partition-rows", type=int, default=20_000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--batch-partitions", type=int, default=None,
                    help="checkpoint granularity; default = all partitions "
                         "in one batch (finest resume = smaller values)")
    # None → follow EngineConfig's defaults (the shipping operating
    # point), so benchmark jobs always measure the deployed knobs
    ap.add_argument("--zstd-level", type=int, default=None)
    ap.add_argument("--fsst-symbols", type=int, default=None)
    ap.add_argument("--scheme", choices=["hash", "day_hash"], default="hash",
                    help="partition layout: flat host-hash, or "
                         "day(warc_ts) x bucket(host) for time pruning")
    ap.add_argument("--warmup", action="store_true",
                    help="run a small untimed encode first (JIT + Python "
                         "daemon + Arrow-path warm-up) so the timed run "
                         "measures steady-state throughput")
    ap.add_argument("--repeats", type=int, default=1,
                    help="run the timed encode N times (fresh output dir "
                         "each) and report the best — steady-state "
                         "measurement; JIT keeps warming for ~2 runs")
    args = ap.parse_args()

    from skar_spark.config import EngineConfig
    from skar_spark.engine.encode import encode_documents
    from skar_spark.session import get_spark
    from skar_spark.synth import synth_documents

    spark = get_spark(cpus=args.cpus, app="skar_encode_job",
                      master=args.master)
    overrides = {k: v for k, v in (
        ("zstd_level", args.zstd_level),
        ("fsst_max_symbols", args.fsst_symbols)) if v is not None}
    cfg = EngineConfig(
        target_partition_rows=args.target_partition_rows,
        salt_threshold_rows=args.target_partition_rows,
        batch_partitions=args.batch_partitions or (args.partitions or 1 << 30),
        **overrides,
    )

    if args.input.startswith("synth:"):
        n_rows = int(args.input.split(":", 1)[1])
        docs = synth_documents(spark, n_rows, partitions=args.cpus * 2)
        docs.cache().count()  # exclude generation from the timed encode
    else:
        docs = spark.read.parquet(args.input)
        n_rows = docs.count()  # parquet metadata count; also forces
        # executor registration so startup isn't in the timed section

    if args.warmup:
        # untimed warm-up through the full encode path: JVM JIT, Python
        # worker daemons, Arrow IPC buffers, codec imports. The sample is
        # sized for constant work PER CORE (~10k rows/core), not a fixed
        # fraction of the input: with a fixed fraction a 4N-executor run
        # gives each JVM 1/4 the warm-up of the N run, so its timed
        # repeats start colder and the N→4N efficiency ratio is biased
        # LOW (measured: 4N best-of-3 still improving at rep 3, 67→74→55
        # s, while N plateaued by rep 2 — per-JVM JIT warm-in tracks the
        # work that JVM has executed, not the repeat count).
        import shutil as _sh
        from pyspark.sql import functions as F
        wdir = args.out + ".warmup"
        _sh.rmtree(wdir, ignore_errors=True)
        # 30k rows/core (r4: the kernel got ~1.5× faster, so the same
        # warm ROW count buys less JIT warm-in time — the 4N leg was
        # still improving at rep 4, 79→55→48→43 s, biasing efficiency
        # low; more per-core warm work restores equal starting warmth)
        mod = max(2, n_rows // (30_000 * args.cpus))
        sample = docs.filter(F.pmod(F.xxhash64("url"), F.lit(mod)) == 0)
        encode_documents(spark, sample, wdir, cfg,
                         num_parts=args.cpus, n_rows=max(n_rows // mod, 1))
        _sh.rmtree(wdir, ignore_errors=True)

    def _cpu_stat():
        # (steal, total) jiffies: per-rep hypervisor-steal evidence so a
        # best-of over reps can be judged rep-by-rep (see bench.py)
        try:
            with open("/proc/stat") as f:
                vals = [int(x) for x in f.readline().split()[1:]]
            return vals[7] if len(vals) > 7 else 0, sum(vals)
        except (OSError, ValueError):
            return 0, 0

    import shutil as _sh
    all_secs = []
    all_steal = []
    best = None
    for rep in range(max(1, args.repeats)):
        out_dir = args.out if args.repeats == 1 else f"{args.out}.r{rep}"
        if not args.resume:
            _sh.rmtree(out_dir, ignore_errors=True)
        st0 = _cpu_stat()
        t0 = time.time()
        lin = encode_documents(spark, docs, out_dir, cfg,
                               num_parts=args.partitions, n_rows=n_rows,
                               resume=args.resume, scheme=args.scheme)
        agg = lin.groupBy().sum("bytes_in", "bytes_out",
                                "row_count").collect()[0]
        sec = time.time() - t0
        st1 = _cpu_stat()
        dtot = st1[1] - st0[1]
        all_steal.append(round(100.0 * (st1[0] - st0[0]) / dtot, 2)
                         if dtot else 0.0)
        all_secs.append(round(sec, 3))
        if best is None or sec < best["sec"]:
            best = {
                "rows": int(agg[2]), "bytes_in": int(agg[0]),
                "bytes_out": int(agg[1]), "sec": round(sec, 3),
                "gb_per_sec": round(int(agg[0]) / sec / 1e9, 4),
                "ratio": round(int(agg[0]) / max(int(agg[1]), 1), 3),
                "cpus": args.cpus,
            }
        if args.repeats > 1 and rep < args.repeats - 1:
            _sh.rmtree(out_dir, ignore_errors=True)
    best["all_sec"] = all_secs
    best["all_steal_pct"] = all_steal
    spark.stop()
    print(json.dumps(best))


if __name__ == "__main__":
    sys.exit(main())
