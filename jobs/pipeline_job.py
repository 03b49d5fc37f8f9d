#!/usr/bin/env python
"""spark-submit entry point for the curation pipeline.

    spark-submit --py-files skar_spark.zip jobs/pipeline_job.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/curated

Annotate → quality gate → exact dedup → near dedup (staged candidates)
→ encode through the columnar engine. Prints one JSON line of stage
counters. See skar_spark/pipeline.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--max-stopword-rate", type=float, default=0.8)
    ap.add_argument("--keep-stage", action="store_true",
                    help="retain {out}/stage/near_dup_pairs (the shared "
                         "verified-candidates table) after the encode "
                         "commits instead of deleting it")
    args = ap.parse_args()

    from skar_spark.pipeline import curate
    from skar_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app="skar_pipeline")
    stats = curate(spark, args.sf_dir, args.out,
                   min_tokens=args.min_tokens,
                   max_tokens=args.max_tokens,
                   max_stopword_rate=args.max_stopword_rate,
                   keep_stage=args.keep_stage)
    spark.stop()
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
