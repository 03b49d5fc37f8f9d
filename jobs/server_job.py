"""spark-submit entry point for the HTTP query server.

The deployment analog of running the reference binary in serve mode
(skar/src/main.rs → server.rs): start a SparkSession, serve the JSON
query API over an encoded table, block until interrupted.

    spark-submit --py-files skar_spark.zip jobs/server_job.py \
        --table /data/skar_table --host 0.0.0.0 --port 1151

    curl -X POST http://host:1151/query -d '{"selections": [...]}'
    curl http://host:1151/height
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True,
                    help="encoded table directory (out_dir of encode_job)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=1151,
                    help="0 picks a free port (printed on stdout)")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--master", default=None,
                    help="spark:// URL for a standalone cluster")
    args = ap.parse_args()

    from skar_spark.server import serve
    from skar_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app="skar_query_server",
                      master=args.master)
    srv = serve(spark, args.table, host=args.host, port=args.port)
    print(f"serving {args.table} on "
          f"http://{srv.server_address[0]}:{srv.server_address[1]} "
          f"(POST /query, GET /height)", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
