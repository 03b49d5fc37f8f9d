#!/usr/bin/env python
"""Two-cluster-size scaling measurement (the north-rule criterion).

No real cluster exists in this sandbox, so the N→4N executor scaling is
evidenced by running the identical encode job at local[8] and local[32]
on the same deterministic input (BASELINE.md's protocol). Each run is a
fresh process so JVM/session state can't leak between measurements.

    python jobs/scaling.py [--docs 120000] [--repeats 1]

Prints one JSON line: throughput at both sizes + scaling efficiency
(= (gbps_32 / gbps_8) / 4).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_once(cpus: int, docs: int, tag: str, partitions: int = None) -> dict:
    out = f"/tmp/skar_scaling_{tag}_{cpus}"
    shutil.rmtree(out, ignore_errors=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "encode_job.py"),
         "--input", f"synth:{docs}", "--out", out, "--cpus", str(cpus),
         "--partitions", str(partitions or max(128, docs // 7000))],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    if p.returncode != 0:
        raise RuntimeError(f"cpus={cpus} failed:\n{p.stderr[-3000:]}")
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    shutil.rmtree(out, ignore_errors=True)
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=2,
                    help="interleaved repeats; best-of is reported "
                         "(this host has noisy-neighbor variance)")
    args = ap.parse_args()

    runs_n, runs_4n = [], []
    for r in range(args.repeats):
        runs_4n.append(run_once(args.n4, args.docs, f"b{r}", args.partitions))
        runs_n.append(run_once(args.n, args.docs, f"a{r}", args.partitions))
    best_n = max(runs_n, key=lambda x: x["gb_per_sec"])
    best_4n = max(runs_4n, key=lambda x: x["gb_per_sec"])
    eff = (best_4n["gb_per_sec"] / best_n["gb_per_sec"]) / (args.n4 / args.n)
    print(json.dumps({
        "docs": args.docs,
        "n_cpus": args.n, "n4_cpus": args.n4,
        "gbps_n": best_n["gb_per_sec"], "gbps_4n": best_4n["gb_per_sec"],
        "sec_n": best_n["sec"], "sec_4n": best_4n["sec"],
        "all_sec_n": [r["sec"] for r in runs_n],
        "all_sec_4n": [r["sec"] for r in runs_4n],
        "scaling_efficiency": round(eff, 3),
        "pass_0_8": eff >= 0.8,
        "ratio": best_4n["ratio"],
    }))


if __name__ == "__main__":
    main()
