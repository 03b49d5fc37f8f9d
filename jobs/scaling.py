#!/usr/bin/env python
"""Two-cluster-size scaling measurement (the north-rule criterion).

The north rule asks for the same job run via `spark-submit --py-files`
on a multi-executor cluster at N and 4N executors. No remote cluster
exists in this sandbox, so this harness launches a REAL Spark standalone
cluster on localhost (master + worker daemons, separate executor JVMs,
netty shuffle) and submits the encode job against it at two sizes:

    N  = 1 worker  x --worker-cores (default 4)  -> 1 executor JVM
    4N = 4 workers x --worker-cores               -> 4 executor JVMs

Both sizes read the same pre-generated parquet input from shared disk
(the single-box analog of a cluster reading object storage) with
identical per-executor resources; only the executor count changes —
exactly the N->4N experiment the rule describes.

Worker size defaults to 4 cores so the 4N configuration (16 cores) does
not saturate this box's DRAM: at 4x8 workers (all 32 cores) the encode
kernels contend for memory bandwidth and per-core throughput drops ~1.4x
— an artifact of co-locating "4 nodes" on one machine that a real
cluster (4x the DRAM channels) does not have. Official measurement at
2M docs (10.5 GB decoded): 1x4 = 279.5s vs 4x4 = 81.4s best-of ->
efficiency 0.859 (PASS >= 0.8). At 1M docs: 0.76-0.82 run-dependent
(fixed per-job costs weigh more). The saturated 1x8 vs 4x8 pair gives
74.8s vs 31.0s -> 0.60 at 1M. Run `--worker-cores 8` to reproduce the
saturated variant.

Each leg runs the encode --repeats times INSIDE one session and takes
the best: the first run pays JVM JIT warm-in (measured 63->46->31s
across identical back-to-back runs), so steady state needs ~2 warm
runs. local[N] mode is kept as `--mode local` for comparison.

    python jobs/scaling.py [--docs 2000000] [--mode standalone]

Prints one JSON line: throughput at both sizes + scaling efficiency
(= (gbps_4N / gbps_N) / 4).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
MASTER_URL = "spark://127.0.0.1:7077"
MASTER_UI = "http://127.0.0.1:8080/json"


def spark_home() -> str:
    import pyspark
    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _env() -> dict:
    env = dict(os.environ)
    env["SPARK_HOME"] = spark_home()
    env["SPARK_LOCAL_IP"] = "127.0.0.1"
    env["SPARK_LOG_DIR"] = "/tmp/spark-logs"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _spark_class(cls: str, *args: str) -> subprocess.Popen:
    os.makedirs("/tmp/spark-logs", exist_ok=True)
    log = open(f"/tmp/spark-logs/{cls.rsplit('.', 1)[-1].lower()}-"
               f"{time.time():.0f}.out", "w")
    return subprocess.Popen(
        [os.path.join(spark_home(), "bin", "spark-class"), cls, *args],
        stdout=log, stderr=subprocess.STDOUT, env=_env(),
        start_new_session=True)


def _alive_workers() -> int:
    try:
        with urllib.request.urlopen(MASTER_UI, timeout=3) as r:
            j = json.load(r)
        return sum(1 for w in j.get("workers", [])
                   if w.get("state") == "ALIVE")
    except Exception:
        return -1  # master not up


def _kill_pattern(pat: str) -> None:
    subprocess.run(["pkill", "-f", pat], check=False)


class Cluster:
    """Lifecycle for a localhost standalone cluster."""

    def __init__(self, worker_cores: int, worker_mem: str = "26g"):
        self.worker_cores = worker_cores
        self.worker_mem = worker_mem
        self.workers: list[subprocess.Popen] = []
        self.master: subprocess.Popen | None = None

    def ensure_master(self) -> None:
        if _alive_workers() >= 0:
            return
        self.master = _spark_class(
            "org.apache.spark.deploy.master.Master",
            "-h", "127.0.0.1", "-p", "7077", "--webui-port", "8080")
        for _ in range(60):
            if _alive_workers() >= 0:
                return
            time.sleep(1)
        raise RuntimeError("standalone master failed to start")

    def set_workers(self, n: int) -> None:
        self.stop_workers()
        for i in range(n):
            self.workers.append(_spark_class(
                "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                "-c", str(self.worker_cores), "-m", self.worker_mem,
                "-h", "127.0.0.1", "--webui-port", "0"))
        for _ in range(90):
            if _alive_workers() == n:
                return
            time.sleep(1)
        raise RuntimeError(f"expected {n} ALIVE workers, "
                           f"got {_alive_workers()}")

    def stop_workers(self) -> None:
        for p in self.workers:
            try:
                os.killpg(p.pid, signal.SIGTERM)
            except Exception:
                pass
        self.workers = []
        _kill_pattern("deploy.worker.Worker")
        _kill_pattern("CoarseGrainedExecutorBackend")
        for _ in range(30):
            if _alive_workers() in (0, -1):
                break
            time.sleep(1)

    def teardown(self) -> None:
        self.stop_workers()
        if self.master is not None:
            try:
                os.killpg(self.master.pid, signal.SIGTERM)
            except Exception:
                pass
            _kill_pattern("deploy.master.Master")


def make_input(docs: int) -> str:
    """Deterministic synthetic input, written once to shared disk."""
    path = f"/tmp/skar_scaling_input_{docs}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    shutil.rmtree(path, ignore_errors=True)
    p = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {REPO!r})\n"
         "from skar_spark.session import get_spark\n"
         "from skar_spark.synth import synth_documents\n"
         "spark = get_spark(cpus=32, app='synth_input', master='local[32]')\n"
         f"synth_documents(spark, {docs}, partitions=64)"
         f".write.mode('overwrite').parquet({path!r})\n"
         "spark.stop()\n"],
        env=_env(), cwd=REPO, timeout=1800)
    if p.returncode != 0:
        raise RuntimeError("input generation failed")
    return path


def _loadavg1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def _cpu_stat() -> tuple:
    """(steal, total) jiffies from /proc/stat — steal is the only
    visible trace of hypervisor-neighbor contention; loadavg stays
    flat while neighbors slow the memory-bound kernels (see bench.py
    _cpu_stat and BENCH.md ambient notes)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except (OSError, ValueError):
        return 0, 0


def _ambient_gate(thr: float, max_wait: int = 600) -> float:
    """Wait (bounded) for ambient hypervisor-neighbor load to drop
    below `thr` before a timed leg starts — the scaling criterion is a
    RATIO of two legs measured minutes apart, so one leg catching an
    ambient spike biases it directly (r5: a 4N leg under load 5-8
    measured 43-71 s rep spread vs 37-42 s quiet). Returns the load at
    gate release; both legs' values are recorded in the result JSON."""
    waited = 0
    load = _loadavg1()
    while load > thr and waited < max_wait:
        time.sleep(30)
        waited += 30
        load = _loadavg1()
    if waited:
        print(f"[scaling] ambient gate: waited {waited}s "
              f"(load now {load:.2f})", file=sys.stderr)
    return load


def submit_encode(total_cores: int, docs: int, inp: str, tag: str,
                  partitions: int, executor_mem: str,
                  timeout: int = 3600, job_repeats: int = 3) -> dict:
    import glob as _glob
    out = f"/tmp/skar_scaling_{tag}"
    for d in [out] + _glob.glob(out + ".r*") + [out + ".warmup"]:
        shutil.rmtree(d, ignore_errors=True)
    env = _env()
    env["SKAR_EXECUTOR_MEM"] = executor_mem
    cmd = [os.path.join(spark_home(), "bin", "spark-submit"),
           "--master", MASTER_URL,
           "--py-files", _pkg_zip(),
           "--executor-memory", executor_mem,
           os.path.join(HERE, "encode_job.py"),
           "--input", inp, "--out", out,
           "--cpus", str(total_cores), "--master", MASTER_URL,
           "--partitions", str(partitions), "--warmup",
           "--repeats", str(job_repeats)]
    load0 = _ambient_gate(thr=float(os.environ.get(
        "SKAR_SCALING_AMBIENT_THR", "2.5")))
    stat0 = _cpu_stat()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=timeout)
    stat1 = _cpu_stat()
    for d in [out] + _glob.glob(out + ".r*") + [out + ".warmup"]:
        shutil.rmtree(d, ignore_errors=True)
    if p.returncode != 0:
        raise RuntimeError(f"submit cores={total_cores} failed:\n"
                           f"{p.stderr[-3000:]}")
    line = [ln for ln in p.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(line)
    res["load_at_start"] = load0
    res["load_at_end"] = _loadavg1()
    dtot = stat1[1] - stat0[1]
    res["steal_pct"] = (round(100.0 * (stat1[0] - stat0[0]) / dtot, 2)
                        if dtot else 0.0)
    return res


def _pkg_zip() -> str:
    zpath = "/tmp/skar_spark_pkg.zip"
    if os.path.exists(zpath):
        os.unlink(zpath)
    import zipfile
    src = os.path.join(REPO, "skar_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(src):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_local(cpus: int, docs: int, tag: str, partitions: int) -> dict:
    out = f"/tmp/skar_scaling_{tag}_{cpus}"
    shutil.rmtree(out, ignore_errors=True)
    env = _env()
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "encode_job.py"),
         "--input", f"synth:{docs}", "--out", out, "--cpus", str(cpus),
         "--partitions", str(partitions)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    if p.returncode != 0:
        raise RuntimeError(f"cpus={cpus} failed:\n{p.stderr[-3000:]}")
    line = [ln for ln in p.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    shutil.rmtree(out, ignore_errors=True)
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--mode", choices=["standalone", "local"],
                    default="standalone")
    ap.add_argument("--worker-cores", type=int, default=4)
    ap.add_argument("--n-workers", type=int, default=1)
    ap.add_argument("--n4-workers", type=int, default=4)
    ap.add_argument("--executor-mem", default="10g")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=1,
                    help="harness-level interleaved repeats (each leg "
                         "already runs --job-repeats encodes in-session)")
    ap.add_argument("--job-repeats", type=int, default=4,
                    help="in-session encode repeats per leg; best-of "
                         "(steady-state: JIT warm-in takes ~2 runs). "
                         "Both legs run the SAME count — symmetric "
                         "sampling keeps the efficiency ratio unbiased; "
                         "the untimed warm-up additionally does constant "
                         "work PER CORE so multi-executor legs start "
                         "equally warm (encode_job.py --warmup).")
    ap.add_argument("--keep-cluster", action="store_true")
    args = ap.parse_args()
    partitions = args.partitions or max(128, args.docs // 7000)

    runs_n, runs_4n = [], []
    if args.mode == "local":
        n_cores = args.n_workers * args.worker_cores
        n4_cores = args.n4_workers * args.worker_cores
        for r in range(args.repeats):
            runs_4n.append(run_local(n4_cores, args.docs, f"b{r}",
                                     partitions))
            runs_n.append(run_local(n_cores, args.docs, f"a{r}",
                                    partitions))
    else:
        inp = make_input(args.docs)
        cluster = Cluster(args.worker_cores)
        try:
            cluster.ensure_master()
            for r in range(args.repeats):
                # SAME repeat count on both legs: best-of over more
                # samples would systematically favor that leg and bias
                # the efficiency ratio (asymmetric protocols are not
                # like-for-like)
                for n_w, runs, tag, jr in (
                        (args.n4_workers, runs_4n, "b", args.job_repeats),
                        (args.n_workers, runs_n, "a", args.job_repeats)):
                    cluster.set_workers(n_w)
                    runs.append(submit_encode(
                        n_w * args.worker_cores, args.docs, inp,
                        f"{tag}{r}", partitions, args.executor_mem,
                        job_repeats=jr))
        finally:
            if not args.keep_cluster:
                cluster.teardown()
        n_cores = args.n_workers * args.worker_cores
        n4_cores = args.n4_workers * args.worker_cores

    best_n = max(runs_n, key=lambda x: x["gb_per_sec"])
    best_4n = max(runs_4n, key=lambda x: x["gb_per_sec"])
    eff = (best_4n["gb_per_sec"] / best_n["gb_per_sec"]) / (
        n4_cores / n_cores)
    print(json.dumps({
        "docs": args.docs, "mode": args.mode,
        "n_cores": n_cores, "n4_cores": n4_cores,
        "n_executors": args.n_workers if args.mode == "standalone" else 1,
        "n4_executors": (args.n4_workers if args.mode == "standalone"
                         else 1),
        "gbps_n": best_n["gb_per_sec"], "gbps_4n": best_4n["gb_per_sec"],
        "sec_n": best_n["sec"], "sec_4n": best_4n["sec"],
        "all_sec_n": [t for r in runs_n for t in r.get("all_sec", [r["sec"]])],
        "all_sec_4n": [t for r in runs_4n for t in r.get("all_sec", [r["sec"]])],
        "scaling_efficiency": round(eff, 3),
        "pass_0_8": eff >= 0.8,
        "ratio": best_4n["ratio"],
        "leg_loads_n": [[r.get("load_at_start"), r.get("load_at_end")]
                        for r in runs_n],
        "leg_loads_4n": [[r.get("load_at_start"), r.get("load_at_end")]
                         for r in runs_4n],
        "leg_steal_pct_n": [r.get("steal_pct") for r in runs_n],
        "leg_steal_pct_4n": [r.get("steal_pct") for r in runs_4n],
        "rep_steal_n": [s for r in runs_n
                        for s in r.get("all_steal_pct", [])],
        "rep_steal_4n": [s for r in runs_4n
                         for s in r.get("all_steal_pct", [])],
    }))


if __name__ == "__main__":
    main()
