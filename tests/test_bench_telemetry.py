"""The bench harness's /proc/stat steal telemetry (BENCH.md round-5
"Steal-time telemetry" section): loadavg counts only our own runnable
tasks, so hypervisor-neighbor contention is invisible to it — steal
jiffies are the only on-box evidence. These tests pin the parsing and
the percentage math; bench.py is a script, so its helpers are loaded by
exec'ing the module header (everything above main())."""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_helpers():
    with open(os.path.join(REPO, "bench.py")) as f:
        src = f.read()
    ns: dict = {}
    exec(compile(src.split("def main()")[0], "bench.py", "exec"), ns)
    return ns


def test_cpu_stat_reads_live_counters():
    ns = _bench_helpers()
    steal, total = ns["_cpu_stat"]()
    assert total > 0
    assert 0 <= steal <= total


def test_steal_pct_math():
    ns = _bench_helpers()
    # 5 steal jiffies out of 100 total elapsed -> 5%
    assert ns["_steal_pct"]((100, 1000), (105, 1100)) == 5.0
    # zero elapsed must not divide by zero
    assert ns["_steal_pct"]((100, 1000), (100, 1000)) == 0.0
    # monotonic counters, no steal
    assert ns["_steal_pct"]((0, 0), (0, 500)) == 0.0


def test_scaling_cpu_stat_matches_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scaling_job", os.path.join(REPO, "jobs", "scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as exc:  # pragma: no cover - env-specific imports
        pytest.skip(f"jobs/scaling.py import skipped: {exc}")
    steal, total = mod._cpu_stat()
    assert total > 0 and 0 <= steal <= total
