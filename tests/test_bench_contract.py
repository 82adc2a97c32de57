"""Driver-contract tests: bench.py must print exactly one JSON line with
the required keys (the driver records it as BENCH_r{N}.json)."""
import json
import subprocess
import sys


def test_bench_json_contract():
    out = subprocess.run(
        [sys.executable, "bench.py", "--scene", "test", "--accel", "brute",
         "--width", "32", "--height", "16", "--spp", "1", "--depth", "2",
         "--iters", "1", "--ray-chunk", "512"],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "HOME": "/root",
             "PYTHONPATH": "/root/repo"},
        cwd="/root/repo")
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, (out.stdout, out.stderr[-500:])
    rec = json.loads(lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline",
                        "executed_queries", "executed_mrays_per_s"}
    assert rec["unit"] == "Mrays/s"
    assert rec["value"] > 0
    # executed <= nominal (early exit / compaction can only skip work)
    assert 0 < rec["executed_queries"] <= rec["nominal_queries"]


def test_bench_stale_fallback(tmp_path, capsys):
    """Tunnel-down path: bench re-emits the latest committed non-experiment
    bench line marked stale (still a parsable one-line JSON artifact)."""
    import bench
    log = tmp_path / "bench_log.jsonl"
    good = {"metric": "bunny_forward_throughput", "value": 12.3,
            "unit": "Mrays/s", "vs_baseline": 0.0615,
            "date": "2026-08-18T00:00:00Z"}
    exp = dict(good, value=99.0, env={"PT_RNG_STUB": "1"})
    log.write_text(json.dumps(good) + "\n" + json.dumps(exp) + "\n")
    rc = bench._emit_last_good("test reason", log_path=str(log))
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and len(out) == 1
    rec = json.loads(out[0])
    assert rec["stale"] is True and rec["value"] == 12.3  # not the stub

    rc = bench._emit_last_good("no log", log_path=str(tmp_path / "nope"))
    out = capsys.readouterr().out.strip()
    assert rc == 1 and json.loads(out)["value"] is None


_GOOD_LINE = json.dumps({
    "metric": "bunny_forward_throughput", "value": 12.3,
    "unit": "Mrays/s", "vs_baseline": 0.0615,
    "date": "2026-08-18T00:00:00Z"}) + "\n"


def _watchdog_env(tmp_path):
    log = tmp_path / "bench_log.jsonl"
    log.write_text(_GOOD_LINE)
    return {"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
            "PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
            "PT_BENCH_NO_PROBE": "1", "PT_BENCH_LOG": str(log),
            "PT_BENCH_FAKE": "sleep:120"}


def test_bench_internal_deadline(tmp_path):
    """VERDICT r4 #1: a slow compile/run must still yield a JSON line.
    The fake-slow child sleeps 120 s; a 3 s internal budget must kill it
    and emit the stale fallback well before any driver timeout."""
    import time
    t0 = time.monotonic()
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=60, cwd="/root/repo",
        env=dict(_watchdog_env(tmp_path), PT_BENCH_BUDGET_S="3"))
    assert time.monotonic() - t0 < 30
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, (out.stdout, out.stderr[-500:])
    rec = json.loads(lines[0])
    assert rec["stale"] is True and rec["value"] == 12.3
    assert "budget" in rec["stale_reason"]


def test_bench_sigterm_fallback(tmp_path):
    """`timeout N python bench.py` sends SIGTERM — bench must emit the
    stale line on the way out instead of dying silently (the BENCH_r04
    rc-124/parsed-null failure mode)."""
    import signal
    import time
    proc = subprocess.Popen(
        [sys.executable, "bench.py"], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd="/root/repo",
        env=_watchdog_env(tmp_path))
    time.sleep(3.0)  # parent is in its wait loop by now
    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=30)
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, (out, err[-500:])
    rec = json.loads(lines[0])
    assert rec["stale"] is True and rec["value"] == 12.3
    assert "signal" in rec["stale_reason"]
