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
