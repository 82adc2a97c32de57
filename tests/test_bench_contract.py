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
