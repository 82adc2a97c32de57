"""Benchmark: forward path-tracing throughput on the bunny LBVH scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = BASELINE config 3 shape (bunny mesh + mirror + glass spheres,
4 bounces). "value" is the *nominal-workload* throughput — pixels x spp x
max_depth queries over wall-clock — comparable across rounds and to the
200 Mrays/s/chip north star (BASELINE.md; the reference publishes no
numbers, SURVEY §6). The JSON line also reports the *executed* query count
(the integrator counts queries that actually did work: early-exit and
dead-ray compaction skip terminated lanes) and the Mrays/s over those, so
termination-rate changes cannot masquerade as speed.

Capture guarantee (VERDICT r4 #1 — BENCH_r04 was null because a driver
timeout killed the process mid-compile): the measured body runs in a CHILD
subprocess; the parent enforces an internal wall-clock budget
(PT_BENCH_BUDGET_S, default 1500 s) *and* traps SIGTERM/SIGINT (what
`timeout` sends), so ANY driver deadline yields the latest committed bench
line marked stale instead of nothing. The reference's one perf instrument
is a wall-clock print that always appears (/root/reference/main.cu:469-476)
— this bench is at least as unkillable.

Usage: python bench.py [--width W] [--height H] [--spp N] [--depth D]
                       [--scene bunny] [--iters K]
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time

BASELINE_MRAYS = 200.0  # BASELINE.md north star, Mrays/s/chip
BENCH_LOG = os.environ.get(
    "PT_BENCH_LOG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "docs", "bench_log.jsonl"))

_PROBE_SRC = """
import jax, jax.numpy as jnp
d = jax.devices()
assert "cpu" not in str(d[0]).lower(), d
x = jnp.ones((8, 128))
(x @ x.T).sum().block_until_ready()
"""


def _probe_tpu(attempts: int = 1, probe_timeout: int = 90,
               wait_s: int = 30) -> bool:
    """Bounded probe for the axon tunnel.

    One ~90 s attempt (a healthy tunnel answers the compute in seconds,
    but the import + backend handshake alone measured 68 s on 2026-08-20;
    the old 3x180+2x90 budget could burn ~12.5 min of the driver's
    timeout before the bench even started — VERDICT r4 #1). Probes run in
    subprocesses because a hung tunnel blocks in-process forever and a
    failed backend init is sticky for the process lifetime."""
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                               timeout=probe_timeout,
                               capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: TPU probe {i + 1}/{attempts} failed",
              file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(wait_s)
    return False


def _emit_last_good(reason: str, log_path: str = BENCH_LOG) -> int:
    """Fallback: re-emit the latest committed bench line, marked stale with
    the failure reason — a dated, reproducible record beats an empty
    artifact (VERDICT r2 'capture the number no matter what the tunnel
    does'; r4: 'the work was done, the artifact wasn't captured')."""
    try:
        with open(log_path) as f:
            recs = [json.loads(ln) for ln in f if ln.strip()]
    except OSError:
        recs = []
    # skip env-knobbed experiment lines (A/B runs, image-altering stubs),
    # lines the sanity gate flagged (e.g. the r3 44,632 Mrays/s async-timing
    # artifact), and previously re-emitted stale lines
    recs = [r for r in recs
            if "env" not in r and not r.get("suspect")
            and not r.get("stale")]
    if not recs:
        print(json.dumps({"metric": "bunny_forward_throughput",
                          "value": None, "unit": "Mrays/s",
                          "vs_baseline": None, "error": reason}))
        sys.stdout.flush()
        return 1
    rec = dict(recs[-1])
    rec["stale"] = True
    rec["stale_reason"] = reason
    print(json.dumps(rec))
    sys.stdout.flush()
    return 0


def _calibrate_tunnel():
    """2-3 s tunnel-state stamp (VERDICT r4 #8): per-program dispatch
    latency (bimodal ~0.1 vs ~24 ms) and in-program elementwise throughput
    (the tools/tpu_query_parts.py exit-42 anchor). Returns a dict stamped
    into the bench record; class == "bad" marks the record suspect so it
    never becomes an official fallback line."""
    import jax
    import jax.numpy as jnp
    if str(jax.devices()[0].platform).lower() == "cpu":
        return None
    tiny = jnp.zeros((8, 128), jnp.float32)
    disp = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(disp(tiny))
    ds = []
    import numpy as _np
    for _ in range(5):
        t0 = time.perf_counter()
        _np.asarray(disp(tiny))  # VALUE-forced (block_until_ready lies
        ds.append(time.perf_counter() - t0)  # under parallel semantics)
    dispatch_ms = sorted(ds)[len(ds) // 2] * 1e3

    big = jnp.zeros((2048, 2048), jnp.float32)

    @jax.jit
    def _cal(x):
        return jax.lax.fori_loop(0, 8, lambda i, a: a * 0.5 + 1.0, x)[0, 0]

    _np.asarray(_cal(big))
    t0 = time.perf_counter()
    _np.asarray(_cal(big))
    calib_ms = max(0.0, (time.perf_counter() - t0
                         - dispatch_ms * 1e-3)) / 8 * 1e3
    cls = ("bad" if calib_ms > 1.0 else
           "slow" if dispatch_ms > 5.0 else "fast")
    return {"dispatch_ms": round(dispatch_ms, 2),
            "calib_ms": round(calib_ms, 3), "class": cls}


def _parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--scene", default="bunny")
    p.add_argument("--accel", default="auto",
                   choices=["auto", "cluster", "tensor", "pallas", "bvh",
                            "brute"])
    p.add_argument("--iters", type=int, default=3)
    # Chunk-size economics (r4 wave-2 factorial, same-process): with the
    # conditional rows extraction ON, 57600 and 115200 land within noise
    # (334.9 vs ~349 ms) — the two levers cut the same per-query fixed
    # cost pool and saturate at ~335 ms; 230400 needs PT_CLUSTER_ORDDMA
    # (SMEM order-table wall) and buys nothing further. Default stays at
    # the VMEM-friendlier 57600.
    p.add_argument("--ray-chunk", type=int, default=57600)
    p.add_argument("--subdivide", type=int, default=0,
                   help="bunny only: 4:1 midpoint subdivision levels "
                        "(4 -> 1.27M tris; the HBM-scale bench row — the "
                        "auto accel rule picks the streamed march above "
                        "the resident VMEM budget)")
    p.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    return p.parse_args(argv)


def _child_main(args) -> int:
    """The measured body — runs in a subprocess under the parent's
    deadline. Prints the one JSON line on success."""
    fake = os.environ.get("PT_BENCH_FAKE", "")
    if fake.startswith("sleep:"):  # test hook: deterministic slow backend
        time.sleep(float(fake.split(":", 1)[1]))
        return 3

    import jax

    from pathtracer_tpu.accel.lbvh import build_lbvh
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import make_renderer
    from pathtracer_tpu.scene.worlds import get_world

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.depth, accel=args.accel,
                       ray_chunk=args.ray_chunk, scene=args.scene,
                       # mirror the CLI: cornell and the combined config-5
                       # scene are emissive-lit (NEE, no sky) — the
                       # realistic workload for those scenes
                       sky=args.scene not in ("cornell", "combined"),
                       nee=args.scene in ("cornell", "combined"))
    scene_kw = ({"subdivide": args.subdivide}
                if args.subdivide and args.scene == "bunny" else {})
    scene, cam = get_world(args.scene, **scene_kw)
    bvh = None
    if args.accel == "bvh":
        bvh = jax.block_until_ready(build_lbvh(scene))
    render = make_renderer(cfg, with_bvh=bvh is not None, with_stats=True)

    tunnel = _calibrate_tunnel()

    # warmup: compile + one steady-state run
    img, n_exec = render(scene, bvh, cam, 0)
    jax.block_until_ready(img)

    # Per-iteration VALUE forcing: the r3 44,632 Mrays/s artifact came from
    # timing an async dispatch — and block_until_ready itself is not
    # trustworthy on the axon tunnel (under PT_CLUSTER_PARSEM it returns
    # before execution completes while the image is still correct).
    # Materializing the executed-query counters host-side (8 bytes) cannot
    # lie: the executable must have retired to produce their values.
    import numpy as _np
    dts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        img, n_exec = render(scene, bvh, cam, i + 1)
        n_exec_host = _np.asarray(n_exec)
        dts.append(time.perf_counter() - t0)
    dt = sum(dts) / len(dts)

    rays = cfg.num_pixels * cfg.spp * cfg.max_depth
    mrays = rays / dt / 1e6
    n_closest, n_shadow, n_pairs = (int(v) for v in n_exec_host)
    from pathtracer_tpu.config import resolve_accel
    metric_scene = (f"{args.scene}_sub{args.subdivide}"
                    if scene_kw else args.scene)
    rec = {
        "metric": f"{metric_scene}_forward_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "accel": resolve_accel(args.accel, int(scene.num_prims)),
        "prims": int(scene.num_prims),
        "nominal_queries": rays,
        # schema v2: executed_queries counts CLOSEST-HIT queries only (the
        # same population as nominal_queries), shadow (NEE) queries are
        # reported separately — executed_mrays_per_s can no longer exceed
        # nominal by accounting choice. v1 lines (no "shadow_queries" key)
        # folded both into executed_queries.
        "schema": 2,
        "executed_queries": n_closest,
        "shadow_queries": n_shadow,
        "executed_mrays_per_s": round(n_closest / dt / 1e6, 3),
    }
    if tunnel is not None:
        rec["tunnel_state"] = tunnel
    # MFU / roofline accounting (VERDICT r3 #4): the march kernel counts
    # executed (ray, prim-slot) sweep pair tests; each costs OUTS x 72
    # bf16 MACs in the fused6 sweep plus 48 MACs of winner-rows
    # extraction. The fraction of chip bf16 peak tells round 5 whether to
    # tune the kernel or change the algorithm. XLA-side work (cull,
    # binning sort, residual sweep, shading) is excluded — this is the
    # MARCH matmul utilization, an upper bound on how much of the render
    # is MXU-shaped. Peak: TPU v5e = 197 bf16 TFLOP/s (chip spec; other
    # chips report flops only, mfu null).
    if n_pairs > 0:
        from pathtracer_tpu.ops.tensor_sweep import FEAT, OUTS
        flops = n_pairs * 2.0 * (OUTS * 6 * FEAT + 48)
        kind = str(jax.devices()[0].device_kind).lower()
        peak = 197e12 if "v5 lite" in kind or "v5e" in kind else None
        rec["pair_tests"] = n_pairs
        rec["march_tflops"] = round(flops / dt / 1e12, 3)
        rec["march_mfu"] = (round(flops / dt / peak, 5) if peak else None)
    # Sanity gate: on a bimodal-latency tunnel an unexplained timing
    # artifact must be rejected, not committed (VERDICT r3 weak #2). A rate
    # wildly above every dated line for this metric — or above any rate the
    # chip could physically produce — marks the record suspect:
    # _emit_last_good skips it and it never becomes a round artifact.
    best_known = 0.0
    try:
        with open(BENCH_LOG) as f:
            for ln in f:
                r = json.loads(ln)
                if (r.get("metric", "").endswith("_forward_throughput")
                        and not r.get("suspect") and not r.get("stale")
                        and isinstance(r.get("value"), (int, float))):
                    best_known = max(best_known, float(r["value"]))
    except OSError:
        pass
    cap = max(10.0 * best_known, 2000.0)
    if mrays > cap:
        rec["suspect"] = True
        rec["suspect_reason"] = (
            f"{mrays:.0f} Mrays/s exceeds sanity cap {cap:.0f} "
            f"(10x best known {best_known:.1f}); per-iter dts={dts}")
    if tunnel is not None and tunnel["class"] == "bad":
        rec["suspect"] = True
        rec["suspect_reason"] = (
            f"bad tunnel interval (calib {tunnel['calib_ms']} ms/pass vs "
            f"~0.05 expected) — timings unusable; "
            + rec.get("suspect_reason", ""))
    print(json.dumps(rec))
    sys.stdout.flush()
    # Append every good live run (dated, with workload shape) to the
    # committed bench log so a snapshot-time outage can never erase the
    # round's number (docs/bench_log.jsonl; _emit_last_good reads it).
    if str(jax.devices()[0].platform).lower() != "cpu":
        logrec = dict(rec, date=time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()),
                      width=args.width, height=args.height, spp=args.spp,
                      depth=args.depth, ray_chunk=args.ray_chunk)
        # experiment runs (env-knobbed A/Bs, possibly image-altering stubs)
        # carry their knobs; _emit_last_good skips them
        knobs = {k: v for k, v in os.environ.items()
                 if k.startswith(("PT_CLUSTER_", "PT_SWEEP_", "PT_RNG_",
                                  "PT_SORT_", "PT_GATHER"))}
        if knobs:
            logrec["env"] = knobs
        try:
            os.makedirs(os.path.dirname(BENCH_LOG), exist_ok=True)
            with open(BENCH_LOG, "a") as f:
                f.write(json.dumps(logrec) + "\n")
        except OSError:
            pass
    return 0


def main() -> int:
    args = _parse_args()
    if args.child:
        return _child_main(args)

    # ---- parent: watchdog around the measured child -------------------
    budget = float(os.environ.get("PT_BENCH_BUDGET_S", "1500"))
    t_start = time.monotonic()

    # Outage resilience: probe the tunnel (one short attempt) before
    # committing to a child backend init; on a dead tunnel emit the latest
    # committed bench line marked stale instead of a stack trace.
    # PT_BENCH_NO_PROBE=1 skips the probe (chip-queue runs that already
    # verified the tunnel).
    want_cpu = os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
    if os.environ.get("PT_BENCH_NO_PROBE") != "1" and not want_cpu:
        if not _probe_tpu():
            return _emit_last_good("axon tunnel unreachable (90 s probe)")

    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"]
        + sys.argv[1:],
        stdout=subprocess.PIPE, text=True, start_new_session=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    out_lines: list[str] = []

    def _reader():
        for ln in child.stdout:
            out_lines.append(ln.rstrip("\n"))

    rt = threading.Thread(target=_reader, daemon=True)
    rt.start()

    def _die(reason: str):
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except (OSError, ProcessLookupError):
            pass
        _emit_last_good(reason)
        os._exit(0)  # a captured stale line IS the success path here

    def _on_signal(signum, frame):
        _die(f"driver deadline (signal {signum}) after "
             f"{time.monotonic() - t_start:.0f} s — measured run killed")

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    while True:
        remaining = budget - (time.monotonic() - t_start)
        if remaining <= 0:
            _die(f"internal budget PT_BENCH_BUDGET_S={budget:.0f}s "
                 f"exceeded — measured run killed")
        try:
            rc = child.wait(timeout=min(5.0, remaining))
            break
        except subprocess.TimeoutExpired:
            continue

    rt.join(timeout=10)
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    signal.signal(signal.SIGINT, signal.SIG_DFL)
    json_ok = any(ln.startswith("{") for ln in out_lines)
    if not json_ok:
        return _emit_last_good(f"bench child rc={rc} without a JSON line")
    for ln in out_lines:
        print(ln)
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
