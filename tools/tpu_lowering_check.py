"""Pre-flight Mosaic lowering check — no TPU needed.

Exports every chip-queue kernel variant for platform "tpu" via
``jax.export`` with the interpret switch forced off, which runs the full
Pallas -> Mosaic lowering (shape/layout/DMA verification) and embeds the
serialized Mosaic module in a ``tpu_custom_call``. A variant that fails
here would waste a chip-queue slot on the shared tunnel; a variant that
passes can still be slow to *compile* on device (Mosaic -> machine code
happens there), which is what the queue measures.

Run on CPU: python tools/tpu_lowering_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    from pathtracer_tpu.scene.worlds import get_world
    from pathtracer_tpu.ops.clusters import build_cluster_tables
    from pathtracer_tpu.ops import cluster_sweep as cs

    # force the non-interpret (Mosaic) lowering path inside cluster_march
    cs.jax.default_backend = lambda: "tpu"

    scene, _ = get_world("bunny")
    cts = {128: build_cluster_tables(scene),
           64: build_cluster_tables(scene, K=64),
           32: build_cluster_tables(scene, K=32),
           256: build_cluster_tables(scene, K=256)}
    R = 256
    o = jnp.tile(jnp.array([[0.0, 1.5, 6.0]]), (R, 1))
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    sds = (jax.ShapeDtypeStruct(o.shape, o.dtype),
           jax.ShapeDtypeStruct(d.shape, d.dtype))
    extras = (jnp.arange(R, dtype=jnp.int32),)

    combos = [
        ("default_w2", 128, {}, {}),
        ("w4_grp", 128, dict(PT_CLUSTER_WIDE="4", PT_CLUSTER_GROUPED="1"),
         {}),
        ("w8_grp", 128, dict(PT_CLUSTER_WIDE="8", PT_CLUSTER_GROUPED="1"),
         {}),
        ("k32_w8_split", 32,
         dict(PT_CLUSTER_K="32", PT_CLUSTER_WIDE="8",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_SPLIT="1"), {}),
        ("k64_w4_split", 64,
         dict(PT_CLUSTER_K="64", PT_CLUSTER_WIDE="4",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_SPLIT="1"), {}),
        ("pipe_w2", 128, dict(PT_CLUSTER_PIPE="1"), {}),
        ("super4", 128, dict(PT_CLUSTER_SUPER="4"), {}),
        ("stream_w2", 128, dict(PT_CLUSTER_STREAM="1"), {}),
        ("stream_w4_grp", 128,
         dict(PT_CLUSTER_STREAM="1", PT_CLUSTER_WIDE="4",
              PT_CLUSTER_GROUPED="1"), {}),
        ("w2_rows_extras", 128, {}, dict(with_rows=True, extras=extras)),
        ("stream_rows_extras", 128, dict(PT_CLUSTER_STREAM="1"),
         dict(with_rows=True, extras=extras)),
        ("w4grp_rows_extras", 128,
         dict(PT_CLUSTER_WIDE="4", PT_CLUSTER_GROUPED="1"),
         dict(with_rows=True, extras=extras)),
        # round-3 wave 2: W=16 dodges the resident scoped-VMEM OOM via the
        # streamed tables; K=256 halves window count at fixed wide*K lanes
        ("stream_w16_grp", 128,
         dict(PT_CLUSTER_STREAM="1", PT_CLUSTER_WIDE="16",
              PT_CLUSTER_GROUPED="1"), {}),
        ("k256_w8_grp", 256,
         dict(PT_CLUSTER_K="256", PT_CLUSTER_WIDE="8",
              PT_CLUSTER_GROUPED="1"), {}),
        ("k256_stream_w8_grp", 256,
         dict(PT_CLUSTER_K="256", PT_CLUSTER_STREAM="1",
              PT_CLUSTER_WIDE="8", PT_CLUSTER_GROUPED="1"), {}),
        ("stream_w8_rows_extras", 128,
         dict(PT_CLUSTER_STREAM="1", PT_CLUSTER_WIDE="8",
              PT_CLUSTER_GROUPED="1"),
         dict(with_rows=True, extras=extras)),
        # round-4 wave 2: conditional winner-rows extraction at the
        # production default (K=64 x W=16 split windows), and the
        # smaller-window ladder (fewer lanes per window at fixed K)
        ("k64_w16_rowscond", 64,
         dict(PT_CLUSTER_K="64", PT_CLUSTER_WIDE="16",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_SPLIT="1",
              PT_CLUSTER_ROWSCOND="1"),
         dict(with_rows=True, extras=extras)),
        ("k64_w8_rows", 64,
         dict(PT_CLUSTER_K="64", PT_CLUSTER_WIDE="8",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_SPLIT="1"),
         dict(with_rows=True, extras=extras)),
        ("k64_w4_rows", 64,
         dict(PT_CLUSTER_K="64", PT_CLUSTER_WIDE="4",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_SPLIT="1"),
         dict(with_rows=True, extras=extras)),
        ("stream_rowscond", 128,
         dict(PT_CLUSTER_STREAM="1", PT_CLUSTER_WIDE="8",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_ROWSCOND="1"),
         dict(with_rows=True, extras=extras)),
        # round-4 wave 3: HBM order rows for the resident march (lifts
        # the n_chunks x M SMEM scalar-prefetch wall)
        ("k64_w16_orddma", 64,
         dict(PT_CLUSTER_K="64", PT_CLUSTER_WIDE="16",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_SPLIT="1",
              PT_CLUSTER_ORDDMA="1"),
         dict(with_rows=True, extras=extras)),
        ("orddma_w8_k128", 128,
         dict(PT_CLUSTER_WIDE="8", PT_CLUSTER_GROUPED="1",
              PT_CLUSTER_ORDDMA="1"), {}),
        # round-5: narrow-first head window + the two-level (cull2) march
        ("k64_w16_narrow4", 64,
         dict(PT_CLUSTER_K="64", PT_CLUSTER_WIDE="16",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_SPLIT="1",
              PT_CLUSTER_NARROW="4"),
         dict(with_rows=True, extras=extras)),
        ("narrow2_w8_k128", 128,
         dict(PT_CLUSTER_WIDE="8", PT_CLUSTER_GROUPED="1",
              PT_CLUSTER_NARROW="2"), {}),
        ("cull2_stream", 128,
         dict(PT_CLUSTER_CULL2="1", PT_CLUSTER_SUPER="4",
              PT_CLUSTER_STREAM="1", PT_CLUSTER_WIDE="8",
              PT_CLUSTER_GROUPED="1"),
         dict(with_rows=True, extras=extras)),
        ("cull2_orddma_narrow", 64,
         dict(PT_CLUSTER_CULL2="1", PT_CLUSTER_SUPER="4",
              PT_CLUSTER_K="64", PT_CLUSTER_WIDE="16",
              PT_CLUSTER_GROUPED="1", PT_CLUSTER_SPLIT="1",
              PT_CLUSTER_NARROW="4"),
         dict(with_rows=True, extras=extras)),
    ]
    failed = 0
    for name, K, env, kw in combos:
        for k in list(os.environ):
            if k.startswith("PT_CLUSTER_"):
                del os.environ[k]
        os.environ.update(env)
        ct = cts[K]

        def f(o, d):
            return cs.cluster_march(ct, o, d, 1e-3, **kw)

        try:
            exp = jax.export.export(jax.jit(f), platforms=["tpu"])(*sds)
            kb = len(exp.mlir_module_serialized) // 1000
            print(f"{name:22s} OK  ({kb} KB)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failed += 1
            print(f"{name:22s} FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
