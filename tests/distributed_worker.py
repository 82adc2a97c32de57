"""Worker process for the two-process jax.distributed smoke test
(tests/test_distributed.py). Each process owns 2 virtual CPU devices; the
pair federates into a 4-device global mesh via a localhost coordinator —
the multi-*process* bring-up path (parallel/mesh.initialize_distributed)
that single-process tests cannot reach.

Exercises, in order: distributed init, global mesh construction, a
cross-process psum, a sharded render of each process's addressable pixel
shard, and per-host framebuffer assembly (process_allgather) checked
against a single-process render of the same image.
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Distributed init MUST precede the first backend touch — importing the
# renderer modules builds jnp constants, which initializes the backend and
# makes jax.distributed.initialize fail (parallel/mesh.py docstring).
from pathtracer_tpu.parallel.mesh import (RAYS_AXIS, initialize_distributed,
                                          make_mesh)  # noqa: E402

initialize_distributed(f"localhost:{port}", nproc, pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, len(jax.devices())
assert len(jax.local_devices()) == 2

mesh = make_mesh()

# --- cross-process collective: psum over the global rays axis ------------
from jax.experimental.shard_map import shard_map  # noqa: E402

n_dev = len(jax.devices())
global_shape = (n_dev * 8,)
sharding = NamedSharding(mesh, P(RAYS_AXIS))


def make_global(values):
    return jax.make_array_from_callback(
        global_shape, sharding, lambda idx: values[idx])


x = make_global(np.arange(global_shape[0], dtype=np.float32))
total = shard_map(lambda v: jax.lax.psum(jnp.sum(v), RAYS_AXIS),
                  mesh=mesh, in_specs=P(RAYS_AXIS), out_specs=P())(x)
expect = float(np.arange(global_shape[0]).sum())
assert float(total) == expect, (float(total), expect)

# --- sharded render of this process's addressable pixel rows -------------
from pathtracer_tpu.config import RenderConfig  # noqa: E402
from pathtracer_tpu.render.renderer import (padded_pixel_grid,
                                            render_sum)  # noqa: E402
from pathtracer_tpu.scene.worlds import test_world  # noqa: E402

scene, cam = test_world()
cfg = RenderConfig(width=32, height=16, spp=2, max_depth=3, accel="brute",
                   ray_chunk=64, scene="test")
rows, cols = padded_pixel_grid(cfg, 64 * n_dev)
n_pad = rows.shape[0]
shard = n_pad // nproc
lo, hi = pid * shard, (pid + 1) * shard
key = jax.random.PRNGKey(cfg.seed)
local = np.asarray(render_sum(scene, None, cam, key,
                              rows[lo:hi], cols[lo:hi], cfg, cfg.spp))

# --- per-host assembly: all-gather the host shards, compare on host 0 ----
from jax.experimental import multihost_utils  # noqa: E402

full = np.asarray(multihost_utils.process_allgather(jnp.asarray(local)))
full = full.reshape(n_pad, 3)
if pid == 0:
    ref = np.asarray(render_sum(scene, None, cam, key, rows, cols, cfg,
                                cfg.spp))
    np.testing.assert_allclose(full, ref, atol=1e-5)
    print("DISTRIBUTED_OK", flush=True)
