from pathtracer_tpu.core import vec, optics, sampling, camera, rays  # noqa: F401
