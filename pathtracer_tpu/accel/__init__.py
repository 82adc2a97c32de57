from pathtracer_tpu.accel.lbvh import LBVH, build_lbvh  # noqa: F401
