from pathtracer_tpu.io.png import write_png  # noqa: F401
from pathtracer_tpu.io.obj import load_obj  # noqa: F401
