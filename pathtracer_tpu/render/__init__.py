from pathtracer_tpu.render.renderer import make_renderer, render_image  # noqa: F401
