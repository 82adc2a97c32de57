"""Stanford bunny scene (BASELINE config 3: bunny mesh via OBJ + LBVH).

The reference ships ``models/bunny/bunny.obj`` (2,503 v / 4,968 f) but never
loads it — the only call site is commented out (``main.cu:534``). This scene
wires it up: the bunny mesh over a grey ground sphere under the sky light,
with a mirror and a glass sphere flanking it for bounce variety.
"""
from __future__ import annotations

import os
from typing import Tuple

from pathtracer_tpu.config import K_ASPECT_RATIO
from pathtracer_tpu.core.camera import Camera, make_camera
from pathtracer_tpu.io.obj import load_obj
from pathtracer_tpu.scene.scene import Scene, SceneBuilder

BUNNY_OBJ = os.environ.get(
    "PT_BUNNY_OBJ", "/root/reference/models/bunny/bunny.obj")


def bunny_world(obj_path: str = BUNNY_OBJ, scale: float = 20.0,
                material: str = "lambertian") -> Tuple[Scene, Camera]:
    verts, faces = load_obj(obj_path)
    verts = verts * scale
    # center on origin, rest on y=0
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    verts = verts - (lo + hi) / 2.0
    verts[:, 1] -= verts[:, 1].min()

    b = SceneBuilder()
    if material == "metal":
        bunny_mat = b.add_metal((0.8, 0.7, 0.55), 0.05)
    elif material == "dielectric":
        bunny_mat = b.add_dielectric(1.5)
    else:
        bunny_mat = b.add_lambertian((0.65, 0.55, 0.45))
    b.add_mesh(verts, faces, bunny_mat)

    ground = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, -1000, 0), 1000.0, ground)
    mirror = b.add_metal((0.7, 0.6, 0.5), 0.0)
    b.add_sphere((-4.5, 1.5, -1.0), 1.5, mirror)
    glass = b.add_dielectric(1.5)
    b.add_sphere((4.5, 1.5, -1.0), 1.5, glass)

    cam = make_camera((0, 3.0, 9.0), (0, 1.5, 0), 35, K_ASPECT_RATIO,
                      aperture=0, focus_dist=10, time0=0.0, time1=1.0)
    return b.build(), cam
