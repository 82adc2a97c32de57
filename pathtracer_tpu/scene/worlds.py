"""The reference's three hardcoded worlds + their cameras.

Scene generators mirror ``main.cu:57-256`` (generateTestWorldOnHost /
generateTriangleWorldOnHost / generateRandomWorldOnHost) and the camera
setups at ``main.cu:412-443``. Geometry that the reference derives
deterministically is reproduced exactly; random draws (materials, centers)
use a seeded numpy generator with the same draw *order* and distributions —
bit-matching MSVC's std::mt19937 + uniform_real_distribution is neither
possible nor useful (SURVEY §7 hard-part 3).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from pathtracer_tpu.config import K_ASPECT_RATIO
from pathtracer_tpu.core.camera import Camera, make_camera
from pathtracer_tpu.scene.scene import Scene, SceneBuilder


def _rand_in_unit_sphere(rng: np.random.Generator) -> np.ndarray:
    """Host rejection sampler (utility.h:110-119) — fine on host."""
    while True:
        p = 2.0 * rng.random(3, dtype=np.float64) - 1.0
        if p @ p < 1.0:
            return p.astype(np.float32)


def test_world() -> Tuple[Scene, Camera]:
    """3-object debug world (main.cu:57-117): two mirror-image metal
    triangles + a blue r=1000 lambertian sphere at (1005,0,0). Camera
    (0,0,15) -> origin, vfov 20 (main.cu:430-434). Fully deterministic —
    the golden-image unit fixture (SURVEY §4)."""
    b = SceneBuilder()
    m0 = b.add_metal((0.7, 0.6, 0.5), 0.0)
    b.add_triangle((0, -2, 0), (1, 0, 5), (0, 2, 0), m0)
    m1 = b.add_metal((0.7, 0.6, 0.5), 0.0)
    b.add_triangle((0, -2, 0), (-1, 0, 5), (0, 2, 0), m1)
    m2 = b.add_lambertian((0, 0, 1))
    b.add_sphere((1005, 0, 0), 1000.0, m2)
    cam = make_camera((0, 0, 15), (0, 0, 0), 20, K_ASPECT_RATIO,
                      aperture=0, focus_dist=10, time0=0.0, time1=1.0)
    return b.build(), cam


def triangle_world(seed: int = 1, total_count: int = 600) -> Tuple[Scene, Camera]:
    """The ACTIVE reference scene (TRIANGLEWORLD, macros.h:10;
    main.cu:119-196): 600 objects, 50/50 spheres(r=0.5)/random triangles
    inside an r=10 ball, material mix by thresholds, grey r=1000 backdrop at
    (0,0,-1010). Camera (0,0,25) vfov 40 (main.cu:438-442)."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    radius = 10.0
    for _ in range(total_count):
        choose_mat = rng.random() * 2.0
        center = _rand_in_unit_sphere(rng) * radius
        rand1 = rng.random(3).astype(np.float32)
        rand2 = rng.random(3).astype(np.float32)
        if choose_mat < 1.0:
            if choose_mat < 0.6:
                mat = b.add_lambertian(rand1 * rand2)
            elif choose_mat < 0.9:
                mat = b.add_metal(rand1 / 2 + 0.5, rand2[0] / 2)
            else:
                mat = b.add_dielectric(1.5)
            b.add_sphere(center, 0.5, mat)
        else:
            v0 = _rand_in_unit_sphere(rng) + center
            v1 = _rand_in_unit_sphere(rng) + center
            v2 = _rand_in_unit_sphere(rng) + center
            if choose_mat < 1.6:
                mat = b.add_lambertian(rand1 * rand2)
            elif choose_mat < 1.9:
                mat = b.add_metal(rand1 / 2 + 0.5, rand2[0] / 2)
            else:
                mat = b.add_dielectric(1.5)
            b.add_triangle(v0, v1, v2, mat)
    grey = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, 0, -1010), 1000.0, grey)  # main.cu:169-171
    cam = make_camera((0, 0, 25), (0, 0, 0), 40, K_ASPECT_RATIO,
                      aperture=0, focus_dist=10, time0=0.0, time1=1.0)
    return b.build(), cam


def random_world(seed: int = 2) -> Tuple[Scene, Camera]:
    """RTIOW final scene (main.cu:198-256): ground r=1000 at (0,-1000,0),
    20x20 grid of r=0.2 spheres at integer (i, 0.2, j) (80% diffuse / 15%
    metal / 5% glass), three hero spheres including the hollow glass pair
    (outer r=1, inner r=-0.9 sharing one dielectric material,
    main.cu:231-234). Camera (0,30,0.1) vfov 20 (main.cu:412-416)."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    ground = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, -1000, 0), 1000.0, ground)
    n = 10
    for i in range(-n, n):
        for j in range(-n, n):
            choose_mat = rng.random()
            center = (float(i), 0.2, float(j))
            rand1 = rng.random(3).astype(np.float32)
            rand2 = rng.random(3).astype(np.float32)
            if choose_mat < 0.8:
                mat = b.add_lambertian(rand1 * rand2)
            elif choose_mat < 0.95:
                mat = b.add_metal(rand1 / 2 + 0.5, rand2[0] / 2)
            else:
                mat = b.add_dielectric(1.5)
            b.add_sphere(center, 0.2, mat)
    glass = b.add_dielectric(1.5)
    b.add_sphere((4, 1, 0), 1.0, glass)
    b.add_sphere((4, 1, 0), -0.9, glass)  # hollow interior, main.cu:233
    red = b.add_lambertian((1, 0, 0.4))
    b.add_sphere((-4, 1, 0), 1.0, red)
    mirror = b.add_metal((0.7, 0.6, 0.5), 0.0)
    b.add_sphere((0, 1, 0), 1.0, mirror)
    cam = make_camera((0, 30, 0.1), (0, 0, 0), 20, K_ASPECT_RATIO,
                      aperture=0, focus_dist=10, time0=0.0, time1=1.0)
    return b.build(), cam


# pytest would otherwise collect the imported factory as a "test"
test_world.__test__ = False

WORLDS = {
    "test": test_world,
    "triangle": triangle_world,
    "random": random_world,
}


def get_world(name: str, **kw) -> Tuple[Scene, Camera]:
    if name in WORLDS:
        return WORLDS[name](**kw)
    if name == "cornell":
        from pathtracer_tpu.scene.cornell import cornell_box
        return cornell_box(**kw)
    if name == "bunny":
        from pathtracer_tpu.scene.bunny import bunny_world
        return bunny_world(**kw)
    if name == "combined":
        # BASELINE config 5's scene (bunny + cornell room + RTIOW spheres)
        from pathtracer_tpu.presets import combined_scene
        return combined_scene(**kw)
    raise ValueError(f"unknown scene {name!r}; "
                     f"available: test/triangle/random/cornell/bunny/"
                     f"combined")
