from pathtracer_tpu.scene.scene import (  # noqa: F401
    Scene, SceneBuilder,
    PRIM_SPHERE, PRIM_TRIANGLE,
    MAT_LAMBERTIAN, MAT_METAL, MAT_DIELECTRIC, MAT_EMISSIVE,
)
