"""Thin-lens look-at camera.

Functional counterpart of reference ``simulation/camera.h:10-76``: the camera
is an immutable NamedTuple (a pytree, so it jits/shards/differentiates), ray
generation is batched over the whole wavefront, and WASD/QE navigation
(``camera.h:41-56``) returns a new camera value instead of mutating.

Reference conventions preserved:
- ``front = normalize(look_from - look_at)`` points *backwards* (camera.h:27),
- viewport corner at ``pos - h/2 - v/2 - focus_dist * front`` (camera.h:34),
- ``get_ray`` directions are NOT normalized (camera.h:58-64),
- FORWARD movement *subtracts* front (camera.h:43-44).
"""
from __future__ import annotations

import enum
from typing import NamedTuple

import jax.numpy as jnp

from pathtracer_tpu.config import K_CAMERA_SPEED
from pathtracer_tpu.core import sampling, vec


class Direction(enum.Enum):
    """Navigation directions (utils/utility.h:18-25)."""
    FORWARD = 0
    BACKWARD = 1
    LEFT = 2
    RIGHT = 3
    UP = 4
    DOWN = 5


class Camera(NamedTuple):
    position: jnp.ndarray            # (3,)
    lower_left: jnp.ndarray          # (3,) viewport low-left corner
    horizontal: jnp.ndarray          # (3,) full-viewport horizontal extent
    vertical: jnp.ndarray            # (3,) full-viewport vertical extent
    right: jnp.ndarray               # (3,)
    up: jnp.ndarray                  # (3,)
    front: jnp.ndarray               # (3,) points from look_at to look_from
    lens_radius: jnp.ndarray         # ()
    time0: jnp.ndarray               # ()
    time1: jnp.ndarray               # ()
    focus_dist: jnp.ndarray          # ()


def make_camera(look_from, look_at, vfov_deg, aspect_ratio,
                aperture=0.0, focus_dist=1.0, time0=0.0, time1=0.0) -> Camera:
    """Build the camera basis and viewport (camera.h:12-39)."""
    look_from = jnp.asarray(look_from, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    theta = vec.degrees_to_radians(jnp.asarray(vfov_deg, jnp.float32))
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = aspect_ratio * viewport_height

    front = vec.normalize(look_from - look_at)
    right = vec.normalize(vec.cross(jnp.array([0.0, 1.0, 0.0]), front))
    up = vec.cross(front, right)

    horizontal = focus_dist * viewport_width * right
    vertical = focus_dist * viewport_height * up
    lower_left = (look_from - horizontal / 2.0 - vertical / 2.0
                  - focus_dist * front)
    return Camera(
        position=look_from, lower_left=lower_left,
        horizontal=horizontal, vertical=vertical,
        right=right, up=up, front=front,
        lens_radius=jnp.asarray(aperture / 2.0, jnp.float32),
        time0=jnp.asarray(time0, jnp.float32),
        time1=jnp.asarray(time1, jnp.float32),
        focus_dist=jnp.asarray(focus_dist, jnp.float32))


def get_rays(cam: Camera, s, t, u_disk1, u_disk2, u_time):
    """Generate rays for viewport fractions (s, t) with lens defocus and
    shutter-time jitter (camera.h:58-64). All args are (N,) arrays; returns
    (origin (N,3), direction (N,3), time (N,)). Directions unnormalized,
    exactly like the reference."""
    rd = cam.lens_radius * sampling.uniform_in_disk(u_disk1, u_disk2)
    offset = (cam.right[None, :] * rd[..., 0:1]
              + cam.up[None, :] * rd[..., 1:2])
    origin = cam.position[None, :] + offset
    direction = (cam.lower_left[None, :]
                 + s[..., None] * cam.horizontal[None, :]
                 + t[..., None] * cam.vertical[None, :]
                 - cam.position[None, :] - offset)
    time = sampling.uniform_in_range(cam.time0, cam.time1, u_time)
    return origin, direction, time


def move_camera(cam: Camera, direction: Direction, delta_time: float) -> Camera:
    """WASD/QE navigation (camera.h:41-56). Returns a new Camera."""
    velocity = K_CAMERA_SPEED * delta_time
    pos = cam.position
    if direction == Direction.FORWARD:
        pos = pos - cam.front * velocity
    elif direction == Direction.BACKWARD:
        pos = pos + cam.front * velocity
    elif direction == Direction.LEFT:
        pos = pos - cam.right * velocity
    elif direction == Direction.RIGHT:
        pos = pos + cam.right * velocity
    elif direction == Direction.UP:
        pos = pos + cam.up * velocity
    elif direction == Direction.DOWN:
        pos = pos - cam.up * velocity
    lower_left = (pos - cam.horizontal / 2.0 - cam.vertical / 2.0
                  - cam.focus_dist * cam.front)
    return cam._replace(position=pos, lower_left=lower_left)
