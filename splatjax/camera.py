"""Cameras: modelview/projection pairs consumed by the splat projection math.

The renderer consumes a (modelview, projection, width, height) tuple and
evaluates exactly the reference vertex-shader math (index.js:101-164). Pixel
convention: a pixel (row i, col j) has center at

    px  = (ndc_x + 1) * W / 2          (col, rightward)
    row = (1 - ndc_y) * H / 2          (row, downward; row 0 on top)

``focal`` is derived as the reference does per frame:
``focal = (viewport_height / 2) * |P[1][1]|`` (index.js:191).

Constructors:
  * :func:`perspective` + :func:`look_at` — clean GL-style matrices. The
    shader math is sign-invariant to the reference's column flips (the EWA
    Jacobian enters quadratically), so clean matrices render correctly.
  * :func:`Camera.from_three` — applies the reference's exact Y-flip
    conventions (index.js:456-487, getProjectionMatrix/getModelViewMatrix)
    to a THREE-style camera-world + projection pair. Used by parity tests.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_FLIP_Y = np.diag(np.array([1.0, -1.0, 1.0, 1.0], dtype=np.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A render camera. ``width``/``height`` are static (not traced)."""

    modelview: Array   # (4, 4) world -> camera
    projection: Array  # (4, 4) camera -> clip
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def focal(self) -> Array:
        # index.js:191: focal = (viewport.h / 2) * |projectionMatrix[5]|
        return (self.height / 2.0) * jnp.abs(self.projection[1, 1])

    @staticmethod
    def from_three(
        camera_world: np.ndarray,
        projection: np.ndarray,
        object_world: np.ndarray | None = None,
        *,
        width: int,
        height: int,
    ) -> "Camera":
        """Build from THREE.js-style matrices with the reference's flips.

        getProjectionMatrix (index.js:456-466): negate projection column 1.
        getModelViewMatrix (index.js:467-487): with F = diag(1,-1,1,1),
        MV = (flip(obj^-1) @ flip(cam_world))^-1 = F @ cam_world^-1 @ obj @ F
        (flip(M) = F M F for affine M; element 7 it skips is always 0).
        """
        if object_world is None:
            object_world = np.eye(4, dtype=np.float32)
        proj = np.asarray(projection, dtype=np.float64).copy()
        proj[:, 1] *= -1.0
        cw = np.asarray(camera_world, dtype=np.float64)
        ow = np.asarray(object_world, dtype=np.float64)
        mv = _FLIP_Y @ np.linalg.inv(cw) @ ow @ _FLIP_Y
        return Camera(
            modelview=jnp.asarray(mv, dtype=jnp.float32),
            projection=jnp.asarray(proj, dtype=jnp.float32),
            width=width,
            height=height,
        )


def perspective(
    fov_y_deg: float, aspect: float, near: float = 0.1, far: float = 1000.0
) -> np.ndarray:
    """THREE.PerspectiveCamera.updateProjectionMatrix equivalent (symmetric)."""
    f = 1.0 / np.tan(np.deg2rad(fov_y_deg) / 2.0)
    p = np.zeros((4, 4), dtype=np.float32)
    p[0, 0] = f / aspect
    p[1, 1] = f
    p[2, 2] = -(far + near) / (far - near)
    p[2, 3] = -2.0 * far * near / (far - near)
    p[3, 2] = -1.0
    return p


def look_at(
    eye, target, up=(0.0, 1.0, 0.0)
) -> np.ndarray:
    """GL-style view matrix (world -> camera, camera looks down -Z)."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    view = np.eye(4, dtype=np.float64)
    view[0, :3] = right
    view[1, :3] = true_up
    view[2, :3] = -fwd
    view[:3, 3] = -view[:3, :3] @ eye
    return view.astype(np.float32)


def make_camera(
    eye,
    target,
    *,
    width: int,
    height: int,
    fov_y_deg: float = 60.0,
    up=(0.0, 1.0, 0.0),
    near: float = 0.1,
    far: float = 1000.0,
) -> Camera:
    """Clean-convention camera in framework world space."""
    proj = perspective(fov_y_deg, width / height, near, far)
    view = look_at(eye, target, up)
    return Camera(
        modelview=jnp.asarray(view),
        projection=jnp.asarray(proj),
        width=width,
        height=height,
    )
