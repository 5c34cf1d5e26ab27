"""Camera models: pinhole+plumb_bob rectification and equirectangular pano.

TPU-native replacement for the reference's camera stack:

* ROS ``image_geometry::PinholeCameraModel`` rectification + back-projection
  used to precompute the per-pixel bearing-vector LUT (reference:
  ``src/utils/event_pano_warper.cpp:27-41``),
* ``dvs::EquirectangularCamera`` projection with analytic 2x3 Jacobian
  (reference: ``include/utils/equirectangular_camera.h:18-45``), including a
  proper ``lift_to_unit_sphere`` (left as a TODO in the reference at
  ``equirectangular_camera.h:47-50``).

The bearing LUT is computed once per run on the host in f64 (it is static
per calibration), shipped to device as a (H*W, 3) array; projection and its
Jacobian are pure jnp, fully vmap-able, NaN-safe at the z-axis / poles.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """Pinhole intrinsics with plumb_bob distortion and rectification.

    Mirrors the fields of a ROS CameraInfo message (see
    ``calib/DVS-playroom.yaml`` in the reference).
    """

    width: int
    height: int
    K: np.ndarray  # (3, 3) camera matrix
    D: np.ndarray  # (5,) plumb_bob: k1 k2 p1 p2 k3
    R: np.ndarray  # (3, 3) rectification matrix
    P: np.ndarray  # (3, 4) projection matrix

    @classmethod
    def from_calib(
        cls, width: int, height: int, K, D=None, R=None, P=None
    ) -> "PinholeCamera":
        K = np.asarray(K, dtype=np.float64).reshape(3, 3)
        D = (
            np.zeros(5)
            if D is None
            else np.pad(np.asarray(D, dtype=np.float64).ravel(), (0, 5))[:5]
        )
        R = np.eye(3) if R is None else np.asarray(R, dtype=np.float64).reshape(3, 3)
        if P is None:
            P = np.zeros((3, 4))
            P[:, :3] = K
        else:
            P = np.asarray(P, dtype=np.float64).reshape(3, 4)
        return cls(width=width, height=height, K=K, D=D, R=R, P=P)

    def undistort_normalized(self, u, v, iters: int = 8):
        """Raw pixel -> undistorted normalized coordinates (x, y) on z=1.

        Fixed-point inversion of the plumb_bob model (the standard
        ``cv::undistortPoints`` iteration the reference relies on through
        ``rectifyPoint``).
        """
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        x0 = (np.asarray(u, dtype=np.float64) - cx) / fx
        y0 = (np.asarray(v, dtype=np.float64) - cy) / fy
        k1, k2, p1, p2, k3 = self.D
        x, y = x0, y0
        if np.any(self.D != 0):
            for _ in range(iters):
                r2 = x * x + y * y
                icdist = 1.0 / (1.0 + ((k3 * r2 + k2) * r2 + k1) * r2)
                dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
                dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
                x = (x0 - dx) * icdist
                y = (y0 - dy) * icdist
        return x, y

    def bearing_lut(self) -> np.ndarray:
        """Per-pixel bearing vectors, row-major (H*W, 3) f64, unit-norm.

        Reference semantics (``event_pano_warper.cpp:27-41``): rectify each
        raw pixel, back-project to a 3D ray; here additionally normalized
        (the equirectangular projection is scale-invariant, so this only
        improves conditioning).
        """
        xs, ys = np.meshgrid(np.arange(self.width), np.arange(self.height))
        x, y = self.undistort_normalized(xs.ravel(), ys.ravel())
        rays = np.stack([x, y, np.ones_like(x)], axis=-1)  # camera frame, z=1
        rays = rays @ self.R.T  # apply rectification rotation
        return rays / np.linalg.norm(rays, axis=-1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class EquirectangularCamera:
    """Equirectangular panorama projection (360 x 180 deg FOV).

    Focals per the reference's ``focalFromFOV``
    (``equirectangular_camera.h:64-67``): fx = W/(2 pi), fy = H/pi;
    principal point at the image center.
    """

    width: int
    height: int

    @property
    def fx(self) -> float:
        return self.width / (2.0 * np.pi)

    @property
    def fy(self) -> float:
        return self.height / np.pi

    def project(self, P, need_jacobian: bool = True):
        """Project 3D points (..., 3) -> pano pixels (..., 2) [+ 2x3 Jacobian].

        phi = atan2(x, z), theta = asin(y / ||P||); pm = center +
        (phi*fx, theta*fy). Analytic Jacobian matches the reference
        (``equirectangular_camera.h:31-43``), with NaN-safe guards at z=0
        and at the poles (|y| -> ||P||).
        """
        P = jnp.asarray(P)
        dtype = P.dtype
        x, y, z = P[..., 0], P[..., 1], P[..., 2]
        rho2 = x * x + y * y + z * z
        rho = jnp.sqrt(rho2)
        phi = jnp.arctan2(x, z)
        y_div_rho = jnp.clip(y / rho, -1.0, 1.0)
        theta = jnp.arcsin(y_div_rho)
        fx = jnp.asarray(self.fx, dtype)
        fy = jnp.asarray(self.fy, dtype)
        cx = jnp.asarray(self.width / 2.0, dtype)
        cy = jnp.asarray(self.height / 2.0, dtype)
        pm = jnp.stack([cx + phi * fx, cy + theta * fy], axis=-1)
        if not need_jacobian:
            return pm
        # d phi / d(x, z): (z, -x) / (x^2 + z^2)  [equivalent to the
        # reference's fx/((1+(x/z)^2) z) form, but finite at z = 0]
        xz2 = x * x + z * z
        xz2_safe = jnp.where(xz2 < 1e-24, jnp.ones_like(xz2), xz2)
        j00 = fx * z / xz2_safe
        j02 = -fx * x / xz2_safe
        # d theta / d(x, y, z): with w = y/rho,
        # d asin(w)/dP = (1/sqrt(1-w^2)) * (e_y/rho - y P / rho^3)
        one_m_w2 = jnp.maximum(1.0 - y_div_rho * y_div_rho, 1e-12)
        inv_sq = 1.0 / jnp.sqrt(one_m_w2)
        tmp3 = y_div_rho / rho2
        j10 = fy * inv_sq * (-tmp3 * x)
        j11 = fy * inv_sq * (1.0 / rho - tmp3 * y)
        j12 = fy * inv_sq * (-tmp3 * z)
        zero = jnp.zeros_like(j00)
        jac = jnp.stack(
            [
                jnp.stack([j00, zero, j02], axis=-1),
                jnp.stack([j10, j11, j12], axis=-1),
            ],
            axis=-2,
        )
        return pm, jac

    def lift_to_unit_sphere(self, pm):
        """Pano pixel (..., 2) -> unit bearing (..., 3). Inverse of
        :meth:`project` (implements the reference's TODO at
        ``equirectangular_camera.h:47-50``)."""
        pm = jnp.asarray(pm)
        phi = (pm[..., 0] - self.width / 2.0) / self.fx
        theta = (pm[..., 1] - self.height / 2.0) / self.fy
        ct = jnp.cos(theta)
        return jnp.stack(
            [jnp.sin(phi) * ct, jnp.sin(theta), jnp.cos(phi) * ct], axis=-1
        )


def load_camera_yaml(path: str) -> PinholeCamera:
    """Load a ROS-style camera calibration YAML (reference:
    ``calib/DVS-playroom.yaml``). Minimal parser, no yaml dependency."""
    with open(path) as f:
        text = f.read()
    import re

    def grab(name, default=None):
        m = re.search(rf"^{name}:\s*(.*)$", text, re.M)
        return m.group(1).strip() if m else default

    width = int(grab("image_width"))
    height = int(grab("image_height"))

    def grab_matrix(name):
        i = text.find(name + ":")
        if i < 0:
            return None
        m = re.search(r"data:\s*\[([^\]]*)\]", text[i:])
        if not m:
            return None
        return np.array([float(v) for v in m.group(1).replace("\n", " ").split(",")])

    K = grab_matrix("camera_matrix")
    D = grab_matrix("distortion_coefficients")
    R = grab_matrix("rectification_matrix")
    P = grab_matrix("projection_matrix")
    return PinholeCamera.from_calib(width, height, K=K, D=D, R=R, P=P)
