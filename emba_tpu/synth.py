"""Synthetic event generation: render a DVS event stream from a known
panorama and trajectory — the fixture generator the reference lacks
(SURVEY.md §4: "add what the reference lacks — synthetic event generators as
fixtures (render events from a known map + trajectory, recover both)").

Host-side numpy, f64: runs once per test/benchmark setup.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import spline
from .camera import EquirectangularCamera, PinholeCamera


def smooth_random_map(height: int, width: int, rng, smooth: int = 15, amp: float = 1.0):
    """A smooth random brightness panorama (separable box-filtered noise)."""
    B = rng.normal(size=(height, width))
    for _ in range(3):
        k = np.ones(smooth) / smooth
        B = np.apply_along_axis(
            lambda r: np.convolve(np.pad(r, smooth, mode="wrap"), k, "same")[
                smooth:-smooth
            ],
            1,
            B,
        )
        B = np.apply_along_axis(
            lambda c: np.convolve(np.pad(c, smooth, mode="reflect"), k, "same")[
                smooth:-smooth
            ],
            0,
            B,
        )
    B = B / (np.abs(B).max() + 1e-12) * amp
    return B


def sobel_gradients_np(G):
    """Host mirror of model.sobel_gradients (Sobel/8, reflect-101)."""
    P = np.pad(G, 1, mode="reflect")
    sy = P[:-2, :] + 2.0 * P[1:-1, :] + P[2:, :]
    gx = (sy[:, 2:] - sy[:, :-2]) * 0.125
    sx = P[:, :-2] + 2.0 * P[:, 1:-1] + P[:, 2:]
    gy = (sx[2:, :] - sx[:-2, :]) * 0.125
    return gx, gy


def bilinear_sample(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    h, w = img.shape
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 2)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 2)
    fx = np.clip(x - x0, 0.0, 1.0)
    fy = np.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


@dataclasses.dataclass
class SyntheticScene:
    brightness: np.ndarray  # (H, W) panorama
    gx: np.ndarray  # GT gradient maps (Sobel/8 of brightness)
    gy: np.ndarray
    traj: spline.Trajectory  # GT trajectory
    cam: PinholeCamera
    pano: EquirectangularCamera
    # events
    t: np.ndarray
    x: np.ndarray
    y: np.ndarray
    pol: np.ndarray


def generate(
    rng,
    sensor: PinholeCamera,
    pano_width: int = 256,
    pano_height: int = 128,
    c_th: float = 0.2,
    t_beg: float = 0.0,
    t_end: float = 1.0,
    dt_knots: float = 0.05,
    num_steps: int = 400,
    motion_amp: float = 0.25,
    order: int = 2,
    brightness: np.ndarray | None = None,
) -> SyntheticScene:
    """Render an event stream by threshold-crossing the warped brightness.

    Each sensor pixel tracks the panorama brightness under its bearing as the
    camera rotates; an event fires whenever the change since the last event
    crosses +-c_th (the ideal event-generation model the LEGM linearizes).
    """
    H, W = pano_height, pano_width
    if brightness is None:
        brightness = smooth_random_map(H, W, rng, smooth=max(5, H // 16))
    gx, gy = sobel_gradients_np(brightness)

    # Ground-truth smooth trajectory: sinusoidal rotation-vector path.
    tt = np.linspace(t_beg, t_end, 200)
    f = rng.uniform(0.5, 1.5, size=3)
    ph = rng.uniform(0, 2 * np.pi, size=3)
    amp = motion_amp * rng.uniform(0.5, 1.0, size=3)
    rotvec = np.stack(
        [amp[i] * np.sin(2 * np.pi * f[i] * tt + ph[i]) for i in range(3)], axis=-1
    )
    rotvec -= rotvec[0]  # start at identity
    R = spline._np_exp(rotvec)
    traj = spline.Trajectory.from_poses(tt, R, t_beg, t_end, dt_knots, order)

    pano = EquirectangularCamera(W, H)
    bearings = sensor.bearing_lut()  # (P, 3)
    num_pix = bearings.shape[0]

    # March time; per step warp all bearings and sample brightness.
    ts = np.linspace(t_beg, t_end - 1e-9, num_steps)
    s, u = traj.locate(ts)
    Rts = np.asarray(spline.evaluate(traj.knots, s, u, order, need_jacobian=False))

    ref = None
    prev_val = None
    ev_t, ev_p, ev_pol = [], [], []
    fx_p = pano.fx
    fy_p = pano.fy
    cx_p, cy_p = W / 2.0, H / 2.0
    dt_step = ts[1] - ts[0]
    for k in range(num_steps):
        rb = bearings @ Rts[k].T
        phi = np.arctan2(rb[:, 0], rb[:, 2])
        theta = np.arcsin(np.clip(rb[:, 1] / np.linalg.norm(rb, axis=1), -1, 1))
        px = cx_p + phi * fx_p
        py = cy_p + theta * fy_p
        val = bilinear_sample(brightness, px, py)
        if ref is None:
            ref = val.copy()
            prev_val = val.copy()
            continue
        while True:
            diff = val - ref
            fire_pos = diff >= c_th
            fire_neg = diff <= -c_th
            fire = fire_pos | fire_neg
            if not fire.any():
                break
            idx = np.nonzero(fire)[0]
            new_ref = ref[idx] + np.where(fire_pos[idx], c_th, -c_th)
            # Sub-step crossing time by linear interpolation of the
            # brightness trajectory within [t_{k-1}, t_k]: without this the
            # timestamp quantization dominates the model's residual floor.
            denom = val[idx] - prev_val[idx]
            denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
            frac = np.clip((new_ref - prev_val[idx]) / denom, 0.0, 1.0)
            ev_t.append(ts[k] - dt_step + frac * dt_step)
            ev_p.append(idx)
            ev_pol.append(fire_pos[idx].astype(np.int8))
            ref[idx] = new_ref
        prev_val = val.copy()

    t = np.concatenate(ev_t) if ev_t else np.zeros(0)
    p = np.concatenate(ev_p) if ev_p else np.zeros(0, np.int64)
    pol = np.concatenate(ev_pol) if ev_pol else np.zeros(0, np.int8)
    order_idx = np.argsort(t, kind="stable")
    return SyntheticScene(
        brightness=brightness,
        gx=gx,
        gy=gy,
        traj=traj,
        cam=sensor,
        pano=pano,
        t=t[order_idx],
        x=(p[order_idx] % sensor.width).astype(np.int32),
        y=(p[order_idx] // sensor.width).astype(np.int32),
        pol=pol[order_idx],
    )


def default_sensor(width: int = 64, height: int = 64, f: float = 60.0) -> PinholeCamera:
    """A small synthetic pinhole sensor (playroom-style: square, no
    distortion; cf. calib/DVS-playroom.yaml)."""
    K = np.array([[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1.0]])
    return PinholeCamera.from_calib(width, height, K)
