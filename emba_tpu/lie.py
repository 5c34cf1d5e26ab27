"""SO(3) Lie-group core: exp/log, hat/vee, left Jacobians, quaternion interop.

TPU-native rewrite of the rotation machinery the reference gets from Sophus and
``so3_utils`` (reference: ``include/utils/so3_funcs.h:18-59``,
``thirdparty/basalt-headers/include/basalt/utils/sophus_utils.hpp:155-373``).

Everything here is pure ``jnp``, shape-polymorphic over leading batch axes, and
safe under ``vmap``/``grad``/``jit``:

* rotations are 3x3 matrices (MXU-friendly; quaternions only at IO boundaries),
* every small-angle branch uses the double-``where`` trick so gradients never
  see a 0/0,
* no data-dependent Python control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

# Angle below which Taylor expansions are used. Conservative for f32; the
# expansions below are accurate to ~eps^2 at this threshold in f64 as well.
_SMALL_ANGLE = 1e-5


def hat(v):
    """Skew-symmetric (hat) operator. v: (..., 3) -> (..., 3, 3).

    Convention: ``hat(v) @ w == cross(v, w)`` (reference:
    ``so3_funcs.h:18-25`` ``v2skew``).
    """
    v = jnp.asarray(v)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """Inverse of :func:`hat` for (approximately) skew-symmetric matrices.

    Uses the symmetrized extraction (reference: ``so3_funcs.h:29-36``).
    """
    m = jnp.asarray(m)
    return 0.5 * jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )


def _theta(v):
    """Rotation angle machinery for grad-safe small-angle branching.

    Returns (theta2, theta_safe, is_small): ``theta2`` is the true squared
    angle (safe to use in Taylor terms); ``theta_safe`` equals 1 where
    ``is_small`` so divisions in the non-Taylor branch never produce NaN/Inf,
    even in the unused branch of a ``where`` (whose cotangent still
    propagates).
    """
    theta2 = jnp.sum(v * v, axis=-1)
    is_small = theta2 < _SMALL_ANGLE**2
    theta2_safe = jnp.where(is_small, jnp.ones_like(theta2), theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    return theta2, theta_safe, is_small


def exp(v):
    """SO(3) exponential map (Rodrigues). v: (..., 3) -> (..., 3, 3)."""
    v = jnp.asarray(v)
    theta2, theta_safe, is_small = _theta(v)
    K = hat(v)
    K2 = K @ K
    # sin(t)/t and (1-cos t)/t^2 with Taylor guards.
    st = jnp.sin(theta_safe)
    ct = jnp.cos(theta_safe)
    a = jnp.where(is_small, 1.0 - theta2 / 6.0, st / theta_safe)
    b = jnp.where(is_small, 0.5 - theta2 / 24.0, (1.0 - ct) / theta_safe**2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def log(R):
    """SO(3) logarithm. R: (..., 3, 3) -> (..., 3).

    Handles the small-angle case by Taylor expansion and stays finite up to
    ``theta`` slightly below pi; exactly-pi rotations are resolved through the
    quaternion path in :func:`rotvec_from_quat` if needed. For the BA use-case
    (relative rotations between neighboring spline knots, always << pi:
    reference ``so3_spline.h:250-251``) this branch structure is exact.
    """
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # |w|^2 = 4 sin^2(theta): a grad-safe theta^2 proxy for the Taylor branch
    # (theta^2 = |w|^2/4 + O(theta^4)). The threshold on cos works in f32 too
    # (cos cannot resolve 1 - eps for tiny theta).
    is_small = cos_theta > 1.0 - 1e-7
    wn2 = jnp.sum(w * w, axis=-1)
    # Guard arccos/sqrt away from the |cos| = 1 poles in the unused branch so
    # their infinite derivatives never poison the gradient (double-where).
    cos_safe = jnp.where(is_small, jnp.zeros_like(cos_theta), cos_theta)
    theta = jnp.arccos(cos_safe)
    sin_safe = jnp.sqrt(jnp.maximum(1.0 - cos_safe * cos_safe, 1e-24))
    # theta / (2 sin(theta)); Taylor: 0.5 + theta^2/12 with theta^2 ~ wn2/4.
    k = jnp.where(is_small, 0.5 + wn2 / 48.0, theta / (2.0 * sin_safe))
    return k[..., None] * w


def left_jacobian(v):
    """Left Jacobian of SO(3): Jl(v) (reference ``so3_funcs.h:39-47``).

    Jl = I + (1-cos t)/t^2 hat(v) + (t - sin t)/t^3 hat(v)^2
    """
    v = jnp.asarray(v)
    theta2, theta_safe, is_small = _theta(v)
    K = hat(v)
    K2 = K @ K
    st, ct = jnp.sin(theta_safe), jnp.cos(theta_safe)
    a = jnp.where(is_small, 0.5 - theta2 / 24.0, (1.0 - ct) / theta_safe**2)
    b = jnp.where(
        is_small, 1.0 / 6.0 - theta2 / 120.0, (theta_safe - st) / theta_safe**3
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def left_jacobian_inv(v):
    """Inverse left Jacobian of SO(3) (reference ``so3_funcs.h:50-59``).

    Jl^-1 = I - hat(v)/2 + (1/t^2 - (1+cos t)/(2 t sin t)) hat(v)^2
    """
    v = jnp.asarray(v)
    theta2, theta_safe, is_small = _theta(v)
    K = hat(v)
    K2 = K @ K
    st, ct = jnp.sin(theta_safe), jnp.cos(theta_safe)
    st_safe = jnp.where(jnp.abs(st) < 1e-30, jnp.ones_like(st), st)
    c = jnp.where(
        is_small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / theta_safe**2 - (1.0 + ct) / (2.0 * theta_safe * st_safe),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye - 0.5 * K + c[..., None, None] * K2


def right_jacobian(v):
    """Right Jacobian: Jr(v) = Jl(-v)."""
    return left_jacobian(-jnp.asarray(v))


def right_jacobian_inv(v):
    """Inverse right Jacobian: Jr^-1(v) = Jl^-1(-v)."""
    return left_jacobian_inv(-jnp.asarray(v))


# ---------------------------------------------------------------------------
# Quaternion interop (IO boundary: TUM trajectory files store x,y,z,w).
# ---------------------------------------------------------------------------


def quat_to_matrix(q):
    """Unit quaternion (..., 4) in (x, y, z, w) order -> rotation matrix."""
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R):
    """Rotation matrix -> unit quaternion (x, y, z, w), w >= 0.

    Branch-free Shepperd-style extraction that is stable for every rotation
    (including theta ~ pi): build all four candidate quaternions scaled by
    their pivot and select the one with the largest pivot.
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot (first entry) is largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4 comps wxyz)
    q_wxyz = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q_wxyz = q_wxyz / jnp.linalg.norm(q_wxyz, axis=-1, keepdims=True)
    # Canonical sign (w >= 0) then reorder to (x, y, z, w).
    q_wxyz = jnp.where(q_wxyz[..., :1] < 0, -q_wxyz, q_wxyz)
    return jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)


def slerp(R1, R2, alpha):
    """Geodesic interpolation R1 * exp(alpha * log(R1^T R2)).

    Reference: ``src/utils/pose_manager.cpp:100-106`` and
    ``trajectory.cpp:16-18``.
    """
    alpha = jnp.asarray(alpha)
    rel = jnp.swapaxes(R1, -1, -2) @ R2
    return R1 @ exp(alpha[..., None] * log(rel))
