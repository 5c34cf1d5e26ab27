"""Spline tests: closed-form N=2 oracle, numerical Jacobians for N=2..6,
fitting round-trips. Ports the reference's two key oracles:

* linear-spline Jacobian closed form ``[I - A(u), A(u)]``,
  ``A(u) = u Jl(u phi) Jl^-1(phi)``, ``phi = log(P1 P0^-1)``
  (reference ``src/test/event_map_test.cpp:131-155``),
* central-difference numerical Jacobians vs analytic
  (basalt ``test/src/test_spline.cpp:313-548`` pattern).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from emba_tpu import lie, spline

RNG = np.random.default_rng(42)


def random_knots(k, scale=0.3):
    """Knots forming a smooth-ish trajectory (increments well below pi)."""
    increments = RNG.normal(size=(k, 3)) * scale
    R = [np.asarray(lie.exp(increments[0]))]
    for i in range(1, k):
        R.append(R[-1] @ np.asarray(lie.exp(increments[i])))
    return np.stack(R)


def test_blending_matrix_linear():
    m = spline.blending_matrix(2, cumulative=False)
    np.testing.assert_allclose(m, [[1.0, -1.0], [0.0, 1.0]].__class__([[1, -1], [0, 1]]) and np.array([[1.0, -1.0], [0.0, 1.0]]))
    mc = spline.blending_matrix(2, cumulative=True)
    np.testing.assert_allclose(mc, np.array([[1.0, 0.0], [0.0, 1.0]]))


def test_blending_matrix_cubic():
    # Reference basis M4 (trajectory.cpp:518-521) is U @ M with row/col
    # convention transposed vs ours; check our coeff = M @ [1,u,u^2,u^3]
    # reproduces the classic uniform cubic B-spline basis functions.
    m = spline.blending_matrix(4, cumulative=False)
    for u in [0.0, 0.25, 0.5, 0.9]:
        p = np.array([1.0, u, u**2, u**3])
        w = m @ p
        expect = np.array(
            [
                (1 - u) ** 3 / 6.0,
                (3 * u**3 - 6 * u**2 + 4) / 6.0,
                (-3 * u**3 + 3 * u**2 + 3 * u + 1) / 6.0,
                u**3 / 6.0,
            ]
        )
        np.testing.assert_allclose(w, expect, atol=1e-12)
        assert abs(w.sum() - 1.0) < 1e-12  # partition of unity


def test_linear_evaluate_is_slerp():
    knots = random_knots(5)
    u = np.array([0.0, 0.3, 0.77, 1.0 - 1e-12])
    s = np.array([0, 1, 2, 3], dtype=np.int32)
    R = spline.evaluate(knots, s, u, order=2, need_jacobian=False)
    for i in range(4):
        expect = lie.slerp(knots[s[i]], knots[s[i] + 1], u[i])
        np.testing.assert_allclose(np.asarray(R[i]), np.asarray(expect), atol=1e-12)


def test_linear_jacobian_closed_form():
    """Cross-validate against the reference's own derivation
    (event_map_test.cpp:143-153)."""
    knots = random_knots(4)
    u = np.array([0.15, 0.5, 0.92])
    s = np.array([0, 1, 2], dtype=np.int32)
    _, J = spline.evaluate(knots, s, u, order=2, need_jacobian=True)
    for i in range(3):
        P0, P1 = knots[s[i]], knots[s[i] + 1]
        phi = np.asarray(lie.log(P1 @ P0.T))  # left-relative increment
        A = u[i] * np.asarray(lie.left_jacobian(u[i] * phi)) @ np.asarray(
            lie.left_jacobian_inv(phi)
        )
        np.testing.assert_allclose(np.asarray(J[i, 0]), np.eye(3) - A, atol=1e-9)
        np.testing.assert_allclose(np.asarray(J[i, 1]), A, atol=1e-9)


@pytest.mark.parametrize("order", [2, 3, 4, 5, 6])
def test_jacobian_numerical(order):
    """Central differences on left-perturbed knots vs analytic Jacobian.

    d(left-pert of R(t)) / d(left-pert of knot j):
      lhs column k = log( R(knots with P_j <- exp(e_k eps) P_j) @ R0^T ) / eps
    """
    knots = random_knots(order + 3)
    u = np.array([0.37, 0.81])
    s = np.array([0, 2], dtype=np.int32)
    R0, J = spline.evaluate(knots, s, u, order=order, need_jacobian=True)
    R0 = np.asarray(R0)
    eps = 1e-7
    for q in range(2):
        for j in range(order):
            num = np.zeros((3, 3))
            for k in range(3):
                d = np.zeros(3)
                d[k] = eps
                pert = knots.copy()
                pert[s[q] + j] = np.asarray(lie.exp(d)) @ pert[s[q] + j]
                Rp = np.asarray(
                    spline.evaluate(pert, s[q : q + 1], u[q : q + 1], order, False)
                )[0]
                num[:, k] = np.asarray(lie.log(Rp @ R0[q].T)) / eps
            np.testing.assert_allclose(
                np.asarray(J[q, j]), num, atol=1e-5, rtol=1e-4
            )


@pytest.mark.parametrize("order", [2, 4])
def test_fit_roundtrip(order):
    """Sampling a spline and re-fitting approximately recovers the knots.

    Lift-solve-retract is exact only to second order in the increments
    (which is why the reference fits long spans chunk-by-chunk,
    trajectory.h:79-87); with small increments the recovery error is O(inc^2).
    """
    dt = 0.05
    n_k = 6
    knots = random_knots(n_k, scale=0.01)
    t_beg = 10.0
    # dense pose samples covering all segments
    t = np.linspace(t_beg, t_beg + (n_k - order + 1) * dt - 1e-6, 200)
    s, u = spline.locate(t, t_beg, dt, n_k, order)
    R = np.asarray(spline.evaluate(knots, s, u, order, need_jacobian=False))
    fitted = spline.fit_knots(t, R, t_beg, dt, n_k, order)
    err = np.asarray(lie.log(jnp.asarray(fitted) @ jnp.asarray(knots).swapaxes(-1, -2)))
    assert np.abs(err).max() < 5e-3


def test_fit_long_matches_eval():
    """Chunked long-interval fit reproduces the sampled trajectory."""
    dt = 0.05
    order = 2
    t_beg, t_end = 0.0, 1.0
    # ground-truth smooth motion
    tt = np.linspace(t_beg, t_end, 400)
    rotvec = np.stack(
        [0.3 * np.sin(2 * tt), 0.2 * tt, 0.1 * np.cos(3 * tt)], axis=-1
    )
    R = np.asarray(lie.exp(rotvec))
    traj = spline.Trajectory.from_poses(tt, R, t_beg, t_end, dt, order)
    assert traj.num_knots == int(round((t_end - t_beg) / dt)) + order - 1
    Re = np.asarray(traj.evaluate(tt[5:-5]))
    err = np.asarray(lie.log(jnp.asarray(Re) @ R[5:-5].swapaxes(-1, -2)))
    assert np.degrees(np.abs(err).max()) < 0.25  # spline approx error budget


def test_trajectory_ops():
    knots = random_knots(8)
    traj = spline.Trajectory(t_beg=1.0, dt=0.1, knots=knots, order=2)
    seg = traj.segment(2, 6)
    assert seg.num_knots == 4
    assert abs(seg.t_beg - 1.2) < 1e-12
    upd = seg.incremental_update(np.full((4, 3), 0.01))
    # left-multiplicative update
    expect = np.asarray(lie.exp(np.full(3, 0.01))) @ knots[2]
    np.testing.assert_allclose(upd.knots[0], expect, atol=1e-12)
    traj2 = traj.clone()
    traj2.replace_with(upd, 4, 0, 2)
    np.testing.assert_allclose(traj2.knots[2], expect, atol=1e-12)
    np.testing.assert_allclose(traj2.knots[6], knots[6], atol=1e-15)


def test_write_tum(tmp_path):
    knots = random_knots(4)
    traj = spline.Trajectory(t_beg=2.0, dt=0.05, knots=knots, order=2)
    p = tmp_path / "traj.txt"
    traj.write_tum(str(p), time_offset=1.0)
    data = np.loadtxt(p)
    assert data.shape == (4, 8)
    np.testing.assert_allclose(data[:, 0], [1.0, 1.05, 1.1, 1.15], atol=1e-9)
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(data[:, 4:8])))
    np.testing.assert_allclose(R, knots, atol=1e-9)


@pytest.mark.parametrize("order", [2, 3, 4, 5, 6])
def test_body_derivatives_numerical(order):
    """velocity/acceleration/jerk in the body frame vs central differences
    (basalt so3_spline.h:321-740 velocityBody/accelerationBody/jerkBody,
    test_spline.cpp pattern: FD of the evaluated rotation / of the analytic
    lower derivative)."""
    knots = random_knots(order + 4)
    dt = 0.2
    t = np.array([0.42, 1.13 * dt / 0.2])  # two interior query times
    num_knots = len(knots)

    def at(tq, degree):
        s, u = spline.locate(tq, 0.0, dt, num_knots, order)
        return spline.evaluate_derivatives(knots, s, u, dt, order, degree)

    R, w, a, j = at(t, 3)
    R = np.asarray(R)
    h = 1e-5
    # omega_b: vee(R^T dR/dt) via symmetric difference of the rotation
    Rm = np.asarray(at(t - h, 1)[0])
    Rp = np.asarray(at(t + h, 1)[0])
    for q in range(len(t)):
        w_num = np.asarray(lie.log(jnp.asarray(Rm[q].T @ Rp[q]))) / (2 * h)
        np.testing.assert_allclose(np.asarray(w[q]), w_num, atol=1e-6,
                                   rtol=1e-5)
    # alpha_b: FD of the analytic omega; jerk: FD of the analytic alpha
    _, w_m, a_m = at(t - h, 2)
    _, w_p, a_p = at(t + h, 2)
    np.testing.assert_allclose(
        np.asarray(a), (np.asarray(w_p) - np.asarray(w_m)) / (2 * h),
        atol=1e-6, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(j), (np.asarray(a_p) - np.asarray(a_m)) / (2 * h),
        atol=1e-5, rtol=1e-4,
    )


def test_body_velocity_linear_closed_form():
    """N=2: omega_b is the constant geodesic rate log(P0^-1 P1)/dt inside a
    segment (slerp), a closed-form anchor independent of the recursion."""
    knots = random_knots(3)
    dt = 0.5
    s = np.array([0, 1], dtype=np.int32)
    u = np.array([0.2, 0.7])
    _, w = spline.evaluate_derivatives(knots, s, u, dt, 2, degree=1)
    for q in range(2):
        expect = np.asarray(
            lie.log(jnp.asarray(knots[s[q]].T @ knots[s[q] + 1]))
        ) / dt
        np.testing.assert_allclose(np.asarray(w[q]), expect, atol=1e-9)
