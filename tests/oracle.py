"""Loop-based numpy oracle of the reference LEGM pipeline.

Mirrors the *control flow* of ``src/emba/model.cpp`` (event batches, per-pixel
event-map pairing, cumulative normal-equation assembly, dense Schur solve)
with straightforward Python loops, for cross-validation of the vectorized
TPU model at small sizes. Written against the reference's math as documented
in SURVEY.md Appendix A — not a copy of its code.
"""

import numpy as np

from emba_tpu import spline
from emba_tpu.camera import EquirectangularCamera
from emba_tpu.synth import sobel_gradients_np


def second_order_np(Gx, Gy):
    gxx, gxy = sobel_gradients_np(Gx)
    gyx, gyy = sobel_gradients_np(Gy)
    return gxx, 0.5 * (gxy + gyx), gyy


def warp_one(bearing, R, pano: EquirectangularCamera):
    rb = R @ bearing
    x, y, z = rb
    rho = np.sqrt(x * x + y * y + z * z)
    phi = np.arctan2(x, z)
    theta = np.arcsin(y / rho)
    fx, fy = pano.fx, pano.fy
    pm = np.array([pano.width / 2.0 + phi * fx, pano.height / 2.0 + theta * fy])
    # analytic jacobian (equirectangular_camera.h:31-43 form)
    xdivz = x / z
    tmp1 = fx / ((1 + xdivz * xdivz) * z)
    ydivrho = y / rho
    tmp2 = -fy / np.sqrt(1 - ydivrho * ydivrho)
    tmp3 = ydivrho / (rho * rho)
    dpm_drb = np.array(
        [
            [tmp1, 0.0, -tmp1 * xdivz],
            [tmp2 * tmp3 * x, tmp2 * (tmp3 * y - 1 / rho), tmp2 * tmp3 * z],
        ]
    )
    drb_drot = np.array([[0, z, -y], [-z, 0, x], [y, -x, 0]])  # -hat(rb)
    return rb, pm, dpm_drb @ drb_drot


def evaluate_and_form(
    traj: spline.Trajectory,
    Gx,
    Gy,
    t,
    x,
    y,
    pol,
    bearing_lut,
    sensor_width,
    cfg,
    batch=100,
):
    """Reference-faithful evaluateDataError + formNormalEq (+L2 reg).

    Returns dict with ep (dense over events; nan for non-measurements),
    num_ev_map, A11, A12(active-compact), A22 blocks, b1, b2, active set,
    cost_data, and per-event intermediates.
    """
    H, W = cfg.pano_height, cfg.pano_width
    pano = EquirectangularCamera(W, H)
    n = (len(t) // batch) * batch
    nb = n // batch

    gxx, gxy, gyy = second_order_np(Gx, Gy)

    # --- warp all events, batch-shared poses -----------------------------
    pm_all = np.zeros((n, 2))
    J_all = np.zeros((n, 2, 3 * traj.order))
    cp_all = np.zeros(n, dtype=int)
    for b in range(nb):
        lo, hi = b * batch, (b + 1) * batch
        tmid = t[lo] + 0.5 * (t[hi - 1] - t[lo])
        s, u = traj.locate(np.array([tmid]))
        R, Jk = spline.evaluate(traj.knots, s, u, traj.order, True)
        R = np.asarray(R)[0]
        Jk = np.asarray(Jk)[0]  # (order, 3, 3)
        for k in range(lo, hi):
            bearing = bearing_lut[y[k] * sensor_width + x[k]]
            _, pm, dpm_drot = warp_one(bearing, R, pano)
            pm_all[k] = pm
            cp_all[k] = s[0]
            J_all[k] = dpm_drot @ np.concatenate([Jk[i] for i in range(traj.order)], 1)

    # --- per-pixel pairing + residuals (event map) -----------------------
    from collections import defaultdict

    event_map = defaultdict(list)
    for k in range(n):
        event_map[(x[k], y[k])].append(k)

    # map sampling point: curr event (reference) or the pair midpoint
    # (cfg.sample_mode="mid" — see emba_tpu.model.ModelConfig.sample_mode)
    midpoint = getattr(cfg, "sample_mode", "curr") == "mid"
    num_ev_map = np.zeros((H, W), dtype=int)
    meas = []  # (k_curr, k_prev, e, dp, tempP [prev-side coeff], temp, pm_pix)
    for pix, lst in sorted(event_map.items()):
        for j in range(1, len(lst)):
            kc, kp = lst[j], lst[j - 1]
            dp = pm_all[kc] - pm_all[kp]
            if np.linalg.norm(dp) > cfg.outlier_dp_norm:
                continue
            sp = 0.5 * (pm_all[kc] + pm_all[kp]) if midpoint else pm_all[kc]
            pmx = int(np.round(sp[0]))
            pmy = int(np.round(sp[1]))
            pmx = min(max(pmx, 0), W - 1)
            pmy = min(max(pmy, 0), H - 1)
            Gpm = np.array([Gx[pmy, pmx], Gy[pmy, pmx]])
            c_pred = Gpm @ dp
            c_meas = 2 * (pol[kc] - 0.5) * cfg.c_th
            e = c_meas - c_pred
            num_ev_map[pmy, pmx] += 1
            G2 = np.array(
                [[gxx[pmy, pmx], gxy[pmy, pmx]], [gxy[pmy, pmx], gyy[pmy, pmx]]]
            )
            if midpoint:
                temp = Gpm + 0.5 * (dp @ G2)  # curr-side coefficient
                tempP = 0.5 * (dp @ G2) - Gpm  # prev-side coefficient
            else:
                temp = Gpm + dp @ G2
                tempP = -Gpm
            meas.append((kc, kp, e, dp, tempP, temp, pmy * W + pmx))

    cost_data = 0.5 * sum(m[2] ** 2 for m in meas)

    # --- active pixels ----------------------------------------------------
    active = num_ev_map.reshape(-1) >= cfg.thres_valid_pixel
    active_ids = {p: i for i, p in enumerate(np.nonzero(active)[0])}
    n_act = len(active_ids)

    # --- normal equations -------------------------------------------------
    K = traj.num_knots
    D = 3 * traj.order
    A11 = np.zeros((3 * K, 3 * K))
    b1 = np.zeros(3 * K)
    A12 = np.zeros((3 * K, 2 * n_act))
    A22 = [np.zeros((2, 2)) for _ in range(n_act)]
    b2 = np.zeros(2 * n_act)

    for kc, kp, e, dp, tempP, temp, pmpix in meas:
        if not active[pmpix]:
            continue
        ai = active_ids[pmpix]
        if cfg.use_irls:
            if cfg.cost_type == "cauchy":
                yi = 1.0 / (1.0 + cfg.eta * e * e)
            else:
                yi = 1.0 if abs(e) < cfg.eta else cfg.eta / abs(e)
        else:
            yi = 1.0
        ew = yi * e
        dMdG = dp
        A22[ai] += yi * np.outer(dMdG, dMdG)
        b2[2 * ai : 2 * ai + 2] += dMdG * ew

        Jc = temp @ J_all[kc]  # (D,)
        Jp = tempP @ J_all[kp]
        sc, sp = 3 * cp_all[kc], 3 * cp_all[kp]
        A11[sc : sc + D, sc : sc + D] += yi * np.outer(Jc, Jc)
        A11[sp : sp + D, sp : sp + D] += yi * np.outer(Jp, Jp)
        crs = yi * np.outer(Jc, Jp)
        A11[sc : sc + D, sp : sp + D] += crs
        A11[sp : sp + D, sc : sc + D] += crs.T
        b1[sc : sc + D] += Jc * ew
        b1[sp : sp + D] += Jp * ew
        A12[sc : sc + D, 2 * ai] += yi * Jc * dMdG[0]
        A12[sc : sc + D, 2 * ai + 1] += yi * Jc * dMdG[1]
        A12[sp : sp + D, 2 * ai] += yi * Jp * dMdG[0]
        A12[sp : sp + D, 2 * ai + 1] += yi * Jp * dMdG[1]

    # --- L2 regularizer (applyL2Reg) -------------------------------------
    gflat = np.stack([Gx.reshape(-1), Gy.reshape(-1)], -1)
    for pmpix, ai in active_ids.items():
        A22[ai] += cfg.alpha * np.eye(2)
        b2[2 * ai : 2 * ai + 2] -= cfg.alpha * gflat[pmpix]

    return dict(
        pm=pm_all,
        cp=cp_all,
        J=J_all,
        num_ev_map=num_ev_map,
        cost_data=cost_data,
        A11=A11,
        A12=A12,
        A22=A22,
        b1=b1,
        b2=b2,
        active=active,
        active_ids=active_ids,
        meas=meas,
    )


def schur_solve(res, lam, fix_first=False):
    """Dense Schur solve on the oracle system (model.cpp:721-792 flow)."""
    A11, A12, b1, b2 = res["A11"], res["A12"], res["b1"], res["b2"]
    A22 = res["A22"]
    if fix_first:
        A11 = A11[3:, 3:]
        A12 = A12[3:, :]
        b1 = b1[3:]
    A11m = A11 + lam * np.diag(np.diag(A11))
    n_act = len(A22)
    A22inv = np.zeros((2 * n_act, 2 * n_act))
    for i, blk in enumerate(A22):
        m = blk + lam * np.diag(np.diag(blk))
        A22inv[2 * i : 2 * i + 2, 2 * i : 2 * i + 2] = np.linalg.inv(m)
    W_ = A12 @ A22inv
    S = A11m - W_ @ A12.T
    x1 = np.linalg.solve(S, b1 - W_ @ b2)
    x2 = A22inv @ (b2 - A12.T @ x1)
    if fix_first:
        x1 = np.concatenate([np.zeros(3), x1])
    return x1, x2
