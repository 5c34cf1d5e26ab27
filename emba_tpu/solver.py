"""Levenberg-Marquardt driver for one time window.

Re-implements the reference's ``EMBA::solveTimeWindow``
(``src/emba/solver.cpp:11-368``) with the same control flow:

* lambda init 1e-3, bounds [1e-300, 1e3], x10 / /10 schedule
  (``solver.cpp:15-17, 311, 349``),
* relinearize only after an accepted step (``solver.cpp:66-103``) — the trial
  evaluation already produces the next linearization, which is reused,
* convergence when the relative cost change is below ``tol_fun`` for
  ``num_times_tol_fun_sat`` consecutive accepted iterations
  (``solver.cpp:319-340``),
* first-window gauge fixing of the first control pose (``solver.cpp:156-165,
  226-234``) via masking,
* per-phase instrumentation mirroring the reference's ENABLE_CHRONO counters
  (``solver.cpp:105-151, 181-222, 242-294``) plus an events/s metric.

The loop runs on the host (cheap scalar decisions, ~50 iterations), but every
piece of device work is fused into exactly TWO jitted calls per iteration
(``form_normal_eq`` on accept; the solve+update+trial step always) — on a
remote-attached TPU, eager dispatches cost more than the math.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import model as M


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """Reference ``LMSettings`` (include/emba/params.h:4-13)."""

    max_num_iter: int = 50
    tol_fun: float = 1e-3
    num_times_tol_fun_sat: int = 2
    lambda_init: float = 1e-3
    lambda_max: float = 1e3
    lambda_min: float = 1e-300


@dataclasses.dataclass
class LMStats:
    """Per-window instrumentation.

    Phase times mirror the reference's ENABLE_CHRONO counters
    (solver.cpp:105-151, 181-222, 242-294). Each phase is a SEPARATE jitted
    call timed with a value-fetch sync (``float()`` of a scalar output —
    ``jax.block_until_ready`` does not reliably block on the remote-TPU
    transport, so phase boundaries are synced by fetching a scalar that
    depends on the whole phase computation). The fused on-device LM loop is
    one program with no internal phase boundaries: it reports
    ``time_total_s`` ONLY and leaves the phase times at 0 (never estimated
    splits).
    """

    iterations: list = dataclasses.field(default_factory=list)  # per-iter dicts
    time_form_s: float = 0.0
    time_solve_s: float = 0.0
    time_objective_s: float = 0.0
    # Wall time of the whole LM loop (host loop: ~= sum of phases; fused
    # loop: the only measured quantity).
    time_total_s: float = 0.0
    count_form: int = 0
    count_solve: int = 0
    count_objective: int = 0
    num_events: int = 0
    # Np per form call (reference logs it per iteration, solver.cpp:283-293)
    # and measurements dropped by compaction-cap overflow per form call.
    active_px_per_form: list = dataclasses.field(default_factory=list)
    dropped_meas_per_form: list = dataclasses.field(default_factory=list)
    # Active pixels beyond the compaction cap in this window (fused mode
    # can't count dropped measurements exactly; this is the pixel-level
    # overflow observed post-hoc — 0 means no truncation).
    overflow_active_pixels: int = 0
    converged: bool = False
    sync_method: str = "value-fetch"
    # Execution mode this window ran under (pipeline.py: fused / host /
    # fused-sharded / host-sharded, "+(fused-cap-fallback)" when the fused
    # event cap forced the host loop).
    lm_mode: str = ""

    @property
    def num_active_pixels(self) -> int:
        """Last observed Np (back-compat accessor)."""
        return self.active_px_per_form[-1] if self.active_px_per_form else 0

    def note_active_pixels(self, np_count: int):
        self.active_px_per_form.append(int(np_count))

    def events_per_second(self) -> dict:
        """Throughput per instrumented phase (the BASELINE.md metric).

        Phases with zero measured time (e.g. fused mode) are reported as
        None, not fabricated from a split of the total.
        """
        out = {}
        for name, t, c in [
            ("form", self.time_form_s, self.count_form),
            ("solve", self.time_solve_s, self.count_solve),
            ("objective", self.time_objective_s, self.count_objective),
        ]:
            out[name] = (self.num_events * c / t) if t > 0 else None
        total = self.time_total_s or (
            self.time_form_s + self.time_solve_s + self.time_objective_s
        )
        n_iter = max(self.count_objective, 1)
        out["total"] = self.num_events * n_iter / total if total > 0 else None
        return out


@partial(jax.jit, static_argnames=("cfg",))
def _init_costs(knots, Gx, Gy, dev, cfg):
    """Linearization + cost (solver.cpp:71-92), one jitted call."""
    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
    return lin, M.data_cost(lin.e, cfg), M.reg_cost(Gx, Gy, cfg.alpha)


@partial(jax.jit, static_argnames=("cfg",))
def _init_costs_trial(knots, Gx, Gy, dev, cfg):
    """LIGHT-TRIAL objective (``cfg.light_trial``): cost + the (N,)-resident
    light linearization — NO (D, N) Jacobians, no (2+2D, N) prev gather.
    The forming pass (``form_normal_eq_light``) recomputes the Jacobians
    after ACCEPTED steps only, matching the reference's relinearize-on-
    accept trial structure (solver.cpp:66-103)."""
    lin = M.linearize(knots, Gx, Gy, dev, cfg, False)
    return lin, M.data_cost(lin.e, cfg), M.reg_cost(Gx, Gy, cfg.alpha)


@partial(jax.jit, static_argnames=("cfg",))
def _init_costs_light(knots, Gx, Gy, dev, cfg, pb, pbid):
    """Light-tier objective (``cfg.stream_light``): CHUNK-streamed light
    linearization — the (N,)-sized residual fields it retains feed the
    Jacobian-only streamed forming pass
    (:func:`model._make_stream_chunk_fn_light`). Chunked evaluation runs
    ~2x faster than the one-pass need_deriv=False linearize at 10^7 events
    (intermediates stay cache-resident instead of round-tripping HBM)."""
    lin, cost_data = M.linearize_streamed_light(
        knots, Gx, Gy, dev, cfg, prev_bearings=pb, prev_bids=pbid
    )
    return lin, cost_data, M.reg_cost(Gx, Gy, cfg.alpha)


@partial(jax.jit, static_argnames=("cfg",))
def _init_costs_streamed(knots, Gx, Gy, dev, cfg, pb, pbid):
    """Streamed objective (solver.cpp:71-92): cost + the (HW,) activity map,
    chunk-recomputed — NO O(N) linearization output survives the call (the
    streamed forming pass recomputes Jacobians chunk-wise too). ``pb``/
    ``pbid`` are the once-per-window prev records (:func:`model.prev_records`)."""
    cost_data, nem = M.cost_and_activity_streamed(
        knots, Gx, Gy, dev, cfg, prev_bearings=pb, prev_bids=pbid
    )
    return nem, cost_data, M.reg_cost(Gx, Gy, cfg.alpha)


@partial(jax.jit, static_argnames=("fix_first", "use_cg"))
def _solve_update(knots, Gx, Gy, neq, lam, damping, fix_first, use_cg):
    """Schur/CG solve + trial state (solver.cpp:189-240), one jitted call.
    The last output is a sync scalar: fetching it on host waits for the whole
    phase (value-fetch timing; no eager ops through the transport)."""
    if use_cg:
        x1, x2, cg_it, cg_err = M.solve_normal_eq_cg(neq, lam, fix_first)
    else:
        x1, x2 = M.solve_normal_eq(neq, lam, fix_first)
        cg_it = jnp.asarray(0)
        cg_err = jnp.asarray(0.0, x1.dtype)
    knots_new = M.update_knots(knots, x1, fix_first)
    gx_new, gy_new = M.update_map(Gx, Gy, x2, damping, neq)
    sync = x1[0] + gx_new[0, 0] + gy_new[0, 0] + knots_new[0, 0, 0]
    return knots_new, gx_new, gy_new, cg_it, cg_err, sync


def lm_state_dict(sched, knots, Gx, Gy) -> dict:
    """Mid-window LM checkpoint payload: the full resume state of the
    host-driven loop — current accepted (knots, Gx, Gy) plus the scalar
    schedule state (lambda, cost_min, tol-sat counter, iteration). The
    reference persists nothing mid-run (SURVEY.md §5); this is the
    orbax-style LM-state checkpoint the rebuild adds."""
    return dict(
        knots=np.asarray(knots),
        gx=np.asarray(Gx),
        gy=np.asarray(Gy),
        lam=float(sched.lam),
        cost_min=float(sched.cost_min),
        count_tol_sat=int(sched.count_tol_sat),
        it=int(sched.it),
        cost_decreased=bool(sched.cost_decreased),
    )


def solve_window(
    knots,
    Gx,
    Gy,
    dev_win: M.DeviceWindow,
    cfg: M.ModelConfig,
    lm: LMConfig = LMConfig(),
    damping_factor: float = 1.0,
    fix_first: bool = False,
    use_cg: bool = False,
    callback=None,
    checkpoint_cb=None,
    checkpoint_every: int = 0,
    resume_state: dict | None = None,
):
    """Run LM on (trajectory knots ⊕ gradient map) for one window.

    Args:
      knots: (K, 3, 3) device array of control poses.
      Gx, Gy: (H, W) device gradient maps.
      dev_win: device-resident event window.
      callback: optional fn(iter, Gx, Gy, info) for evolution dumps
        (reference ``saveEvoData``, solver.cpp:370-425).
      checkpoint_cb: optional fn(state_dict) called every
        ``checkpoint_every`` iterations with :func:`lm_state_dict` — the
        mid-window resume point (costs one device->host fetch of the state).
      resume_state: a :func:`lm_state_dict` payload to resume from. The
        resumed run is BIT-IDENTICAL to the uninterrupted one: every LM
        decision depends only on (state, lambda, cost_min, tol counter), all
        restored exactly; the linearization and normal equations are
        recomputed deterministically from the restored state.

    Returns: (knots, Gx, Gy, LMStats).
    """
    from . import lm as lm_mod

    num_knots = knots.shape[0]
    stats = LMStats(num_events=int(dev_win.pol_signed.shape[0]))
    dt = Gx.dtype
    damping = jnp.asarray(damping_factor, dt)

    # the one shared accept/reject/lambda/tol-sat schedule (lm.py)
    sched = lm_mod.HostSchedule(
        tol_fun=lm.tol_fun,
        max_num_iter=lm.max_num_iter,
        num_times_tol_fun_sat=lm.num_times_tol_fun_sat,
        lam=lm.lambda_init,
        lambda_min=lm.lambda_min,
        lambda_max=lm.lambda_max,
    )
    if resume_state is not None:
        knots = jnp.asarray(resume_state["knots"], dt)
        Gx = jnp.asarray(resume_state["gx"], dt)
        Gy = jnp.asarray(resume_state["gy"], dt)
        sched.lam = float(resume_state["lam"])
        sched.count_tol_sat = int(resume_state["count_tol_sat"])
        sched.it = int(resume_state["it"])
        sched.cost_decreased = bool(resume_state["cost_decreased"])

    # streamed mode: ``lin`` holds the light linearization (light tier) or
    # just the (HW,) activity map (full tier) — the forming pass recomputes
    # the Jacobians (light) or the whole chain (full) chunk-wise; the
    # prev-record gather happens once per window, not once per pass
    streamed = cfg.stream_chunk is not None
    if streamed:
        pb, pbid = M.prev_records(dev_win)
        base = _init_costs_light if cfg.stream_light else _init_costs_streamed

        def init_fn(k_, gx_, gy_, dev_, cfg_):
            return base(k_, gx_, gy_, dev_, cfg_, pb, pbid)
    elif cfg.light_trial:
        init_fn = _init_costs_trial
    else:
        init_fn = _init_costs

    t_loop0 = time.perf_counter()
    t0 = t_loop0
    lin, cost_data_j, cost_reg_j = init_fn(knots, Gx, Gy, dev_win, cfg)
    cost_data, cost_reg = float(cost_data_j), float(cost_reg_j)
    stats.time_objective_s += time.perf_counter() - t0
    stats.count_objective += 1
    if resume_state is None:
        sched.start(cost_data + cost_reg)
    else:
        # cost_min restored exactly (it equals the cost at the restored
        # accepted state, but the stored scalar is the source of truth)
        sched.cost_min = float(resume_state["cost_min"])

    neq = None
    while sched.running():
        # on resume the system must be formed once regardless of whether the
        # interrupted run's last step was a reject (forming is deterministic
        # in the accepted state, so this re-form is bit-identical)
        if sched.cost_decreased or neq is None:
            t0 = time.perf_counter()
            if streamed:
                neq = M.form_normal_eq_streamed(
                    lin, knots, Gx, Gy, dev_win, cfg, num_knots,
                    prev_bearings=pb, prev_bids=pbid,
                )
            elif cfg.light_trial:
                neq = M.form_normal_eq_light(
                    lin, knots, Gx, Gy, dev_win, cfg, num_knots
                )
            else:
                neq = M.form_normal_eq(lin, Gx, Gy, cfg, num_knots)
            # value-fetch sync: the scalar transfer waits for the whole
            # forming executable (block_until_ready is unreliable here)
            dropped = int(neq.dropped)
            stats.time_form_s += time.perf_counter() - t0
            stats.count_form += 1
            stats.note_active_pixels(int(neq.active_count))
            stats.dropped_meas_per_form.append(dropped)

        if callback is not None:
            callback(sched.it, Gx, Gy,
                     dict(lam=sched.lam, cost_min=sched.cost_min))

        # Phase: solve + trial state (one jitted call, value-fetch synced).
        t0 = time.perf_counter()
        knots_new, gx_new, gy_new, cg_it, cg_err, sync = _solve_update(
            knots, Gx, Gy, neq, jnp.asarray(sched.lam, dt), damping,
            fix_first, use_cg,
        )
        float(sync)
        t1 = time.perf_counter()
        stats.time_solve_s += t1 - t0
        stats.count_solve += 1

        # Phase: objective (trial relinearize + costs; reused on accept).
        lin_new, cost_data_new_j, cost_reg_new_j = init_fn(
            knots_new, gx_new, gy_new, dev_win, cfg
        )
        cost_data_new = float(cost_data_new_j)
        cost_reg_new = float(cost_reg_new_j)
        stats.time_objective_s += time.perf_counter() - t1
        stats.count_objective += 1
        cost_new = cost_data_new + cost_reg_new

        rec = dict(
            iter=sched.it + 1,
            log10_lambda=np.log10(sched.lam),
            cost_min=sched.cost_min,
            cost_new=cost_new,
            cost_data=cost_data,
            cost_reg=cost_reg,
        )
        if use_cg:
            rec["cg_iterations"] = int(cg_it)
            rec["cg_error"] = float(cg_err)
        stats.iterations.append(rec)

        if sched.step(cost_new):
            # Accept (solver.cpp:299-340): take the trial state; the trial
            # linearization IS the next linearization point (reused).
            knots, Gx, Gy = knots_new, gx_new, gy_new
            lin = lin_new
            cost_data, cost_reg = cost_data_new, cost_reg_new
            if sched.converged:
                stats.converged = True
                stats.time_total_s = time.perf_counter() - t_loop0
                return knots, Gx, Gy, stats
        # Reject (solver.cpp:343-352): state kept, lambda raised by sched.

        if (
            checkpoint_cb is not None
            and checkpoint_every > 0
            and sched.it % checkpoint_every == 0
        ):
            checkpoint_cb(lm_state_dict(sched, knots, Gx, Gy))

    stats.time_total_s = time.perf_counter() - t_loop0
    return knots, Gx, Gy, stats


# ---------------------------------------------------------------------------
# Fully on-device LM (one jitted while_loop per window).
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("cfg", "fix_first", "use_cg", "max_num_iter",
                     "num_times_tol_fun_sat", "return_trace"),
)
def solve_window_fused(
    knots,
    Gx,
    Gy,
    dev_win: M.DeviceWindow,
    cfg: M.ModelConfig,
    damping,
    tol_fun,
    fix_first: bool = False,
    use_cg: bool = False,
    max_num_iter: int = 50,
    num_times_tol_fun_sat: int = 2,
    return_trace: bool = False,
):
    """The whole LM window as ONE device program (`lax.while_loop`):
    identical control flow to :func:`solve_window` (reference
    solver.cpp:11-368) but with zero host round-trips — the right shape for
    production serving and for small windows where dispatch latency
    dominates. The accept/reject/lambda/tol-sat step itself lives in
    :func:`lm.lm_while` (shared with the sharded SPMD window).

    Returns (knots, Gx, Gy, cost_min, iterations_used, converged)
    [+ the per-iteration trace when ``return_trace``, see lm.TRACE_COLS].
    """
    from . import lm

    num_knots = knots.shape[0]
    streamed = cfg.stream_chunk is not None
    # prev records are state-independent: gather once, hoisted above the LM
    # while_loop (the streamed passes then slice them contiguously per chunk)
    pb, pbid = M.prev_records(dev_win) if streamed else (None, None)

    def _objective(knots_, gx_, gy_):
        """Cost + forming input ``(cost, aux)``: the full Linearization
        (classic), the light Linearization (streamed LIGHT tier — (N,)
        fields resident, no Jacobians; chunk-computed), or the (HW,)
        activity map (streamed FULL tier — chunk-recomputed, NO O(N) output
        survives)."""
        if streamed and not cfg.stream_light:
            cd, nem = M.cost_and_activity_streamed(
                knots_, gx_, gy_, dev_win, cfg,
                prev_bearings=pb, prev_bids=pbid,
            )
            return cd + M.reg_cost(gx_, gy_, cfg.alpha), nem
        if streamed:
            lin, cd = M.linearize_streamed_light(
                knots_, gx_, gy_, dev_win, cfg,
                prev_bearings=pb, prev_bids=pbid,
            )
            return cd + M.reg_cost(gx_, gy_, cfg.alpha), lin
        # light-trial classic (cfg.light_trial): trials carry only the
        # (N,)-resident light linearization; _form recomputes Jacobians on
        # accept (reference solver.cpp:66-103 relinearizes only on accept)
        lin = M.linearize(knots_, gx_, gy_, dev_win, cfg,
                          not cfg.light_trial)
        return M.data_cost(lin.e, cfg) + M.reg_cost(gx_, gy_, cfg.alpha), lin

    def _form(act_, knots_, gx_, gy_):
        if streamed:
            return M.form_normal_eq_streamed(
                act_, knots_, gx_, gy_, dev_win, cfg, num_knots,
                prev_bearings=pb, prev_bids=pbid,
            )
        if cfg.light_trial:
            return M.form_normal_eq_light(
                act_, knots_, gx_, gy_, dev_win, cfg, num_knots
            )
        return M.form_normal_eq(act_, gx_, gy_, cfg, num_knots)

    def _solve_update(neq, knots_, gx_, gy_, lam):
        if use_cg:
            x1, x2, _, _ = M.solve_normal_eq_cg(neq, lam, fix_first)
        else:
            x1, x2 = M.solve_normal_eq(neq, lam, fix_first)
        knots_new = M.update_knots(knots_, x1, fix_first)
        gx_new, gy_new = M.update_map(gx_, gy_, x2, damping, neq)
        return knots_new, gx_new, gy_new

    # In the streamed FULL tier (carry_aux) the while-loop carry holds the
    # (HW,) ACTIVITY MAP of the linearization point and the normal equations
    # are re-formed at the top of every iteration: carrying the reduced
    # system instead keeps A12 — (R_pad, 2*dp_pad), ~1.6 GB at a full
    # 1024x512 row space — alive across iterations with while-loop double
    # buffering plus a lax.cond copy, which is what capped fused windows at
    # ~32M events on one chip. Forming is deterministic, so re-forming from
    # the carried state is bit-identical; the only cost is one extra forming
    # pass on REJECTED iterations. The LIGHT tier (<= ~32M events) carries
    # the reduced system like classic mode — forming runs only on accepts.
    out = lm.lm_while(
        knots, Gx, Gy,
        objective=_objective,
        form=_form,
        solve_update=_solve_update,
        sys_stats=lambda neq: (neq.active_count, neq.dropped),
        tol_fun=tol_fun,
        max_num_iter=max_num_iter,
        num_times_tol_fun_sat=num_times_tol_fun_sat,
        carry_aux=streamed and not cfg.stream_light,
    )
    return out if return_trace else out[:6]
