"""The one LM accept/reject control flow (reference ``EMBA::solveTimeWindow``,
``src/emba/solver.cpp:11-368``), shared by every solver instantiation.

The reference has exactly one solver loop; this repo grew four (host-driven,
fused classic, fused streamed, sharded SPMD) whose accept/reject, lambda
schedule (x10 / /10, bounds [1e-300, 1e3], ``solver.cpp:15-17, 311, 349``)
and tol-sat convergence counting (``solver.cpp:319-340``) must stay
bit-identical — the cross-mode equivalence tests depend on it. This module
holds that control flow ONCE:

* :func:`lm_while` — the device-side ``lax.while_loop`` skeleton,
  parameterized by (objective, form, solve_update) callables. Instantiated
  by ``solver.solve_window_fused`` (classic and streamed) and by
  ``dist.make_solve_window_sharded``'s per-shard program.
* :class:`HostSchedule` — the same schedule as host-side scalars, used by
  the host-driven ``solver.solve_window`` (which needs per-phase timing and
  callbacks between steps, so it cannot be a ``while_loop``).

Both also record a per-iteration TRACE (lambda, costs, accept, Np, dropped
measurements) so fused and sharded runs report the reference's per-iteration
observability (cost log ``solver.cpp:176-178``, Np ``solver.cpp:283-293``)
instead of a single collapsed record.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Reference constants (solver.cpp:15-17, 63-64, 311, 349).
LAMBDA_INIT = 1e-3
LAMBDA_MIN = 1e-300
LAMBDA_MAX = 1e3
LAMBDA_DOWN = 10.0  # accepted: lambda /= 10 (solver.cpp:311)
LAMBDA_UP = 10.0  # rejected: lambda *= 10 (solver.cpp:349)
COST_FLOOR = 1e-16  # stop when the cost is numerically zero (solver.cpp:63)
REL_EPS = 1e-10  # denominator guard in the relative-change test

# Per-iteration trace columns (see lm_while docstring).
TRACE_COLS = ("lambda", "cost_min", "cost_new", "accept", "active_px",
              "dropped")


def lm_while(
    knots,
    Gx,
    Gy,
    *,
    objective,
    form,
    solve_update,
    sys_stats=None,
    tol_fun,
    max_num_iter: int,
    num_times_tol_fun_sat: int,
    carry_aux: bool = False,
):
    """Run the full LM window as one ``lax.while_loop``.

    Callables (all traced):
      * ``objective(knots, Gx, Gy) -> (cost, aux)`` — total cost at a state
        plus the forming input ``aux`` (a Linearization, or the (HW,)
        activity map in streamed mode).
      * ``form(aux, knots, Gx, Gy) -> sys`` — build the (reduced) normal
        equations from a linearization point.
      * ``solve_update(sys, knots, Gx, Gy, lam) -> (knots', Gx', Gy')`` —
        damped solve + trial state (reference solver.cpp:189-240).
      * ``sys_stats(sys) -> (active_px, dropped)`` int32 scalars for the
        trace (defaults to zeros).

    ``carry_aux``: carry ``aux`` across iterations and re-form at the TOP of
    every iteration — the streamed single-device mode, where the reduced
    system's A12 must not live across the while-loop carry (double buffering
    of a ~GB-sized carry is what capped fused windows at ~32M events).
    Otherwise carry ``sys`` and re-form only on accept (``lax.cond``) — the
    classic/sharded mode, matching the reference's relinearize-on-accept
    (solver.cpp:66-103, 299-352).

    Returns ``(knots, Gx, Gy, cost_min, it, converged, trace)`` with
    ``trace`` of shape ``(max_num_iter + 1, 6)`` holding
    ``TRACE_COLS`` rows for iterations ``[0, it)`` (int columns cast to the
    cost dtype; Np/active counts < 2^24 are exact in f32).
    """
    dt = Gx.dtype

    if sys_stats is None:
        def sys_stats(_sys):
            z = jnp.zeros((), jnp.int32)
            return z, z

    cost0, aux0 = objective(knots, Gx, Gy)
    carry0 = aux0 if carry_aux else form(aux0, knots, Gx, Gy)
    trace0 = jnp.zeros((max_num_iter + 1, len(TRACE_COLS)), dt)

    def lm_iter(state):
        (knots, Gx, Gy, carry, lam, cost_min, count_tol, it, converged,
         trace) = state
        sys = form(carry, knots, Gx, Gy) if carry_aux else carry

        knots_new, gx_new, gy_new = solve_update(sys, knots, Gx, Gy, lam)
        cost_new, aux_new = objective(knots_new, gx_new, gy_new)

        accept = cost_new < cost_min
        np_, dropped = sys_stats(sys)
        trace = jax.lax.dynamic_update_slice(
            trace,
            jnp.stack(
                [lam, cost_min, cost_new, accept.astype(dt),
                 np_.astype(dt), dropped.astype(dt)]
            )[None, :],
            (it, 0),
        )

        if carry_aux:
            # streamed: merge the small aux (re-formed next iteration anyway)
            carry_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), aux_new, carry
            )
        else:
            # accept: relinearized system; reject: keep (solver.cpp:299-352)
            carry_new = jax.lax.cond(
                accept,
                lambda: form(aux_new, knots_new, gx_new, gy_new),
                lambda: sys,
            )
        knots = jnp.where(accept, knots_new, knots)
        Gx = jnp.where(accept, gx_new, Gx)
        Gy = jnp.where(accept, gy_new, Gy)
        lam = jnp.where(accept, lam / LAMBDA_DOWN, lam * LAMBDA_UP)
        rel = jnp.abs(1.0 - cost_new / (cost_min + REL_EPS))
        # The tol-sat counter resets ONLY on reject (solver.cpp:319-349); an
        # accepted-but-large step keeps it. (The pre-refactor fused loops
        # reset it there too — a parity bug this module fixed.)
        count_tol = jnp.where(
            accept, jnp.where(rel < tol_fun, count_tol + 1, count_tol), 0
        )
        converged = count_tol >= num_times_tol_fun_sat
        cost_min = jnp.where(accept, cost_new, cost_min)
        return (knots, Gx, Gy, carry_new, lam, cost_min, count_tol, it + 1,
                converged, trace)

    def cond(state):
        lam, cost_min, it, converged = state[4], state[5], state[7], state[8]
        return (
            (it <= max_num_iter)
            & (cost_min > COST_FLOOR)
            & (lam <= LAMBDA_MAX)
            & (lam >= LAMBDA_MIN)
            & jnp.logical_not(converged)
        )

    state0 = (
        knots, Gx, Gy, carry0, jnp.asarray(LAMBDA_INIT, dt), cost0,
        jnp.asarray(0), jnp.asarray(0), jnp.asarray(False), trace0,
    )
    (knots, Gx, Gy, _carry, _lam, cost_min, _ct, it, converged, trace) = (
        jax.lax.while_loop(cond, lm_iter, state0)
    )
    return knots, Gx, Gy, cost_min, it, converged, trace


def trace_records(trace: np.ndarray, n_iter: int) -> list[dict]:
    """Decode a :func:`lm_while` trace into per-iteration dicts shaped like
    the host loop's ``LMStats.iterations`` records (+ accept/Np/dropped)."""
    out = []
    for i in range(int(n_iter)):
        lam, cost_min, cost_new, accept, np_, dropped = (
            float(x) for x in trace[i]
        )
        out.append(
            dict(
                iter=i + 1,
                log10_lambda=float(np.log10(lam)) if lam > 0 else float("-inf"),
                cost_min=cost_min,
                cost_new=cost_new,
                accepted=bool(accept),
                active_px=int(np_),
                dropped=int(dropped),
            )
        )
    return out


def forming_stats_from_trace(trace: np.ndarray, n_iter: int):
    """(active_px_per_form, dropped_per_form): one entry per FRESH forming
    pass — iteration 0's system plus each post-accept relinearization (the
    reference logs Np exactly there, solver.cpp:283-293)."""
    active, dropped = [], []
    fresh = True
    for i in range(int(n_iter)):
        if fresh:
            active.append(int(trace[i, 4]))
            dropped.append(int(trace[i, 5]))
        fresh = bool(trace[i, 3])  # accepted -> next iteration re-forms
    return active, dropped


@dataclasses.dataclass
class HostSchedule:
    """The same LM schedule as host-side scalars, for the host-driven loop
    (``solver.solve_window``) whose phases are separate timed device calls.

    Usage::

        sched = HostSchedule(tol_fun, max_num_iter, num_times_tol_fun_sat)
        while sched.running():
            ...
            if sched.step(cost_new):   # True = accepted
                <take trial state>
    """

    tol_fun: float
    max_num_iter: int
    num_times_tol_fun_sat: int
    lam: float = LAMBDA_INIT
    lambda_min: float = LAMBDA_MIN
    lambda_max: float = LAMBDA_MAX
    cost_min: float = 1e99
    count_tol_sat: int = 0
    it: int = 0
    converged: bool = False
    cost_decreased: bool = True  # re-form needed (True at start)

    def start(self, cost0: float):
        self.cost_min = cost0

    def running(self) -> bool:
        return (
            not self.converged
            and self.it <= self.max_num_iter
            and self.cost_min > COST_FLOOR
            and self.lambda_min <= self.lam <= self.lambda_max
        )

    def step(self, cost_new: float) -> bool:
        """Accept/reject ``cost_new`` (reference solver.cpp:299-352).
        Returns True when accepted (caller takes the trial state)."""
        self.it += 1
        if cost_new < self.cost_min:
            self.cost_decreased = True
            self.lam /= LAMBDA_DOWN
            rel = abs(1.0 - cost_new / (self.cost_min + REL_EPS))
            self.cost_min = cost_new
            if rel < self.tol_fun:
                self.count_tol_sat += 1
                if self.count_tol_sat >= self.num_times_tol_fun_sat:
                    self.converged = True
            # NOTE: an accepted-but-large step does NOT reset the counter
            # (reference solver.cpp:319-340; only a reject does, :349).
            return True
        self.cost_decreased = False
        self.lam *= LAMBDA_UP
        self.count_tol_sat = 0
        return False
