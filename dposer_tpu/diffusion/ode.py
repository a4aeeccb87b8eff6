"""Jitted adaptive Dormand-Prince RK45 ODE solver.

Replaces the reference's host-side ``scipy.integrate.solve_ivp`` calls
(ref ``sampling.py:530``, ``likelihood.py:99``) — those round-trip
device->numpy->device on *every* RHS evaluation. Here the full adaptive loop
runs on-device inside ``lax.while_loop``; the RHS is traced once.

Matches scipy's RK45 algorithm: same Butcher tableau (DOPRI5(4)), same error
norm (RMS of err / (atol + rtol * max(|y0|, |y1|))), same step controller
(safety 0.9, growth clamp [0.2, 10], exponent -1/5) and the same
initial-step-size heuristic, so NFE and accuracy are comparable.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Dormand-Prince 5(4) tableau
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = jnp.array([
    [0, 0, 0, 0, 0, 0],
    [1 / 5, 0, 0, 0, 0, 0],
    [3 / 40, 9 / 40, 0, 0, 0, 0],
    [44 / 45, -56 / 15, 32 / 9, 0, 0, 0],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0, 0],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0],
])
_B = jnp.array([35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84])
# b - b_hat (error weights), includes the FSAL 7th stage
_E = jnp.array([71 / 57600, 0, -71 / 16695, 71 / 1920, -17253 / 339200, 22 / 525, -1 / 40])

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ERR_EXP = -1.0 / 5.0


class ODEResult(NamedTuple):
    y: jnp.ndarray
    nfe: jnp.ndarray  # int32 — number of RHS evaluations
    status: jnp.ndarray  # 0 ok, 1 hit max_steps


def _rms_norm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(x ** 2))


def _initial_step(func: Callable, t0, y0, f0, direction, order, rtol, atol):
    """scipy's select_initial_step heuristic."""
    scale = atol + jnp.abs(y0) * rtol
    d0 = _rms_norm(y0 / scale)
    d1 = _rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * direction * f0
    f1 = func(t0 + h0 * direction, y1)
    d2 = _rms_norm((f1 - f0) / scale) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100 * h0, h1)


def rk45(func: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
         t0: float, t1: float, y0: jnp.ndarray,
         rtol: float = 1e-5, atol: float = 1e-5,
         max_steps: int = 100_000) -> ODEResult:
    """Integrate ``dy/dt = func(t, y)`` from t0 to t1 (either direction).

    ``y0`` may be any shape; the error norm is taken over all elements
    (matching the reference's flattened-state scipy usage).

    ``status`` is 1 if ``max_steps`` was exhausted before reaching ``t1``
    (the returned ``y`` is then the truncated state — callers must check).
    The default is sized so protocol tolerances never hit it: at rtol 1e-6
    an untrained-model PF-ODE already needs ~2,000+ accepted steps, and the
    round-2 default of 2,000 silently truncated exactly there (found by the
    fixed-grid RK4 path disagreeing with a scipy oracle at tight rtol).
    """
    y0 = jnp.asarray(y0)
    t0 = jnp.asarray(t0, y0.dtype)
    t1 = jnp.asarray(t1, y0.dtype)
    direction = jnp.sign(t1 - t0)

    f0 = func(t0, y0)
    h0 = _initial_step(func, t0, y0, f0, direction, 4, rtol, atol)

    class State(NamedTuple):
        t: jnp.ndarray
        y: jnp.ndarray
        f: jnp.ndarray  # FSAL: RHS at (t, y)
        h: jnp.ndarray
        nfe: jnp.ndarray
        steps: jnp.ndarray
        done: jnp.ndarray
        rejected: jnp.ndarray  # scipy's step_rejected memory

    def cond(s: State):
        return (~s.done) & (s.steps < max_steps)

    def body(s: State):
        # clamp step to not overshoot t1; when the clamp engages this is
        # the final step (exact comparison — h is set to the remainder)
        remainder = jnp.abs(t1 - s.t)
        h = jnp.minimum(s.h, remainder)
        is_last = h >= remainder
        h_signed = h * direction

        ks = [s.f]
        for i in range(1, 6):
            ti = s.t + _C[i] * h_signed
            yi = s.y + h_signed * sum(_A[i, j] * ks[j] for j in range(i))
            ks.append(func(ti, yi))
        y_new = s.y + h_signed * sum(_B[j] * ks[j] for j in range(6))
        t_new = s.t + h_signed
        f_new = func(t_new, y_new)  # FSAL stage 7
        ks.append(f_new)

        err = h_signed * sum(_E[j] * ks[j] for j in range(7))
        scale = atol + jnp.maximum(jnp.abs(s.y), jnp.abs(y_new)) * rtol
        err_norm = _rms_norm(err / scale)

        accept = err_norm <= 1.0
        factor = jnp.where(
            err_norm == 0.0, _MAX_FACTOR,
            jnp.clip(_SAFETY * err_norm ** _ERR_EXP, _MIN_FACTOR, _MAX_FACTOR))
        # scipy's step_rejected memory: the accept right after a rejection
        # may not grow h (factor <= 1), preventing accept/reject
        # oscillation near stiff regions — keeps NFE comparable to the
        # scipy oracle as documented above
        cap = (~accept) | s.rejected
        factor = jnp.where(cap, jnp.minimum(factor, 1.0), factor)
        h_next = h * factor

        # land exactly on t1 when the last (clamped) step is accepted: the
        # fp32 ``s.t + (t1 - s.t)`` need not equal t1 bitwise, and a
        # magnitude test against the rounding residue either inches toward
        # t1 in wasted micro-steps or never terminates
        t_new = jnp.where(is_last, t1, t_new)
        t_out = jnp.where(accept, t_new, s.t)
        y_out = jnp.where(accept, y_new, s.y)
        f_out = jnp.where(accept, f_new, s.f)
        done = accept & is_last
        return State(t=t_out, y=y_out, f=f_out, h=h_next,
                     nfe=s.nfe + 6, steps=s.steps + 1, done=done,
                     rejected=~accept)

    init = State(t=t0, y=y0, f=f0, h=h0,
                 nfe=jnp.asarray(2, jnp.int32),  # f0 + initial-step probe
                 steps=jnp.asarray(0, jnp.int32),
                 done=jnp.asarray(False),
                 rejected=jnp.asarray(False))
    final = jax.lax.while_loop(cond, body, init)
    status = jnp.where(final.done, 0, 1).astype(jnp.int32)
    return ODEResult(y=final.y, nfe=final.nfe, status=status)
