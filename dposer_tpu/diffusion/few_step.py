"""Few-step deterministic samplers: DDIM and DPM-Solver++(2M).

The reference's generation protocols run 1000 sequential EM steps
(ref sampling.py:456-461, config.model.num_scales=1000) — every sample
costs 1000 network evaluations. Diffusion serving standardly cuts this
10-50x with deterministic few-step integrators at matched sample quality;
this module provides the two standard ones, built on the same tabled
machinery as ``fast_sampler``:

- **DDIM** (Song et al., ICLR'21 — the eta=0 deterministic sampler): the
  update ``x' = (a'/a) x + (s' - (a'/a) s) eps_hat`` is EXACTLY the fused
  EM kernel's 3-scalar form with zero noise, so the Pallas single-kernel
  path comes free via a table override (``get_pallas_ddim_sampler``).
  The same update already appears in-tree as the aux-loss multi-step
  denoise (losses.py ``multi_step_denoise``, ref losses.py:91-106).
- **DPM-Solver++(2M)** (Lu et al.'22 — second-order multistep,
  data-prediction form): per step
  ``x' = (s'/s) x - a' (e^{-h} - 1) D`` with ``D`` the extrapolated
  x0-prediction ``(1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}``; noticeably
  better than DDIM below ~25 steps.

Both support every SDE family with Gaussian marginals ``x_t = a(t) x0 +
s(t) eps`` (VP / subVP — including its non-sqrt std convention, since
``return_alpha_sigma`` returns the TRUE marginal std — and VE via
a=1), and a uniform-t or uniform-log-SNR (``grid="lambda"``) step grid.

The module also hosts the **hybrid DDIM->pc sampler**
(``get_hybrid_sampler`` and friends): a few-step DDIM head down to the
``(N - m_tail)``-th point of the reference schedule grid, then the pc
sampler's exact last ``m_tail`` rows (langevin tail by default). The
measured result on the trained checkpoint (PERFORMANCE.md "Hybrid"):
completion within 4.4% of the 1000-row protocol at 4.4x fewer NFE,
beating it outright at longer tails (120.9 vs 128.1 mm at NFE 825), and
generation bpd equal to the protocol's to 4 decimals at NFE 225 — the
win is NFE reallocation away from the uninformative early schedule.

Quality contract: distribution-level agreement with the 1000-step EM
sampler on a trained model, pinned in
``tests/test_golden_pipeline.py::test_few_step_samplers_match_em_distribution``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.score_mlp import ScoreModelFC
from .fast_sampler import (_corrector_tables, _imputation_tables, _labels_for,
                           make_fast_forward, precompute_time_tables)
from .sde import SDE


def _alpha_sigma_1d(sde: SDE, taus: jnp.ndarray):
    a, s = sde.return_alpha_sigma(taus)
    return a.reshape(-1), s.reshape(-1)


def step_grid(sde: SDE, n_points: int, eps: float,
              grid: str = "t") -> jnp.ndarray:
    """``n_points`` time points from T to eps — uniform in t, or uniform in
    log-SNR lambda = log(alpha/sigma) (``grid="lambda"``, the DPM-Solver
    papers' choice; inverted numerically on a fine t-grid)."""
    if grid == "t":
        return jnp.linspace(sde.T, eps, n_points)
    if grid != "lambda":
        raise ValueError(f"grid must be 't' or 'lambda', got {grid!r}")
    t_fine = jnp.linspace(sde.T, eps, 4096)
    a, s = _alpha_sigma_1d(sde, t_fine)
    lam_fine = jnp.log(a) - jnp.log(s)
    lams = jnp.linspace(lam_fine[0], lam_fine[-1], n_points)
    # lam_fine increases as t decreases -> interp over the reversed axis
    taus = jnp.interp(lams, lam_fine, t_fine)
    return taus.at[0].set(sde.T).at[-1].set(eps)


def _eps_hat_scale(sde: SDE, taus: jnp.ndarray, out_scale):
    """Per-point c with eps_hat = c * raw_model_out (the noise-prediction
    adapter: eps_hat = -score * sigma, score = score_scale * raw)."""
    score_scale, _ = _corrector_tables(sde, taus, out_scale)
    _, s = _alpha_sigma_1d(sde, taus)
    return -score_scale * s


def ddim_tables(sde: SDE, n_steps: int, eps: float, model: ScoreModelFC,
                params, denoise: bool = True, grid: str = "t"):
    """(taus_eval, cx, cout, cnoise=0) rows for the 3-scalar update
    ``x' = cx*x + cout*raw_out`` — directly consumable by the fused EM
    kernel's table contract. With ``denoise`` a final x0-projection row
    ``x0_hat = x/a_eps - (s_eps/a_eps) eps_hat`` is appended (the kernel's
    ``denoise=True`` returns exactly that row's mean)."""
    taus = step_grid(sde, n_steps + 1, eps, grid)
    a, s = _alpha_sigma_1d(sde, taus)
    _, oscale = precompute_time_tables(model, params, _labels_for(sde, taus))
    ehat = _eps_hat_scale(sde, taus, oscale)

    cx = a[1:] / a[:-1]
    cout = (s[1:] - cx * s[:-1]) * ehat[:-1]
    taus_eval = taus[:-1]
    if denoise:
        cx = jnp.concatenate([cx, (1.0 / a[-1:])])
        cout = jnp.concatenate([cout, -(s[-1:] / a[-1:]) * ehat[-1:]])
        taus_eval = taus
    return taus_eval, cx, cout, jnp.zeros_like(cx)


def get_ddim_sampler(sde: SDE, model: ScoreModelFC, params,
                     shape: Tuple[int, ...], n_steps: int = 50,
                     eps: float = 1e-3, denoise: bool = True,
                     grid: str = "t", imputation: bool = False,
                     jit: bool = True):
    """Tabled XLA DDIM: ``sampler(key, observation=None, mask=None, z=None)
    -> (nfe, x)``.

    ``imputation=True`` adds the reference's masked re-noise/overwrite
    completion update (ref sampling.py:410-427) around every DDIM row:
    observed dims are replaced with ``mc(tau) * obs + std(tau) * z`` before
    and after each deterministic update — the same pre-corrector /
    post-predictor placement the 1000-step samplers (and the Pallas
    kernel) use, so a 10-50x-fewer-NFE completion serving mode falls out
    of the identical machinery.
    """
    taus_eval, cx, cout, _ = ddim_tables(sde, n_steps, eps, model, params,
                                         denoise=denoise, grid=grid)
    labels = _labels_for(sde, taus_eval)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    # raw forward: ddim_tables already folded any sigma output scaling
    fwd = make_fast_forward(model, params, tprojs, None)
    del out_scale
    n_rows = int(taus_eval.shape[0])
    mc, istd = _imputation_tables(sde, taus_eval)

    def sampler(key, observation=None, mask=None,
                z: Optional[jnp.ndarray] = None):
        x = sde.prior_sampling(key, shape) if z is None else z

        def impute(x, i, k):
            masked = mc[i] * observation + istd[i] * jax.random.normal(
                k, shape, x.dtype)
            return x * (1 - mask) + masked * mask

        def body(x, i):
            if imputation:
                _, kci, _, kpi = jax.random.split(
                    jax.random.fold_in(key, i), 4)
                x = impute(x, i, kci)
            x = cx[i] * x + cout[i] * fwd(x, i)
            if imputation:
                x = impute(x, i, kpi)
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_rows))
        return n_rows, x

    return jax.jit(sampler) if jit else sampler


def get_pallas_ddim_sampler(sde: SDE, model: ScoreModelFC, params,
                            shape: Tuple[int, ...], n_steps: int = 50,
                            eps: float = 1e-3, denoise: bool = True,
                            grid: str = "t", **kw):
    """DDIM through the fused EM Pallas kernel (one dispatch for the whole
    few-step loop; weights VMEM-resident): the DDIM rows ARE the kernel's
    3-scalar table contract. Accepts the kernel's extra options
    (``interpret``, ``batch_block``, ``mesh``, ``quant``/``act_amax``...).

    ``bf16_tail_steps=K`` (with ``quant="int8"``) splits the table rows
    into an int8 head and a bf16 tail (two dispatches) — the few-step
    analogue of the fused EM sampler's mixed-precision mode, targeting
    the int8 bpd tail measured in PERFORMANCE.md "Quality vs NFE" (the
    last rows land the sample on the manifold; fewer steps mean less
    self-correction of per-step rounding, so precision matters most
    there). The split is exact per fixed precision: rows are
    caller-built constants, state is carried through ``z=``.

    ``imputation=True`` (forwarded to the kernel) enables the masked
    re-noise/overwrite completion update: the kernel derives its per-row
    ``imput_mean/imput_std`` columns from the overridden DDIM timesteps,
    so few-step completion shares the 1000-step path's imputation
    machinery verbatim (ref sampling.py:410-427).

    ``sampler(key, observation=None, mask=None, z=None, noise=None)
    -> (nfe, x)``.
    """
    from ..ops.pallas.fused_em import get_pallas_em_sampler

    taus_eval, cx, cout, cnoise = ddim_tables(sde, n_steps, eps, model,
                                              params, denoise=denoise,
                                              grid=grid)
    n_rows = int(taus_eval.shape[0])
    # the kernel's denoise flag returns the LAST row's mean (= the x0
    # projection row when denoise, = the final DDIM mean otherwise: with
    # cnoise = 0 both conventions coincide)
    tail_k = int(kw.pop("bf16_tail_steps", 0) or 0)
    if tail_k:
        if kw.get("quant") != "int8":
            raise ValueError("bf16_tail_steps requires quant='int8'")
        if not 0 < tail_k < n_rows:
            raise ValueError(f"bf16_tail_steps must be in (0, {n_rows}); "
                             f"got {tail_k}")
        m = n_rows - tail_k
        rows = (taus_eval, cx, cout, cnoise)
        head = get_pallas_em_sampler(
            sde, model, params, shape, eps=eps, denoise=False,
            _tables_override=tuple(r[:m] for r in rows), **kw)
        tail_kw = {k: v for k, v in kw.items()
                   if k not in ("quant", "act_amax")}
        tail = get_pallas_em_sampler(
            sde, model, params, shape, eps=eps, denoise=denoise,
            _tables_override=tuple(r[m:] for r in rows), **tail_kw)

        def sampler(key, observation=None, mask=None,
                    z: Optional[jnp.ndarray] = None, noise=None):
            kh, kt = jax.random.split(key)
            nh = nt = None
            if noise is not None:
                if noise.ndim == 3:
                    noise = noise[:, None]
                nh, nt = noise[:m], noise[m:]
            _, x = head(kh, observation=observation, mask=mask, z=z,
                        noise=nh)
            _, x = tail(kt, observation=observation, mask=mask, z=x,
                        noise=nt)
            return n_rows, x

        return sampler

    inner = get_pallas_em_sampler(
        sde, model, params, shape, eps=eps, denoise=denoise,
        _tables_override=(taus_eval, cx, cout, cnoise), **kw)

    def sampler(key, observation=None, mask=None,
                z: Optional[jnp.ndarray] = None, noise=None):
        _, x = inner(key, observation=observation, mask=mask, z=z,
                     noise=noise)
        return n_rows, x

    return sampler


def get_dpm_sampler(sde: SDE, model: ScoreModelFC, params,
                    shape: Tuple[int, ...], n_steps: int = 20,
                    eps: float = 1e-3, denoise: bool = True,
                    grid: str = "lambda", imputation: bool = False,
                    jit: bool = True):
    """Tabled DPM-Solver++(2M): second-order multistep in data-prediction
    form; ``sampler(key, observation=None, mask=None, z=None) -> (nfe, x)``.
    The scan carries the previous step's x0-prediction; the first step is
    first-order (DDIM in x0 form). ``grid`` defaults to uniform log-SNR per
    the paper. ``imputation=True`` applies the masked re-noise/overwrite
    completion update around every row (ref sampling.py:410-427), as in
    ``get_ddim_sampler``."""
    taus = step_grid(sde, n_steps + 1, eps, grid)
    a, s = _alpha_sigma_1d(sde, taus)
    labels = _labels_for(sde, taus)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    ehat = _eps_hat_scale(sde, taus, out_scale)
    fwd = make_fast_forward(model, params, tprojs, None)

    lam = jnp.log(a) - jnp.log(s)
    h = lam[1:] - lam[:-1]
    r = jnp.concatenate([jnp.ones((1,)), h[:-1] / h[1:]])  # r_j = h_{j-1}/h_j
    c_x = s[1:] / s[:-1]
    c_D = -a[1:] * (jnp.exp(-h) - 1.0)
    # x0_hat_j = (x - s_j * ehat_j * raw) / a_j
    d1 = 1.0 / a[:-1]
    d2 = -(s[:-1] / a[:-1]) * ehat[:-1]
    # D_j = (1 + 1/(2 r_j)) x0_j - 1/(2 r_j) x0_{j-1}; first step: D_0 = x0_0
    w_prev = jnp.concatenate([jnp.zeros((1,)), 1.0 / (2.0 * r[1:])])
    n_rows = int(h.shape[0])
    d_last1 = 1.0 / a[-1]
    d_last2 = -(s[-1] / a[-1]) * ehat[-1]
    mc, istd = _imputation_tables(sde, taus)

    def sampler(key, observation=None, mask=None,
                z: Optional[jnp.ndarray] = None):
        x = sde.prior_sampling(key, shape) if z is None else z

        def impute(x, i, k):
            masked = mc[i] * observation + istd[i] * jax.random.normal(
                k, shape, x.dtype)
            return x * (1 - mask) + masked * mask

        def body(carry, i):
            x, x0_prev = carry
            if imputation:
                _, kci, _, kpi = jax.random.split(
                    jax.random.fold_in(key, i), 4)
                x = impute(x, i, kci)
            x0 = d1[i] * x + d2[i] * fwd(x, i)
            D = (1.0 + w_prev[i]) * x0 - w_prev[i] * x0_prev
            x_new = c_x[i] * x + c_D[i] * D
            if imputation:
                x_new = impute(x_new, i, kpi)
            return (x_new, x0), None

        (x, x0_last), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)),
                                       jnp.arange(n_rows))
        nfe = n_rows
        if denoise:
            # final x0 projection at eps (one extra eval, as the EM/DDIM
            # denoise convention)
            x = d_last1 * x + d_last2 * fwd(x, n_rows)
            if imputation:
                x = impute(x, n_rows, jax.random.fold_in(key, n_rows))
            nfe += 1
        return nfe, x

    return jax.jit(sampler) if jit else sampler


# ---------------------------------------------------------------------------
# Hybrid DDIM->PC sampler: few-step head + the exact stochastic tail
# ---------------------------------------------------------------------------

def hybrid_t_switch(sde: SDE, m_tail: int, eps: float) -> float:
    """The timestep where the DDIM head hands off to the stochastic tail:
    the ``(N - m_tail)``-th point of the reference N-step schedule grid, so
    the tail rows are bit-identical to the last ``m_tail`` rows of the
    1000-step pc sampler."""
    if not 0 < m_tail < sde.N:
        raise ValueError(f"m_tail must be in (0, {sde.N}); got {m_tail}")
    return float(sde.timesteps(eps)[sde.N - m_tail])


def get_hybrid_sampler(sde: SDE, model: ScoreModelFC, params,
                       shape: Tuple[int, ...], n_head: int = 25,
                       m_tail: int = 100, eps: float = 1e-3,
                       grid: str = "t", tail_corrector: str = "none",
                       snr: float = 0.16, n_corrector_steps: int = 1,
                       imputation: bool = False, jit: bool = True):
    """DDIM head + exact pc tail (XLA twin of the Pallas version below).

    Measured rationale (PERFORMANCE.md "Quality vs NFE"): pure few-step
    masked imputation degrades completion MPJPE ~1.7-2x vs the 1000-step
    pc sampler — a deterministic integrator never reconciles the
    overwritten observed block with the sampled remainder, while the pc
    sampler's late stochastic steps (per-step EM noise + masked re-noise,
    optionally a langevin corrector) do exactly that near the manifold.
    So: integrate the cheap far-from-data segment with ``n_head`` DDIM
    steps down to ``hybrid_t_switch``, then run the reference pc sampler's
    LAST ``m_tail`` rows verbatim (EM + masked re-noise/overwrite, ref
    sampling.py:273-302,410-427 — via
    ``get_fast_pc_sampler(step_range=...)``, whose rows are bit-identical
    to the full run's suffix). NFE = n_head + m_tail * (1 + S) with
    ``S = n_corrector_steps if tail_corrector == "langevin" else 0`` — a
    4-10x cut vs the 1000-row protocol.

    ``sampler(key, observation=None, mask=None, z=None) -> (nfe, x)``.
    """
    from .fast_sampler import get_fast_pc_sampler

    t_sw = hybrid_t_switch(sde, m_tail, eps)
    head = get_ddim_sampler(sde, model, params, shape, n_steps=n_head,
                            eps=t_sw, denoise=False, grid=grid,
                            imputation=imputation, jit=False)
    tail = get_fast_pc_sampler(sde, model, params, shape, eps=eps,
                               denoise=True, corrector=tail_corrector,
                               snr=snr, n_corrector_steps=n_corrector_steps,
                               imputation=imputation,
                               step_range=(sde.N - m_tail, sde.N), jit=False)
    S = n_corrector_steps if tail_corrector == "langevin" else 0
    nfe = n_head + m_tail * (1 + S)

    def sampler(key, observation=None, mask=None,
                z: Optional[jnp.ndarray] = None):
        kh, kt = jax.random.split(key)
        _, x = head(kh, observation=observation, mask=mask, z=z)
        _, x = tail(kt, observation=observation, mask=mask, z=x)
        return nfe, x

    return jax.jit(sampler) if jit else sampler


def get_pallas_hybrid_sampler(sde: SDE, model: ScoreModelFC, params,
                              shape: Tuple[int, ...], n_head: int = 25,
                              m_tail: int = 100, eps: float = 1e-3,
                              grid: str = "t", tail_corrector: str = "none",
                              snr: float = 0.16,
                              n_corrector_steps: int = 1, **kw):
    """DDIM head + exact pc tail as TWO fused-kernel dispatches: the head
    rides the DDIM table override (corrector none), the tail is the fused
    EM sampler's native ``step_range=(N - m_tail, N)`` slice (optionally
    with the langevin corrector) — the same late schedule the 1000-row
    protocol runs, at ``n_head + m_tail * (1 + S)`` NFE. Accepts the
    kernel's extra options (``quant``/``act_amax``, ``interpret``,
    ``mesh``, ``imputation``...); see ``get_hybrid_sampler`` for the
    measured rationale.
    """
    from ..ops.pallas.fused_em import get_pallas_em_sampler

    t_sw = hybrid_t_switch(sde, m_tail, eps)
    rows = ddim_tables(sde, n_head, t_sw, model, params, denoise=False,
                       grid=grid)
    head = get_pallas_em_sampler(sde, model, params, shape, eps=eps,
                                 denoise=False, corrector="none",
                                 _tables_override=rows, **kw)
    tail = get_pallas_em_sampler(sde, model, params, shape, eps=eps,
                                 denoise=True, corrector=tail_corrector,
                                 snr=snr, n_corrector_steps=n_corrector_steps,
                                 step_range=(sde.N - m_tail, sde.N), **kw)
    S = n_corrector_steps if tail_corrector == "langevin" else 0
    nfe = n_head + m_tail * (1 + S)

    def sampler(key, observation=None, mask=None,
                z: Optional[jnp.ndarray] = None, noise=None):
        kh, kt = jax.random.split(key)
        nh = nt = None
        if noise is not None:
            nh, nt = noise  # caller-split: head slabs, tail slabs
        _, x = head(kh, observation=observation, mask=mask, z=z, noise=nh)
        _, x = tail(kt, observation=observation, mask=mask, z=x, noise=nt)
        return nfe, x

    return sampler


# ---------------------------------------------------------------------------
# Multi-hypothesis completion serving (the few-step analogue of
# ops.pallas.fused_em.get_pallas_em_hypo_sampler)
# ---------------------------------------------------------------------------

def _tile_hypos(build_sampler, shape, hypo_num):
    """Tile H hypotheses into rows of one [H*B, D] dispatch; untile to
    [B, H, D]. Rows decorrelate through the prior sample / noise streams,
    replacing the reference's sequential hypothesis loop
    (ref run/demo.py:359-362)."""
    batch, dim = shape
    inner = build_sampler((hypo_num * batch, dim))

    def sampler(key, observation, mask, z: Optional[jnp.ndarray] = None):
        obs_t = jnp.tile(observation, (hypo_num, 1))
        mask_t = jnp.tile(mask, (hypo_num, 1))
        nfe, out = inner(key, observation=obs_t, mask=mask_t, z=z)
        return nfe, jnp.swapaxes(out.reshape(hypo_num, batch, dim), 0, 1)

    return sampler


def get_ddim_hypo_sampler(sde: SDE, model: ScoreModelFC, params,
                          shape: Tuple[int, ...], hypo_num: int, **kw):
    """XLA DDIM completion: ``sampler(key, observation [B,D], mask [B,D])
    -> (nfe, [B, H, D])``."""
    kw.setdefault("imputation", True)
    return _tile_hypos(lambda s: get_ddim_sampler(sde, model, params, s, **kw),
                       shape, hypo_num)


def get_dpm_hypo_sampler(sde: SDE, model: ScoreModelFC, params,
                         shape: Tuple[int, ...], hypo_num: int, **kw):
    """XLA DPM-Solver++(2M) completion: same contract as
    ``get_ddim_hypo_sampler``."""
    kw.setdefault("imputation", True)
    return _tile_hypos(lambda s: get_dpm_sampler(sde, model, params, s, **kw),
                       shape, hypo_num)


def get_pallas_ddim_hypo_sampler(sde: SDE, model: ScoreModelFC, params,
                                 shape: Tuple[int, ...], hypo_num: int, **kw):
    """Single-dispatch Pallas DDIM completion: all hypotheses tile into
    rows of one kernel launch (the few-step twin of
    ``fused_em.get_pallas_em_hypo_sampler``). Accepts the kernel's extra
    options (``quant``/``act_amax``, ``bf16_tail_steps``, ``interpret``,
    ``mesh``...)."""
    kw.setdefault("imputation", True)
    return _tile_hypos(
        lambda s: get_pallas_ddim_sampler(sde, model, params, s, **kw),
        shape, hypo_num)


def get_hybrid_hypo_sampler(sde: SDE, model: ScoreModelFC, params,
                            shape: Tuple[int, ...], hypo_num: int, **kw):
    """XLA hybrid (DDIM head + pc tail) completion:
    ``sampler(key, observation [B,D], mask [B,D]) -> (nfe, [B, H, D])``."""
    kw.setdefault("imputation", True)
    return _tile_hypos(
        lambda s: get_hybrid_sampler(sde, model, params, s, **kw),
        shape, hypo_num)


def get_pallas_hybrid_hypo_sampler(sde: SDE, model: ScoreModelFC, params,
                                   shape: Tuple[int, ...], hypo_num: int,
                                   **kw):
    """Two-dispatch Pallas hybrid completion (all hypotheses tiled into
    each kernel launch) — the recommended few-step completion serving
    mode; see ``get_hybrid_sampler`` for the measured rationale."""
    kw.setdefault("imputation", True)
    return _tile_hypos(
        lambda s: get_pallas_hybrid_sampler(sde, model, params, s, **kw),
        shape, hypo_num)
