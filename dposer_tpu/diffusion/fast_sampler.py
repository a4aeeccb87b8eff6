"""Speed-of-light Euler-Maruyama sampler for ScoreModelFC.

The generic PC sampler (``sampling.py``) evaluates per step: timestep math,
SDE coefficients, the positional time embedding, its shared projection, and
five per-layer time projections — all *independent of x*. At DPoser's scale
(63-dim poses, 1024-wide MLP) the 1000-step loop is bound by per-step op
count, not FLOPs (measured: bf16 matmuls give no speedup).

This sampler precomputes every x-independent quantity as an ``[N, ...]``
table before the scan:

- EM update constants: ``x_mean = cx[i] * x + cout[i] * model_out``,
  ``x = x_mean + cnoise[i] * z`` — the drift/diffusion/score-scale algebra
  for VP/subVP/VE collapses into three scalars per step
- time-embedding path: ``temb -> shared -> act`` then each layer's
  ``Dense(temb)`` contribution, gathered by step index inside the loop

The remaining per-step graph is exactly: 6 matmuls, 3 GroupNorms, SiLUs,
one RNG draw, and 3 scalar-table multiplies.

PRNG layout matches ``get_pc_sampler`` (fold_in(key, i) -> split(4), EM noise
from the 3rd subkey) so outputs are bitwise-comparable to the generic path.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.score_mlp import ScoreModelFC, get_act, get_sigmas
from ..models.time_embedding import get_timestep_embedding
from .sde import SDE, VESDE, VPSDE, SubVPSDE


def _em_tables(sde: SDE, timesteps: jnp.ndarray,
               probability_flow: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-step (cx, cout, cnoise) such that the reverse EM update is
    ``x_mean = cx*x + cout*model_out; x = x_mean + cnoise*z``.

    Derivation: dt = -1/N; drift = f(x,t) - g(t)^2 * score with
    score = -model_out / std(t) for VP/subVP (continuous) and
    score = model_out for VE. ``probability_flow=True`` gives the
    deterministic PF-ODE Euler update (ref sde_lib.py:98-109: halve the
    score term, drop the noise) — the decode step of the interpolation
    protocol (ref demo.py:439-447).
    """
    dt = -1.0 / sde.N
    sqrt_mdt = math.sqrt(1.0 / sde.N)
    if isinstance(sde, (VPSDE, SubVPSDE)):
        beta_t = sde.beta_0 + timesteps * (sde.beta_1 - sde.beta_0)
        _, diffusion = sde.sde(jnp.zeros_like(timesteps), timesteps)
        _, std = sde.marginal_prob(jnp.zeros_like(timesteps), timesteps)
        g2 = diffusion ** 2
        cx = 1.0 + (-0.5 * beta_t) * dt            # x + f(x,t) * dt
        # reverse drift term: -g^2 * score = +g^2 * out / std, times dt
        cout = (g2 / std) * dt
        cnoise = diffusion * sqrt_mdt
    elif isinstance(sde, VESDE):
        _, diffusion = sde.sde(jnp.zeros_like(timesteps), timesteps)
        g2 = diffusion ** 2
        cx = jnp.ones_like(timesteps)
        cout = -g2 * dt                            # drift = -g^2*score, score = out
        cnoise = diffusion * sqrt_mdt
    else:
        raise NotImplementedError(type(sde).__name__)
    if probability_flow:
        cout = 0.5 * cout
        cnoise = jnp.zeros_like(cnoise)
    return cx, cout, cnoise


def _rd_tables(sde: SDE, timesteps: jnp.ndarray,
               probability_flow: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-step (cx, cout, cnoise) for the REVERSE-DIFFUSION predictor
    (ref sampling.py:210-220): ``x_mean = x - rev_f`` with
    ``rev_f = f - G^2 * score`` from the discretized reverse iteration.
    ``f`` is linear with ``f(0)=0`` for every supported family, so
    ``f1 = f(1)`` captures it: ``cx = 1 - f1``, ``cout = G^2 * ss``,
    ``cnoise = G`` (0 under probability flow; the score factor stays FULL
    there — the reference's quirk, ref sde_lib.py:114-115)."""
    f1, G = sde.discretize(jnp.ones((timesteps.shape[0], 1)), timesteps)
    f1 = f1[:, 0]
    G = jnp.broadcast_to(G, timesteps.shape)
    ss, _ = _corrector_tables(sde, timesteps, None)
    cx = 1.0 - f1
    cout = G ** 2 * ss
    cnoise = jnp.zeros_like(G) if probability_flow else G
    return cx, cout, cnoise


def _pred_tables(sde: SDE, timesteps: jnp.ndarray, predictor: str,
                 probability_flow: bool = False):
    """Dispatch (cx, cout, cnoise) tables by predictor name."""
    if predictor == "euler_maruyama":
        return _em_tables(sde, timesteps, probability_flow=probability_flow)
    if predictor == "reverse_diffusion":
        return _rd_tables(sde, timesteps, probability_flow=probability_flow)
    raise NotImplementedError(
        f"tabled samplers support euler_maruyama/reverse_diffusion; "
        f"got {predictor!r}")


def _pf_tables(sde: SDE, taus: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-grid-point (a1, a2) such that the probability-flow-ODE drift is
    ``a1[j]*x + a2[j]*model_out`` (ref sde_lib.py:98-109 with
    probability_flow=True: f - (1/2) g^2 score, score = -out/std for
    VP/subVP continuous, = out for VE)."""
    if isinstance(sde, (VPSDE, SubVPSDE)):
        beta_t = sde.beta_0 + taus * (sde.beta_1 - sde.beta_0)
        _, diffusion = sde.sde(jnp.zeros_like(taus), taus)
        _, std = sde.marginal_prob(jnp.zeros_like(taus), taus)
        a1 = -0.5 * beta_t
        a2 = 0.5 * diffusion ** 2 / std
        return a1, a2
    if isinstance(sde, VESDE):
        _, diffusion = sde.sde(jnp.zeros_like(taus), taus)
        return jnp.zeros_like(taus), -0.5 * diffusion ** 2
    raise NotImplementedError(type(sde).__name__)


def _labels_for(sde: SDE, timesteps: jnp.ndarray) -> jnp.ndarray:
    if isinstance(sde, (VPSDE, SubVPSDE)):
        return timesteps * 999
    # VE continuous conditions on sigma(t)
    return sde.marginal_prob(jnp.zeros_like(timesteps), timesteps)[1]


def precompute_time_tables(model: ScoreModelFC, params, labels: jnp.ndarray):
    """All x-independent network quantities per step.

    Returns (tprojs: dict name -> [N, H], out_scale: [N] or None).
    """
    act = get_act(model.act_name)
    if model.embedding_type != "positional":
        raise NotImplementedError("fast sampler supports positional embeddings")
    # tables must come out in the params' dtype: get_timestep_embedding is
    # fp32, and an fp32 table would promote the whole forward back to fp32
    # (a bf16 sampler's scan carry then mismatches its init)
    dt = jax.tree.leaves(params)[0].dtype
    temb = get_timestep_embedding(labels, model.embed_dim).astype(dt)
    p = params["shared_time_embed_0"]
    temb = act(temb @ p["kernel"] + p["bias"])

    names = ["pre_dense_t"] + [f"b{i + 1}_dense{j}_t" for i in range(model.n_blocks)
                               for j in (1, 2)]
    tprojs = {}
    for name in names:
        q = params[name]
        tprojs[name] = temb @ q["kernel"] + q["bias"]

    out_scale = None
    if model.scale_by_sigma:
        sigmas = jnp.asarray(get_sigmas(model.sigma_min, model.sigma_max,
                                        model.num_scales))
        out_scale = (1.0 / sigmas[labels.astype(jnp.int32)]).astype(dt)
    return tprojs, out_scale


def _group_norm(h, scale, bias, num_groups=32, eps=1e-5):
    b, c = h.shape
    g = h.reshape(b, num_groups, c // num_groups)
    mean = g.mean(-1, keepdims=True)
    var = g.var(-1, keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(b, c) * scale + bias


def make_fast_forward(model: ScoreModelFC, params, tprojs, out_scale):
    """Step-indexed network forward: fwd(x, i) -> model_out."""
    act = get_act(model.act_name)

    def fwd(x, i):
        p = params["pre_dense"]
        h = x @ p["kernel"] + p["bias"] + tprojs["pre_dense_t"][i]
        g = params["pre_gnorm"]
        h = act(_group_norm(h, g["scale"], g["bias"]))
        for blk in range(model.n_blocks):
            q = params[f"b{blk + 1}_dense1"]
            h1 = h @ q["kernel"] + q["bias"] + tprojs[f"b{blk + 1}_dense1_t"][i]
            g = params[f"b{blk + 1}_gnorm1"]
            h1 = act(_group_norm(h1, g["scale"], g["bias"]))
            q = params[f"b{blk + 1}_dense2"]
            h2 = h1 @ q["kernel"] + q["bias"] + tprojs[f"b{blk + 1}_dense2_t"][i]
            g = params[f"b{blk + 1}_gnorm2"]
            h2 = act(_group_norm(h2, g["scale"], g["bias"]))
            h = h + h2
        p = params["post_dense"]
        res = h @ p["kernel"] + p["bias"]
        if out_scale is not None:
            res = res * out_scale[i]
        return res

    return fwd


def _corrector_tables(sde: SDE, timesteps: jnp.ndarray, out_scale):
    """Per-step (score_scale, alpha) for the langevin corrector.

    score = score_scale[i] * raw_model_out (folds the sigma-table output
    scaling and the -1/std score adapter); alpha is the discrete
    sqrt-cumprod-free alpha the corrector's step size uses
    (ref sampling.py:280-287).
    """
    if isinstance(sde, (VPSDE, SubVPSDE)):
        _, std = sde.marginal_prob(jnp.zeros_like(timesteps), timesteps)
        score_scale = -1.0 / std
        timestep_idx = (timesteps * (sde.N - 1) / sde.T).astype(jnp.int32)
        alpha = sde.alphas()[timestep_idx]
    elif isinstance(sde, VESDE):
        score_scale = jnp.ones_like(timesteps)
        alpha = jnp.ones_like(timesteps)
    else:
        raise NotImplementedError(type(sde).__name__)
    if out_scale is not None:
        score_scale = score_scale * out_scale
    return score_scale, alpha


def _imputation_tables(sde: SDE, timesteps: jnp.ndarray):
    """Per-step (mean_coeff, std) such that the re-noised observation is
    ``mc[i]*obs + std[i]*z`` (ref sampling.py:418-421)."""
    ones = jnp.ones((timesteps.shape[0], 1))
    mean, std = sde.marginal_prob(ones, timesteps)
    return mean[:, 0], std


def get_fast_pc_sampler(sde: SDE, model: ScoreModelFC, params,
                        shape: Tuple[int, ...], eps: float = 1e-3,
                        denoise: bool = True, corrector: str = "none",
                        snr: float = 0.16, n_corrector_steps: int = 1,
                        imputation: bool = False,
                        predictor: str = "euler_maruyama",
                        probability_flow: bool = False,
                        step_range: Optional[Tuple[int, int]] = None,
                        jit: bool = True):
    """Tabled PC sampler: EM predictor + optional langevin corrector +
    optional imputation, with the SAME per-step tables the Pallas kernel
    uses.

    ``step_range=(lo, hi)`` runs only rows ``lo..hi`` of the N-step grid
    (state in/out via ``z=`` / the return) — the XLA twin of the Pallas
    kernel's option. Exact: every per-step table is a function of the
    timestep VALUE and ``sde.N`` only, and the generic-mode PRNG folds the
    GLOBAL step index, so head+tail under one key is bitwise the full run
    (pinned in tests/test_few_step.py::test_fast_pc_step_range_is_exact).

    Two PRNG modes:

    - ``sampler(key, observation=None, mask=None, z=None)``: draws with the
      generic ``get_pc_sampler`` layout (fold_in(key, i) -> split 4 ->
      kc/kci/kp/kpi; corrector step j draws from fold_in(kc, j)), so outputs
      are bitwise-comparable to the generic sampler — and transitively to
      the reference torch loop (tests/test_checkpoint_parity.py).
    - ``noise=[N, K, B, D]``: injected slabs in kernel order
      (corr_0..corr_{S-1}, imput_c, em, imput_p — present slots only), the
      contract the Pallas kernel's host-rng mode consumes.
    """
    assert corrector in ("none", "langevin")
    timesteps = sde.timesteps(eps)
    lo = 0
    if step_range is not None:
        lo, hi = step_range
        if not 0 <= lo < hi <= int(timesteps.shape[0]):
            raise ValueError(f"step_range {step_range} out of bounds for "
                             f"the {int(timesteps.shape[0])}-step grid")
        timesteps = timesteps[lo:hi]
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _pred_tables(sde, timesteps, predictor,
                                    probability_flow=probability_flow)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    score_scale, alpha = _corrector_tables(sde, timesteps, out_scale)
    mc, istd = _imputation_tables(sde, timesteps)
    if out_scale is not None:
        cout = cout * out_scale
    fwd = make_fast_forward(model, params, tprojs, None)  # scales folded
    N = int(timesteps.shape[0])
    S = n_corrector_steps if corrector == "langevin" else 0
    n_imp = 2 if imputation else 0
    K = S + n_imp + 1

    def langevin_step(x, i, z):
        score = score_scale[i] * fwd(x, i)
        grad_norm = jnp.mean(jnp.sqrt(jnp.sum(score * score, axis=-1)))
        noise_norm = jnp.mean(jnp.sqrt(jnp.sum(z * z, axis=-1)))
        step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha[i]
        x_mean = x + step_size * score
        return x_mean + jnp.sqrt(step_size * 2) * z

    def impute(x, i, z, observation, mask):
        masked = mc[i] * observation + istd[i] * z
        return x * (1 - mask) + masked * mask

    def em_step(x, i, z):
        x_mean = cx[i] * x + cout[i] * fwd(x, i)
        return x_mean + cnoise[i] * z, x_mean

    def sampler(key, observation=None, mask=None, z=None, noise=None):
        if noise is not None and noise.shape[1] != K:
            raise ValueError(f"noise needs K={K} slabs per step (got "
                             f"{noise.shape[1]}): {S} corrector + "
                             f"{n_imp} imputation + 1 predictor")
        if z is None:
            key, sub = jax.random.split(key)
            x = sde.prior_sampling(sub, shape)
        else:
            x = z

        def draws_generic(i):
            # fold the GLOBAL grid index so a step_range split under one
            # key reproduces the full run's draws bitwise
            kc, kci, kp, kpi = jax.random.split(
                jax.random.fold_in(key, i + lo), 4)
            out = [jax.random.normal(jax.random.fold_in(kc, j), shape)
                   for j in range(S)]
            if imputation:
                out.append(jax.random.normal(kci, shape))
            out.append(jax.random.normal(kp, shape))
            if imputation:
                out.append(jax.random.normal(kpi, shape))
            return out

        def step(carry, i):
            x, _ = carry
            zs = (list(noise[i]) if noise is not None else draws_generic(i))
            k = 0
            for j in range(S):
                x = langevin_step(x, i, zs[k])
                k += 1
            if imputation:
                x = impute(x, i, zs[k], observation, mask)
                k += 1
            x, x_mean = em_step(x, i, zs[k])
            k += 1
            if imputation:
                x = impute(x, i, zs[k], observation, mask)
            return (x, x_mean), None

        (x, x_mean), _ = jax.lax.scan(step, (x, x), jnp.arange(N, dtype=jnp.int32))
        return None, (x_mean if denoise else x)

    return jax.jit(sampler) if jit else sampler


def get_fast_em_sampler(sde: SDE, model: ScoreModelFC, params,
                        shape: Tuple[int, ...], eps: float = 1e-3,
                        denoise: bool = True, dtype=jnp.float32,
                        pregenerate_noise: bool = False, jit: bool = True):
    """Build the fused EM sampler (predictor=euler_maruyama, corrector=none).

    ``pregenerate_noise`` draws all step noise in ONE RNG call before the
    scan (different stream than the generic sampler; slightly faster).
    """
    # table math stays fp32 (subVP's 1-exp(-x) cancels catastrophically in
    # bf16, driving std -> 0 and cout -> inf); only the RESULTS cast down
    timesteps = sde.timesteps(eps)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = (t.astype(dtype) for t in _em_tables(sde, timesteps))
    cast_params = jax.tree.map(lambda a: a.astype(dtype), params)
    tprojs, out_scale = precompute_time_tables(model, cast_params, labels)
    fwd = make_fast_forward(model, cast_params, tprojs, out_scale)
    N = sde.N

    def sampler(key, z: Optional[jnp.ndarray] = None):
        if z is None:
            key, sub = jax.random.split(key)
            x = sde.prior_sampling(sub, shape).astype(dtype)
        else:
            x = z.astype(dtype)

        if pregenerate_noise:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, (N,) + shape, dtype)

            def step(carry, i):
                x, _ = carry
                out = fwd(x, i)
                x_mean = cx[i] * x + cout[i] * out
                return (x_mean + cnoise[i] * noise[i], x_mean), None
        else:

            def step(carry, i):
                x, _ = carry
                # same PRNG layout as the generic PC sampler (kp = 3rd split)
                _, _, kp, _ = jax.random.split(jax.random.fold_in(key, i), 4)
                z_i = jax.random.normal(kp, shape, dtype)
                out = fwd(x, i)
                x_mean = cx[i] * x + cout[i] * out
                return (x_mean + cnoise[i] * z_i, x_mean), None

        (x, x_mean), _ = jax.lax.scan(step, (x, x), jnp.arange(N, dtype=jnp.int32))
        return None, (x_mean if denoise else x)

    return jax.jit(sampler) if jit else sampler


def get_fast_ode_sampler(sde: SDE, model: ScoreModelFC, params,
                         shape: Tuple[int, ...], n_steps: int = 125,
                         eps: float = 1e-3, denoise: bool = False,
                         jit: bool = True):
    """Tabled fixed-grid RK4 probability-flow-ODE sampler.

    Fast path for ``get_ode_sampler`` (ref sampling.py:471-542, which
    round-trips scipy per RHS eval; our adaptive on-device RK45 stays the
    accuracy oracle): the PF-ODE drift coefficients, time embeddings, and
    per-layer time projections are precomputed on a 2*n_steps+1 stage-time
    grid, so each of the ``4*n_steps`` network evaluations is exactly the
    6-matmul fast forward. RK4 at 125 steps (500 evals) integrates the
    smooth PF-ODE tighter than Euler at 1000, at half the evals of the
    adaptive solver's typical budget.

    ``sampler(key, z=None) -> (nfe, x)`` matching the ``get_ode_sampler``
    contract (nfe is the static 4*n_steps).
    """
    M = n_steps
    # stage-time grid tau_j = T + j*h/2, j = 0..2M (integrating T -> eps)
    taus = jnp.linspace(sde.T, eps, 2 * M + 1)
    h = (eps - sde.T) / M
    labels = _labels_for(sde, taus)
    a1, a2 = _pf_tables(sde, taus)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    if out_scale is not None:
        a2 = a2 * out_scale
    fwd = make_fast_forward(model, params, tprojs, None)  # scale folded in a2

    # optional final denoise: one noise-free reverse-diffusion step at eps
    # (ref sampling.py:492-498) using the tabled score at the last grid point
    score_scale_eps, _ = _corrector_tables(
        sde, taus[-1:], None if out_scale is None else out_scale[-1:])

    def drift(x, j):
        return a1[j] * x + a2[j] * fwd(x, j)

    def step(x, i):
        j = 2 * i
        k1 = drift(x, j)
        k2 = drift(x + 0.5 * h * k1, j + 1)
        k3 = drift(x + 0.5 * h * k2, j + 1)
        k4 = drift(x + h * k3, j + 2)
        return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4), None

    def sampler(key, z: Optional[jnp.ndarray] = None):
        if z is None:
            key, sub = jax.random.split(key)
            x = sde.prior_sampling(sub, shape)
        else:
            x = z
        x, _ = jax.lax.scan(step, x, jnp.arange(M, dtype=jnp.int32))
        if denoise:
            last = 2 * M
            score_fn_eps = lambda xv, tv: score_scale_eps[0] * fwd(xv, last)  # noqa: E731
            rdisc = sde.reverse_discretize(score_fn_eps, probability_flow=False)
            vec_eps = jnp.full((x.shape[0],), eps, x.dtype)
            f, _ = rdisc(x, vec_eps)
            x = x - f
        return 4 * M, x

    return jax.jit(sampler) if jit else sampler
