"""The completion task's entire Adam loop as ONE Pallas TPU kernel.

DPoserComp (ref run/completion.py:95-207) optimizes poses against the
DPoser one-step-denoise loss plus a masked data term for 2x100 Adam steps.
The reference detaches the denoised estimate (ref completion.py:147), so
every step is a *forward-only* network evaluation plus elementwise
arithmetic — and both loss reductions are means of per-element terms, so
the gradient never couples rows. That makes the whole solver fuse into a
single kernel with the score-net weights VMEM-resident (bf16, shared
machinery in ``score_net.py``):

per step i (all per-step scalars precomputed as SMEM tables):
    z      ~ N(0, 1)                     (on-core PRNG or HBM stream)
    pert   = c_m * x + c_s * z           marginal_prob perturbation
    raw    = fwd(pert)                   score net, bf16 matmuls
    x0_hat = ca * pert + cb * raw        one-step denoise (ref :105-110)
    g      = cd * mask * (x - obs) + cp * (x - x0_hat)
    m, v   = Adam moments;  x -= clr_i * m / (sqrt(v * cv_i) + eps)

with cd = 2*w_data_i/(B*D), cp = w_dposer_i*sqrt(1+snr_i)/(B*D) folding
the reference's per-iteration weights (data 100/(1+it), dposer 0.1*(it+1),
ref :151-155) and torch-MSELoss-mean semantics; clr/cv fold optax Adam's
bias corrections. Final output pastes the observed dims
(obs*mask + x*(1-mask), ref :205).

Hypotheses run as extra rows (each hypothesis's mean-loss gradient is
per-element with the same 1/(B*D) divisor, so flattening is exact).
Time strategies '2'/'3' are deterministic per step and become tables;
strategy '1' (random per hypothesis) stays on the XLA path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...diffusion.fast_sampler import _corrector_tables, _labels_for
from ...diffusion.sde import SDE
from ...models.score_mlp import ScoreModelFC
from ...tasks.prior import sample_quan_t
from .score_net import bind_fwd, box_muller, build_network_operands, round_up

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


def _make_kernel(n_steps: int, n_blocks: int, hidden: int, kernel_rng: bool,
                 gn_vpu: bool, ablate: frozenset = frozenset()):
    """refs = [coefs (SMEM [T, 8]), seed (SMEM, kernel_rng only), obs, mask,
    Wpre, W[2*n_blocks], Wpost, bpost, gn args, tp_hbm (ANY [T, n_tp_pad, H]),
    (noise_hbm ANY [T, Bp, Dp] — host mode), out_ref,
    scratch: x_st, m_st, v_st, tp_buf [2, ...], (nz_buf [2, ...]), sems].

    coefs columns: c_m, c_s, ca, cb, cd, cp, clr, cv.
    """

    def kernel(coefs, *rest):
        if kernel_rng:
            seed = rest[0]
            rest = rest[1:]
        obs, msk = rest[:2]
        rest = rest[2:]
        Wpre = rest[0]
        Ws = rest[1:1 + 2 * n_blocks]
        rest = rest[1 + 2 * n_blocks:]
        Wpost, bpost = rest[:2]
        rest = rest[2:]
        n_gn = 2 if gn_vpu else 4
        gn_refs = rest[:n_gn]
        rest = rest[n_gn:]
        if kernel_rng:
            (tp_hbm, out_ref, x_st, m_st, v_st, tp_buf, sem_tp) = rest
            noise_hbm = nz_buf = sem_nz = None
        else:
            (tp_hbm, noise_hbm, out_ref, x_st, m_st, v_st, tp_buf, nz_buf,
             sem_tp, sem_nz) = rest

        fwd = bind_fwd(n_blocks, hidden, gn_vpu, ablate,
                       Wpre, Ws, Wpost, bpost, gn_refs, tp_buf)

        x_st[:] = obs[:]
        m_st[:] = jnp.zeros_like(m_st)
        v_st[:] = jnp.zeros_like(v_st)
        if kernel_rng:
            pltpu.prng_seed(seed[0])

        def tp_dma(slot, step):
            return pltpu.make_async_copy(tp_hbm.at[step], tp_buf.at[slot],
                                         sem_tp.at[slot])

        def nz_dma(slot, step):
            return pltpu.make_async_copy(noise_hbm.at[step], nz_buf.at[slot],
                                         sem_nz.at[slot])

        tp_dma(0, 0).start()
        if not kernel_rng:
            nz_dma(0, 0).start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < n_steps)
            def _():
                tp_dma(nxt, i + 1).start()
                if not kernel_rng:
                    nz_dma(nxt, i + 1).start()

            tp_dma(slot, i).wait()
            if not kernel_rng:
                nz_dma(slot, i).wait()

            x = x_st[:]
            z = box_muller(x.shape) if kernel_rng else nz_buf[slot]
            pert = coefs[i, 0] * x + coefs[i, 1] * z
            raw = fwd(pert, slot)
            x0_hat = coefs[i, 2] * pert + coefs[i, 3] * raw
            g = coefs[i, 4] * (msk[:] * (x - obs[:])) \
                + coefs[i, 5] * (x - x0_hat)
            m = ADAM_B1 * m_st[:] + (1.0 - ADAM_B1) * g
            v = ADAM_B2 * v_st[:] + (1.0 - ADAM_B2) * (g * g)
            m_st[:] = m
            v_st[:] = v
            x_st[:] = x - coefs[i, 6] * m / (jnp.sqrt(v * coefs[i, 7])
                                             + ADAM_EPS)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_ref[:] = obs[:] * msk[:] + x_st[:] * (1.0 - msk[:])

    return kernel


def get_pallas_comp_solver(sde: SDE, model: ScoreModelFC, params,
                           shape: Tuple[int, ...], n_elems: int,
                           lr: float = 0.1, iterations: int = 2,
                           steps_per_iter: int = 100,
                           time_strategy: str = "3",
                           sample_trun: float = 5.0, sample_time: int = 900,
                           eps: float = 1e-3, rng_mode: str = "host",
                           interpret: bool = False, gn: str = "auto",
                           continuous: bool = True, mesh=None,
                           _ablate: frozenset = frozenset()):
    """Build the fused completion solver.

    ``solve(key, observation, mask, noise=None) -> x [B, D]``.

    shape: (rows, D) — rows may be hypo-flattened (hypo * batch).
    n_elems: the PER-HYPOTHESIS element count B*D that the reference's
    ``.mean()`` losses divide by (ref completion.py:196-201) — NOT rows*D
    when rows are hypo-flattened.

    rng_mode "host" streams the per-step perturbation normals from HBM
    ([T, B, D]; ``noise=`` injects them for parity tests); "kernel" draws
    them on-core (fastest, TPU only). The per-step time indices replicate
    the XLA solver's exact PRNG layout, so strategies '2'/'3' match it
    step-for-step; strategy '1' raises (random per hypothesis — use the
    XLA path).

    ``mesh=`` (>1 devices) runs the kernel per-device under ``shard_map``
    with rows sharded along the batch axis and the PRNG key decorrelated by
    ``axis_index`` — the multi-chip form of ref run/completion.py:326-338,
    keeping the single-device kernel's per-chip advantage over the GSPMD
    XLA solver.
    """
    if rng_mode not in ("host", "kernel"):
        raise ValueError(f"rng_mode must be 'host' or 'kernel', got {rng_mode!r}")
    if mesh is not None and mesh.devices.size > 1:
        return _sharded_comp_solver(
            sde, model, params, shape, n_elems, lr, iterations,
            steps_per_iter, time_strategy, sample_trun, sample_time, eps,
            rng_mode, interpret, gn, continuous, mesh, _ablate)
    if not continuous:
        raise NotImplementedError(
            "pallas completion solver folds the continuous-time score "
            "convention into its tables; discrete training uses the XLA path")
    if time_strategy not in ("2", "3"):
        raise NotImplementedError(
            "pallas completion solver supports deterministic time strategies "
            "'2'/'3'; strategy '1' draws a random t per hypothesis — use the "
            "XLA solver")
    batch, dim = shape
    hidden = model.hidden_dim
    n_blocks = model.n_blocks
    total_steps = iterations * steps_per_iter
    batch_p = round_up(batch, 128)
    dim_p = round_up(dim, 128)
    kernel_rng = rng_mode == "kernel"

    # VMEM guard: weights + x/m/v/obs/mask (+2 noise slabs) + ~3 activations
    n_bufs = 5 + (0 if kernel_rng else 2)
    n_tp_pad_est = round_up(1 + 2 * n_blocks, 8)  # = scratch slab's dim below
    est = (2 * (dim * hidden + 2 * n_blocks * hidden * hidden + hidden * dim)
           + 4 * batch_p * dim_p * n_bufs
           + 4 * 3 * batch_p * hidden
           + 4 * 2 * n_tp_pad_est * hidden)
    budget = 100 * 1024 * 1024
    if est > budget:
        raise ValueError(
            f"pallas completion solver needs ~{est / 2**20:.0f} MiB VMEM for "
            f"{batch} rows / hidden {hidden} (budget {budget / 2**20:.0f} "
            f"MiB); reduce the row count (batch or hypotheses)")

    timesteps_full = sde.timesteps(eps)

    # deterministic per-step time indices (same layout as the XLA solver:
    # fold_in(key, i) -> split -> k_t unused for strategies 2/3)
    steps = jnp.arange(total_steps, dtype=jnp.int32)
    quan_t = jax.vmap(
        lambda i: sample_quan_t(jax.random.PRNGKey(0), i, total_steps, sde.N,
                                time_strategy, sample_trun, sample_time,
                                offset=2))(steps)
    t = timesteps_full[quan_t]                                   # [T]
    labels = _labels_for(sde, t)

    net = build_network_operands(model, params, dim, dim_p, labels, gn=gn)
    out_scale = net["out_scale"]

    # per-step scalar tables -------------------------------------------------
    ones = jnp.ones((total_steps,))
    c_m = sde.marginal_prob(ones, t)[0]                          # mean coeff
    c_s = sde.marginal_prob(jnp.zeros((total_steps,)), t)[1]     # std
    alpha, sigma = sde.return_alpha_sigma(t)
    alpha = alpha.reshape(total_steps) if alpha.ndim > 1 else alpha
    sigma2 = sigma ** 2
    # model-out -> score conversion, SDE-aware (VP/subVP: -1/std, ref
    # utils.py:155; VE: identity), with the model's own 1/sigma_ladder
    # output scaling folded in (score_net precomputes out_scale)
    score_scale, _ = _corrector_tables(sde, t, out_scale)
    ca = 1.0 / alpha
    cb = sigma2 * score_scale / alpha
    snr = alpha / jnp.sqrt(sigma2)
    it = steps // steps_per_iter
    w_data = 100.0 / (1.0 + it)
    w_dposer = 0.1 * (it + 1.0)
    cd = 2.0 * w_data / n_elems
    cp = w_dposer * jnp.sqrt(1.0 + snr) / n_elems
    tcount = jnp.arange(1, total_steps + 1, dtype=jnp.float32)
    clr = lr / (1.0 - ADAM_B1 ** tcount)
    cv = 1.0 / (1.0 - ADAM_B2 ** tcount)
    coefs = jnp.stack([c_m, c_s, ca, cb, cd, cp, clr, cv],
                      axis=1).astype(jnp.float32)

    kernel = _make_kernel(total_steps, n_blocks, hidden, kernel_rng,
                          net["gn_vpu"], ablate=_ablate)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]          # coefs
    if kernel_rng:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # seed
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2     # obs, mask
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (
        1 + 2 * n_blocks + 2 + len(net["gn_args"]))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))          # tp_hbm
    if not kernel_rng:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # noise_hbm

    scratch = [
        pltpu.VMEM((batch_p, dim_p), jnp.float32),      # x
        pltpu.VMEM((batch_p, dim_p), jnp.float32),      # m
        pltpu.VMEM((batch_p, dim_p), jnp.float32),      # v
        pltpu.VMEM((2, net["n_tp_pad"], hidden), jnp.float32),
    ]
    if not kernel_rng:
        scratch.append(pltpu.VMEM((2, batch_p, dim_p), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if not kernel_rng:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(), in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch),
        out_shape=jax.ShapeDtypeStruct((batch_p, dim_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    operands = (net["Wpre"], *net["Ws"], net["Wpost"], net["bpost"],
                *net["gn_args"], net["tp_all"])

    def pad_xlike(a):
        return jnp.zeros((batch_p, dim_p), jnp.float32).at[:batch, :dim].set(a)

    @jax.jit
    def solve(key, observation, mask, noise=None):
        obs_p = pad_xlike(observation)
        mask_p = pad_xlike(mask)
        if kernel_rng:
            seed = jax.random.randint(key, (1,), 0, 2 ** 31 - 1, jnp.int32)
            out = call(coefs, seed, obs_p, mask_p, *operands)
        else:
            if noise is None:
                noise_p = jax.random.normal(
                    key, (total_steps, batch_p, dim_p), jnp.float32)
            else:
                noise_p = jnp.zeros((total_steps, batch_p, dim_p), jnp.float32)
                noise_p = noise_p.at[:, :batch, :dim].set(noise)
            out = call(coefs, obs_p, mask_p, *operands, noise_p)
        return out[:batch, :dim]

    return solve


def _sharded_comp_solver(sde, model, params, shape, n_elems, lr, iterations,
                         steps_per_iter, time_strategy, sample_trun,
                         sample_time, eps, rng_mode, interpret, gn,
                         continuous, mesh, _ablate):
    """shard_map the single-device completion kernel over the mesh's batch
    shards (mirrors ``fused_em._sharded_sampler``)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.sharding import DATA_AXIS

    batch, dim = shape
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"rows {batch} must be divisible by the mesh size "
                         f"{n_dev} for the pallas sharded completion solver")
    inner = get_pallas_comp_solver(
        sde, model, params, (batch // n_dev, dim), n_elems, lr=lr,
        iterations=iterations, steps_per_iter=steps_per_iter,
        time_strategy=time_strategy, sample_trun=sample_trun,
        sample_time=sample_time, eps=eps, rng_mode=rng_mode,
        interpret=interpret, gn=gn, continuous=continuous, mesh=None,
        _ablate=_ablate)
    axis = DATA_AXIS
    cache = {}

    def build(has_noise):
        def shard_fn(key, obs, msk, *maybe_noise):
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            noise = maybe_noise[0] if maybe_noise else None
            return inner(key, obs, msk, noise=noise)

        specs = [P(), P(axis, None), P(axis, None)]
        if has_noise:
            specs.append(P(None, axis, None))
        return jax.jit(jax.shard_map(shard_fn, mesh=mesh,
                                     in_specs=tuple(specs),
                                     out_specs=P(axis, None),
                                     check_vma=False))

    def solve(key, observation, mask, noise=None):
        has_noise = noise is not None
        if has_noise not in cache:
            cache[has_noise] = build(has_noise)
        args = (observation, mask) + ((noise,) if has_noise else ())
        return cache[has_noise](key, *args)

    return solve
