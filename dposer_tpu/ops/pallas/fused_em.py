"""The entire reverse-diffusion loop as ONE Pallas TPU kernel.

Motivation (measured on TPU v5e, steady-state — see PERFORMANCE.md): the
XLA ``lax.scan`` sampler spends ~106 us/step because every step re-streams
the ~8 MB of weights from HBM and runs fp32 matmuls (~3x bf16 cost). This
kernel runs the full loop inside a single program at ~36 us/step:

- all network weights live in VMEM for the whole kernel (bf16: ~8.3 MB for
  the flagship 1024-wide model), cast once at build time
- per-step time-projection rows (precomputed bias+temb contributions) and
  pregenerated Gaussian noise stream from HBM with double-buffered DMA
  (or are drawn on-core with the TPU PRNG in ``rng_mode="kernel"``)
- GroupNorm needs zero matmuls: the hidden dim is pre-permuted so groups
  are lane-strided and group stats collapse to VPU tile sums + lane rolls
  (``group_norm_vpu``; group-indicator matmul fallback for hidden % 128)
- the EM update collapses to 3 scalars per step: x <- cx*x + cout*out + cn*z
  (cout folds the 1/sigma(t) output scaling)

Integration state x stays fp32; matmul inputs are cast to bf16 (the noise
injection dwarfs bf16 rounding — validated against the XLA fast sampler).

Scope: ScoreModelFC topology (any n_blocks), positional embeddings,
predictor=euler_maruyama, corrector in {none, langevin}, optional masked
imputation — i.e. every flagship DPoser protocol: generation
(ref run/demo.py:130), the APD/SI metrics run (langevin corrector,
ref run/demo.py:142 + sampling.py:273-302) and completion2 imputation
(ref sampling.py:410-427).

Langevin note: the corrector's step size normalizes by batch-mean gradient/
noise norms (ref sampling.py:287-292). Grid blocks run their full N-step
loops sequentially, so cross-block means per step are structurally
impossible — corrector runs therefore WIDEN the block to cover the whole
batch (norms stay exact); if that doesn't fit the VMEM budget the builder
raises and callers fall back to the XLA sampler (run/demo.py wraps every
build in try/except for exactly this).

Multi-chip: pass ``mesh=`` to run the kernel per-device under ``shard_map``
with the batch dim sharded (each chip executes the full N-step loop on its
shard; PRNG decorrelated by ``axis_index``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...diffusion.fast_sampler import (_corrector_tables, _imputation_tables,
                                       _labels_for, _pred_tables)
from ...diffusion.sde import SDE
from ...models.score_mlp import ScoreModelFC
from .score_net import (bind_fwd, box_muller as _box_muller,
                        build_network_operands, round_up as _round_up)


def _make_kernel(n_steps: int, n_blocks: int, batch: int, batch_blk: int,
                 dim: int, dim_p: int, hidden: int, denoise: bool,
                 kernel_rng: bool, n_corr: int, imputation: bool, snr: float,
                 gridded: bool = True, gn_vpu: bool = False,
                 ablate: frozenset = frozenset(), quant_inv=None):
    """Kernel body builder. Ref layout (all VMEM unless noted):

    refs = [coefs (SMEM [N, 8]), seed (SMEM [1], kernel_rng only),
            x0, (obs, mask — imputation only),
            Wpre, W[2*n_blocks], Wpost, bpost,
            gn_vpu: gn_scale (VMEM [1+2*n_blocks, H]), gn_bias;
            else:   Gts (VMEM [1+2*n_blocks, NG, H], scale-folded), gn_bias,
                    G (VMEM [H, NG], mean-normalized), Gt (VMEM [NG, H]),
            quant: qs_h (VMEM [rows, H]; the output head stays bf16),
            tp_hbm (ANY [N, n_tp_pad, H]),
            noise_hbm (ANY [N, K, Bp, Dp], host-rng mode only),
            out_ref,
            scratch: x_st, tp_buf [2,...],
            (host-rng: nz_buf [2, K, ...], sem_nz [2]), sem_tp [2]]

    coefs columns: cx, cout, cnoise, score_scale, alpha, imput_mean,
    imput_std, (pad). ``quant_inv``: static 127/amax immediates — present
    iff the weight refs are int8 (see score_net.bind_fwd).
    """
    n_tp = 1 + 2 * n_blocks
    K = n_corr + (2 if imputation else 0) + 1  # noise slabs per step


    def kernel(coefs, *rest):
        if kernel_rng:
            seed, x0 = rest[:2]
            rest = rest[2:]
        else:
            (x0,) = rest[:1]
            rest = rest[1:]
        if imputation:
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
        quant = None
        if quant_inv == "per_channel":
            quant = (rest[0], rest[1])  # qs_h, qinv rows (bf16 head)
            rest = rest[2:]
        elif quant_inv is not None:
            quant = (rest[0], quant_inv)  # qs_h, act_inv (bf16 head)
            rest = rest[1:]
        if kernel_rng:
            (tp_hbm, out_ref, x_st, tp_buf, sem_tp) = rest
            noise_hbm = nz_buf = sem_nz = None
        else:
            (tp_hbm, noise_hbm, out_ref, x_st, tp_buf, nz_buf,
             sem_tp, sem_nz) = rest

        fwd = bind_fwd(n_blocks, hidden, gn_vpu, ablate,
                       Wpre, Ws, Wpost, bpost, gn_refs, tp_buf, quant=quant)

        i_blk = pl.program_id(0) if gridded else 0
        row0 = i_blk * batch_blk

        x_st[:] = x0[:]
        if kernel_rng:
            # decorrelate the PRNG stream across batch blocks
            pltpu.prng_seed(seed[0] + i_blk)

        # masks for the corrector's batch-mean norms: exclude padded rows
        # (their score is NOT zero — biases flow through) and padded dims of
        # kernel-drawn noise
        if n_corr:
            rows = jax.lax.broadcasted_iota(jnp.int32, (batch_blk, dim_p), 0)
            n_real = jnp.clip(batch - row0, 0, batch_blk)
            row_mask = (rows < n_real).astype(jnp.float32)
            dims = jax.lax.broadcasted_iota(jnp.int32, (batch_blk, dim_p), 1)
            dim_mask = (dims < dim).astype(jnp.float32)
            norm_mask = row_mask * dim_mask
            inv_n_real = 1.0 / n_real.astype(jnp.float32)

        def tp_dma(slot, step):
            return pltpu.make_async_copy(tp_hbm.at[step], tp_buf.at[slot],
                                         sem_tp.at[slot])

        def nz_dma(slot, step):
            return pltpu.make_async_copy(
                noise_hbm.at[step, :, pl.ds(row0, batch_blk)], nz_buf.at[slot],
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

            def draw(k):
                if kernel_rng:
                    return _box_muller((batch_blk, dim_p))
                return nz_buf[slot, k]

            x = x_st[:]
            k = 0

            # --- langevin corrector (ref sampling.py:273-302) --------------
            for _j in range(n_corr):
                score = coefs[i, 3] * fwd(x, slot)
                z = draw(k)
                k += 1
                # batch-mean row norms over real rows/dims only
                if "corrnorm" in ablate:  # measurement-only ablation
                    step_size = snr ** 2 * 2.0 * coefs[i, 4]
                else:
                    rn = jnp.sqrt(jnp.sum(score * score, axis=1, keepdims=True))
                    zn = jnp.sqrt(jnp.sum(z * z * norm_mask, axis=1, keepdims=True))
                    grad_norm = jnp.sum(rn * row_mask[:, :1]) * inv_n_real
                    noise_norm = jnp.sum(zn * row_mask[:, :1]) * inv_n_real
                    step_size = (snr * noise_norm / grad_norm) ** 2 * 2.0 * coefs[i, 4]
                x = x + step_size * score + jnp.sqrt(2.0 * step_size) * z

            # --- imputation after the corrector (ref sampling.py:410-427) --
            if imputation:
                zi = draw(k)
                k += 1
                masked = coefs[i, 5] * obs[:] + coefs[i, 6] * zi
                x = x * (1.0 - msk[:]) + masked * msk[:]

            # --- EM predictor ----------------------------------------------
            res = fwd(x, slot)
            x_mean = coefs[i, 0] * x + coefs[i, 1] * res
            if "noise" in ablate:  # measurement-only ablation
                x_new = x_mean
            else:
                x_new = x_mean + coefs[i, 2] * draw(k)
            k += 1

            if imputation:
                zi = draw(k)
                masked = coefs[i, 5] * obs[:] + coefs[i, 6] * zi
                x_new = x_new * (1.0 - msk[:]) + masked * msk[:]

            x_st[:] = x_new

            @pl.when(i == n_steps - 1)
            def _():
                out_ref[:] = x_mean if denoise else x_st[:]

            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

    return kernel


def get_pallas_em_sampler(sde: SDE, model: ScoreModelFC, params,
                          shape: Tuple[int, ...], eps: float = 1e-3,
                          denoise: bool = True, interpret: bool = False,
                          rng_mode: str = "host", batch_block: int = 512,
                          corrector: str = "none", snr: float = 0.16,
                          n_corrector_steps: int = 1, imputation: bool = False,
                          mesh=None, gn: str = "auto",
                          probability_flow: bool = False,
                          predictor: str = "euler_maruyama",
                          quant: str = None, act_amax=None,
                          bf16_tail_steps: int = 0,
                          step_range: Tuple[int, int] = None,
                          _tables_override=None,
                          _ablate: frozenset = frozenset()):
    """Build the single-kernel PC sampler.

    ``quant="int8"`` (opt-in serving mode; requires ``act_amax`` from
    ``quant.calibrate_act_amax``) runs the dense matmuls on the MXU's
    int8 path — symmetric per-column weights, static per-tensor
    activation scales — with GN/SiLU/EM math unchanged in fp32. Measured
    quality/throughput in PERFORMANCE.md "int8 serving mode"; the default
    bf16 path is untouched.

    ``bf16_tail_steps=K`` (with ``quant="int8"``) composes a mixed-
    precision schedule: int8 matmuls for the first N−K steps (far from
    the data manifold, where per-step noise injection dwarfs rounding)
    and the default bf16 kernel for the last K (near the manifold, where
    score precision dominates — the regime where all-int8 degrades the
    imputation/completion path, PERFORMANCE.md "Quality vs NFE"). Two
    kernel dispatches; the split is EXACT for a fixed precision (the
    per-step coefficient tables depend only on the timestep value and
    ``sde.N``, not the grid length — pinned by
    ``tests/test_quant.py::test_step_range_split_is_exact``).

    ``step_range=(lo, hi)`` runs only rows ``lo..hi`` of the N-step
    schedule grid (state carried in/out via ``z=`` / the return value);
    used by the mixed-precision composition above.

    ``predictor`` may be 'euler_maruyama' or 'reverse_diffusion' — both
    collapse to the same 3-scalar per-step update, only the coefficient
    tables differ (``fast_sampler._pred_tables``).

    ``probability_flow=True`` runs the deterministic PF-ODE Euler update
    (score term halved, noise coefficient zero — the interpolation
    protocol's decode, ref demo.py:439-447) through the same kernel.

    ``sampler(key, observation=None, mask=None, z=None, noise=None) ->
    (None, x)``. Weight/table precomputation happens once at build time
    (host/XLA); the returned callable launches exactly one TPU kernel
    (per device, when ``mesh`` is given).

    ``_tables_override=(timesteps, cx, cout, cnoise)`` replaces the EM
    coefficient tables (and the step count) with caller-built rows whose
    ``cout`` already folds any sigma output scaling — the few-step DDIM
    path (``diffusion/few_step.py``) reuses the whole kernel this way.

    rng_mode: "host" streams pregenerated normals from HBM as [N, K, B, D]
    slabs in kernel order corr_0..corr_{S-1}, imput_c, em, imput_p (stream
    reproducible under jax PRNG; ``noise=`` injects them for tests — a plain
    [N, B, D] array is accepted when K == 1); "kernel" draws Box-Muller
    normals from the on-core PRNG (no noise array, no per-step noise DMA —
    fastest; TPU only).
    """
    assert rng_mode in ("host", "kernel")
    if corrector not in ("none", "langevin"):
        raise NotImplementedError(
            f"pallas sampler: corrector '{corrector}' not supported")
    n_corr = n_corrector_steps if corrector == "langevin" else 0
    K = n_corr + (2 if imputation else 0) + 1

    if bf16_tail_steps:
        if quant != "int8" or _tables_override is not None \
                or step_range is not None:
            raise ValueError("bf16_tail_steps requires quant='int8' and is "
                             "incompatible with _tables_override/step_range")
        n_total = int(sde.N)
        k_tail = int(bf16_tail_steps)
        if not 0 < k_tail < n_total:
            raise ValueError(f"bf16_tail_steps must be in (0, {n_total}); "
                             f"got {k_tail}")
        common = dict(eps=eps, interpret=interpret, rng_mode=rng_mode,
                      batch_block=batch_block, corrector=corrector, snr=snr,
                      n_corrector_steps=n_corrector_steps,
                      imputation=imputation, mesh=mesh, gn=gn,
                      probability_flow=probability_flow, predictor=predictor,
                      _ablate=_ablate)
        head = get_pallas_em_sampler(sde, model, params, shape, denoise=False,
                                     quant="int8", act_amax=act_amax,
                                     step_range=(0, n_total - k_tail),
                                     **common)
        tail = get_pallas_em_sampler(sde, model, params, shape,
                                     denoise=denoise,
                                     step_range=(n_total - k_tail, n_total),
                                     **common)

        def mixed(key, observation=None, mask=None, z=None, noise=None):
            k_head, k_tail_key = jax.random.split(key)
            nh = nt = None
            if noise is not None:
                if noise.ndim == 3:
                    noise = noise[:, None]
                nh, nt = noise[: n_total - k_tail], noise[n_total - k_tail:]
            _, x = head(k_head, observation=observation, mask=mask, z=z,
                        noise=nh)
            return tail(k_tail_key, observation=observation, mask=mask, z=x,
                        noise=nt)

        return mixed

    if mesh is not None and mesh.devices.size > 1:
        return _sharded_sampler(sde, model, params, shape, eps, denoise,
                                interpret, rng_mode, batch_block, corrector,
                                snr, n_corrector_steps, imputation, mesh,
                                gn, probability_flow, predictor, quant,
                                act_amax, step_range, _tables_override,
                                _ablate)

    kernel_rng = rng_mode == "kernel"
    batch, dim = shape
    hidden = model.hidden_dim
    n_blocks = model.n_blocks
    # grid over batch blocks: arbitrary batch sizes run block-sequentially
    # with weights VMEM-resident, each block doing the full N-step loop
    batch_blk = min(_round_up(batch, 128), batch_block)
    if n_corr and _round_up(batch, batch_blk) > batch_blk:
        # the corrector's step size needs BATCH-mean norms every step (ref
        # sampling.py:287-292), but blocks run their N-step loops
        # sequentially — cross-block per-step means are impossible. Widen
        # the block to cover the batch (exact norms); the VMEM guard below
        # rejects what doesn't fit so callers fall back to the XLA sampler.
        batch_blk = _round_up(batch, 128)
    batch_p = _round_up(batch, batch_blk)
    n_blk = batch_p // batch_blk
    dim_p = _round_up(dim, 128)
    # VMEM budget guard: weights (bf16, or int8 in quant mode) + x/noise/tp
    # buffers + ~3 live activations must fit on-core; refuse early with a
    # clear error so callers can fall back to the XLA sampler.
    h = hidden
    wb = 1 if quant == "int8" else 2  # weight bytes (int8 keeps a bf16 head)
    n_x_bufs = 1 + (2 if imputation else 0) + (0 if kernel_rng else 2 * K)
    est = (wb * (dim * h + 2 * n_blocks * h * h) + 2 * h * dim             # weights
           + 4 * (batch_blk * dim_p) * (1 + n_x_bufs)
           + 4 * 3 * batch_blk * h                                         # activations
           + 4 * 2 * 8 * h)                                                # tp buffers
    _VMEM_BUDGET = 100 * 1024 * 1024
    if est > _VMEM_BUDGET:
        why = (f"the {corrector} corrector needs one block over the whole "
               f"batch {batch} for exact batch-mean norms"
               if n_corr and batch_blk > batch_block else
               f"batch_block {batch_block}")
        raise ValueError(
            f"pallas fused sampler needs ~{est / 2**20:.0f} MiB VMEM for "
            f"{why} / hidden {h} (budget {_VMEM_BUDGET / 2**20:.0f} MiB); "
            f"reduce the batch or use the XLA sampler")

    if _tables_override is None:
        timesteps = sde.timesteps(eps)
        if step_range is not None:
            lo, hi = step_range
            if not 0 <= lo < hi <= int(timesteps.shape[0]):
                raise ValueError(f"step_range {step_range} out of bounds for "
                                 f"the {int(timesteps.shape[0])}-step grid")
            # exact: every per-step table below is a function of the
            # timestep VALUE and sde.N only (dt = -1/N), never the grid
            # length, so a sliced grid runs those steps bit-identically
            timesteps = timesteps[lo:hi]
        cx, cout, cnoise = _pred_tables(sde, timesteps, predictor,
                                        probability_flow=probability_flow)
    else:
        timesteps, cx, cout, cnoise = _tables_override
    n_steps = int(timesteps.shape[0])
    labels = _labels_for(sde, timesteps)
    net = build_network_operands(model, params, dim, dim_p, labels, gn=gn,
                                 quant=quant, act_amax=act_amax)
    out_scale = net["out_scale"]
    score_scale, alpha = _corrector_tables(sde, timesteps, out_scale)
    imput_mc, imput_std = _imputation_tables(sde, timesteps)
    if out_scale is not None and _tables_override is None:
        cout = cout * out_scale
    coefs = jnp.stack([cx, cout, cnoise, score_scale, alpha, imput_mc,
                       imput_std, jnp.zeros_like(cx)], axis=1).astype(jnp.float32)
    Wpre, Ws, Wpost, bpost = net["Wpre"], net["Ws"], net["Wpost"], net["bpost"]
    gn_args, gn_vpu, tp_all = net["gn_args"], net["gn_vpu"], net["tp_all"]
    n_tp_pad = net["n_tp_pad"]
    nq = net["quant"]
    if nq is None:
        q_args, q_inv = (), None
    elif nq.get("qinv") is not None:  # per-channel rows ride as a VMEM ref
        q_args, q_inv = (nq["qs_h"], nq["qinv"]), "per_channel"
    else:
        q_args, q_inv = (nq["qs_h"],), nq["act_inv"]

    kernel = _make_kernel(n_steps, n_blocks, batch, batch_blk, dim, dim_p,
                          hidden, denoise, kernel_rng, n_corr, imputation,
                          snr, gridded=n_blk > 1, gn_vpu=gn_vpu,
                          ablate=_ablate, quant_inv=q_inv)

    def blocked(spec_shape, index_map):
        return pl.BlockSpec(spec_shape, index_map, memory_space=pltpu.VMEM)

    x_like_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if n_blk == 1 else
                   blocked((batch_blk, dim_p), lambda i: (i, 0)))

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]          # coefs
    if kernel_rng:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # seed
    in_specs.append(x_like_spec)                                # x0
    if imputation:
        in_specs += [x_like_spec, x_like_spec]                  # obs, mask
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # Wpre
        *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2 * n_blocks)],
        pl.BlockSpec(memory_space=pltpu.VMEM),   # Wpost
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bpost
        *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in gn_args],
        *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in q_args],
        pl.BlockSpec(memory_space=pl.ANY),       # tp_hbm
    ]
    if not kernel_rng:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # noise_hbm

    scratch = [
        pltpu.VMEM((batch_blk, dim_p), jnp.float32),     # x state
        pltpu.VMEM((2, n_tp_pad, hidden), jnp.float32),  # tp double buffer
    ]
    if not kernel_rng:
        scratch.append(pltpu.VMEM((2, K, batch_blk, dim_p), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))        # sem_tp
    if not kernel_rng:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))    # sem_nz

    out_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if n_blk == 1 else
                blocked((batch_blk, dim_p), lambda i: (i, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=() if n_blk == 1 else (n_blk,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch_p, dim_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def pad_xlike(a):
        return jnp.zeros((batch_p, dim_p), jnp.float32).at[:batch, :dim].set(a)

    @jax.jit
    def sampler(key, observation=None, mask=None, z=None, noise=None):
        if (observation is None) != (mask is None) or \
                (observation is None) == imputation:
            raise ValueError("observation/mask must be passed iff the sampler "
                             "was built with imputation=True")
        k_prior, k_noise = jax.random.split(key)
        if z is None:
            x0 = sde.prior_sampling(k_prior, shape)
        else:
            x0 = z
        x0p = pad_xlike(x0)
        extra = ()
        if imputation:
            extra = (pad_xlike(observation), pad_xlike(mask))
        if kernel_rng:
            seed = jax.random.randint(k_noise, (1,), 0, 2 ** 31 - 1, jnp.int32)
            out = call(coefs, seed, x0p, *extra, Wpre, *Ws, Wpost, bpost,
                       *gn_args, *q_args, tp_all)
        else:
            if noise is None:
                noise_p = jax.random.normal(
                    k_noise, (n_steps, K, batch_p, dim_p), jnp.float32)
            else:  # injected noise (tests / parity runs)
                if noise.ndim == 3:  # plain [N, batch, dim] when K == 1
                    noise = noise[:, None]
                noise_p = jnp.zeros((n_steps, K, batch_p, dim_p), jnp.float32)
                noise_p = noise_p.at[:, :, :batch, :dim].set(noise)
            out = call(coefs, x0p, *extra, Wpre, *Ws, Wpost, bpost,
                       *gn_args, *q_args, tp_all, noise_p)
        return None, out[:batch, :dim]

    return sampler


def _sharded_sampler(sde, model, params, shape, eps, denoise, interpret,
                     rng_mode, batch_block, corrector, snr, n_corrector_steps,
                     imputation, mesh, gn, probability_flow, predictor,
                     quant, act_amax, step_range, _tables_override, _ablate):
    """shard_map the single-device kernel over the mesh's batch shards.

    Langevin note: the corrector's batch-mean gradient/noise norms are
    computed PER SHARD (each device's rows form an independent langevin
    batch) — the multi-device analogue of the reference's per-replica
    batch statistics under DataParallel. At protocol shard sizes
    (>=32 rows) the per-shard mean is statistically indistinguishable
    from the global one; the single-device path still keeps its
    whole-batch exactness guarantee. Pinned by
    tests/test_parallel.py::test_sharded_langevin_corrector.
    """
    from jax.sharding import PartitionSpec as P

    from ...parallel.sharding import DATA_AXIS

    batch, dim = shape
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} must be divisible by the mesh size "
                         f"{n_dev} for the pallas sharded sampler")
    shard_batch_n = batch // n_dev
    inner = get_pallas_em_sampler(
        sde, model, params, (shard_batch_n, dim), eps=eps, denoise=denoise,
        interpret=interpret, rng_mode=rng_mode, batch_block=batch_block,
        corrector=corrector, snr=snr, n_corrector_steps=n_corrector_steps,
        imputation=imputation, mesh=None, gn=gn,
        probability_flow=probability_flow, predictor=predictor,
        quant=quant, act_amax=act_amax, step_range=step_range,
        _tables_override=_tables_override, _ablate=_ablate)
    axis = DATA_AXIS
    cache = {}

    def build(sig):
        has_obs, has_z, has_noise = sig

        def shard_fn(key, *arrs):
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            idx = 0
            kwargs = {}
            if has_obs:
                kwargs["observation"], kwargs["mask"] = arrs[idx], arrs[idx + 1]
                idx += 2
            if has_z:
                kwargs["z"] = arrs[idx]
                idx += 1
            if has_noise:
                kwargs["noise"] = arrs[idx]
            return inner(key, **kwargs)[1]

        specs = [P()]
        if has_obs:
            specs += [P(axis, None), P(axis, None)]
        if has_z:
            specs += [P(axis, None)]
        if has_noise:
            specs += [P(None, None, axis, None)]
        return jax.jit(jax.shard_map(shard_fn, mesh=mesh,
                                     in_specs=tuple(specs),
                                     out_specs=P(axis, None),
                                     check_vma=False))

    def sampler(key, observation=None, mask=None, z=None, noise=None):
        if (observation is None) != (mask is None) or \
                (observation is None) == imputation:
            raise ValueError("observation/mask must be passed iff the sampler "
                             "was built with imputation=True")
        if noise is not None and noise.ndim == 3:
            noise = noise[:, None]
        sig = (observation is not None, z is not None, noise is not None)
        if sig not in cache:
            cache[sig] = build(sig)
        arrs = []
        if observation is not None:
            arrs += [observation, mask]
        if z is not None:
            arrs.append(z)
        if noise is not None:
            arrs.append(noise)
        return None, cache[sig](key, *arrs)

    return sampler


def get_pallas_em_hypo_sampler(sde: SDE, model: ScoreModelFC, params,
                               shape: Tuple[int, ...], hypo_num: int, **kw):
    """Multi-hypothesis masked imputation in ONE kernel dispatch.

    Hypotheses tile into rows of the batch-block grid (the same flattening
    the fused completion solver uses for its hypo axis) instead of the
    per-hypothesis dispatch loop — the reference runs hypotheses
    sequentially (ref run/demo.py:359-362) and a dispatch on a tunneled
    host costs ~25 ms of RPC latency each.

    ``sampler(key, observation [B, D], mask [B, D], z=None, noise=None) ->
    [B, H, D]``. Rows decorrelate naturally: the prior sample and the
    kernel/host noise streams are drawn over the full ``H*B`` row space.
    ``z``/``noise`` (tests) are accepted in tiled row space
    (``[H*B, D]`` / ``[N, K, H*B, D]``).
    """
    batch, dim = shape
    kw.setdefault("imputation", True)
    inner = get_pallas_em_sampler(sde, model, params, (hypo_num * batch, dim),
                                  **kw)

    def sampler(key, observation, mask, z=None, noise=None):
        obs_t = jnp.tile(observation, (hypo_num, 1))
        mask_t = jnp.tile(mask, (hypo_num, 1))
        _, out = inner(key, observation=obs_t, mask=mask_t, z=z, noise=noise)
        return jnp.swapaxes(out.reshape(hypo_num, batch, dim), 0, 1)

    return sampler
