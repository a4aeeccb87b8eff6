"""The entire reverse-diffusion loop as ONE Pallas TPU kernel.

Motivation (measured on TPU v5e via this host): each XLA scan step carries
~25-30us of fixed dispatch overhead while the actual per-step compute of the
DPoser score MLP is ~30us — the 1000-step sampler is half launch overhead.
This kernel runs the full loop inside a single program:

- all network weights live in VMEM for the whole kernel (bf16: ~8.3 MB for
  the flagship 1024-wide model)
- per-step time-projection rows (precomputed bias+temb contributions) and
  pregenerated Gaussian noise stream from HBM with double-buffered DMA
- GroupNorm uses group-indicator matmuls (h @ G) instead of reshapes so all
  intermediates stay in MXU/VPU-friendly [B, H] layout
- the EM update collapses to 3 scalars per step: x <- cx*x + cout*out + cn*z
  (cout folds the 1/sigma(t) output scaling)

Integration state x stays fp32; matmul inputs are cast to bf16 (the noise
injection dwarfs bf16 rounding — validated against the XLA fast sampler).

Scope: ScoreModelFC topology (any n_blocks), positional embeddings,
predictor=euler_maruyama, corrector=none — exactly the flagship DPoser
generation configuration.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...diffusion.fast_sampler import _em_tables, _labels_for, precompute_time_tables
from ...diffusion.sde import SDE
from ...models.score_mlp import ScoreModelFC

NUM_GROUPS = 32
GN_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _box_muller(shape):
    """Standard normals from the on-core PRNG (Box-Muller, cos branch)."""
    scale = 1.0 / 16777216.0  # 2^-24
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)
    shift = jnp.uint32(8)

    def to_unit(bits):
        # >>8 clears the sign bit, so the int32 reinterpretation is exact
        # (Mosaic has no uint32->f32 cast)
        top24 = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32), shift)
        return pltpu.bitcast(top24, jnp.int32).astype(jnp.float32) * scale

    u1 = to_unit(b1)
    u2 = to_unit(b2)
    u1 = jnp.maximum(u1, 1e-12)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)


def _make_kernel(n_steps: int, n_blocks: int, batch_blk: int, dim_p: int,
                 hidden: int, denoise: bool, kernel_rng: bool,
                 gridded: bool = True):
    """Kernel body builder. Ref layout (all VMEM unless noted):

    refs = [coefs (SMEM [N, 4]), seed (SMEM [1], kernel_rng only),
            x0, Wpre, W[2*n_blocks], Wpost, bpost,
            gn_scale (VMEM [1+2*n_blocks, H]), gn_bias, G (VMEM [H, NG]),
            tp_hbm (ANY [N, n_tp_pad, H]),
            noise_hbm (ANY [N, Bp, Dp], host-rng mode only),
            out_ref,
            scratch: x_st, tp_buf [2,...],
            (host-rng: nz_buf [2,...], sem_nz [2]), sem_tp [2]]
    """
    n_tp = 1 + 2 * n_blocks
    inv_group = 1.0 / (hidden // NUM_GROUPS)

    def group_norm(h, G, scale_row, bias_row):
        # group stats via indicator matmul: [B, H] @ [H, NG] -> [B, NG]
        gsum = jnp.dot(h, G, preferred_element_type=jnp.float32)
        gsq = jnp.dot(h * h, G, preferred_element_type=jnp.float32)
        mean = gsum * inv_group
        var = gsq * inv_group - mean * mean
        # broadcast back: [B, NG] @ [NG, H]
        Gt = G.T
        mean_f = jnp.dot(mean, Gt, preferred_element_type=jnp.float32)
        rstd_f = jnp.dot(jax.lax.rsqrt(var + GN_EPS), Gt,
                         preferred_element_type=jnp.float32)
        return (h - mean_f) * rstd_f * scale_row + bias_row

    def kernel(coefs, *rest):
        if kernel_rng:
            seed, x0, Wpre = rest[:3]
            rest = rest[3:]
        else:
            x0, Wpre = rest[:2]
            rest = rest[2:]
        Ws = rest[:2 * n_blocks]
        rest = rest[2 * n_blocks:]
        if kernel_rng:
            (Wpost, bpost, gn_scale, gn_bias, G, tp_hbm, out_ref,
             x_st, tp_buf, sem_tp) = rest
            noise_hbm = nz_buf = sem_nz = None
        else:
            (Wpost, bpost, gn_scale, gn_bias, G, tp_hbm, noise_hbm, out_ref,
             x_st, tp_buf, nz_buf, sem_tp, sem_nz) = rest

        i_blk = pl.program_id(0) if gridded else 0
        row0 = i_blk * batch_blk

        x_st[:] = x0[:]
        if kernel_rng:
            # decorrelate the PRNG stream across batch blocks
            pltpu.prng_seed(seed[0] + i_blk)

        def tp_dma(slot, step):
            return pltpu.make_async_copy(tp_hbm.at[step], tp_buf.at[slot],
                                         sem_tp.at[slot])

        def nz_dma(slot, step):
            return pltpu.make_async_copy(
                noise_hbm.at[step, pl.ds(row0, batch_blk)], nz_buf.at[slot],
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
            xb = x.astype(jnp.bfloat16)
            h = jnp.dot(xb, Wpre[:], preferred_element_type=jnp.float32)
            h = h + tp_buf[slot, 0, :][None, :]
            h = group_norm(h, G[:], gn_scale[0, :][None, :], gn_bias[0, :][None, :])
            h = _silu(h)

            for blk in range(n_blocks):
                w1 = Ws[2 * blk]
                w2 = Ws[2 * blk + 1]
                h1 = jnp.dot(h.astype(jnp.bfloat16), w1[:],
                             preferred_element_type=jnp.float32)
                h1 = h1 + tp_buf[slot, 1 + 2 * blk, :][None, :]
                h1 = group_norm(h1, G[:], gn_scale[1 + 2 * blk, :][None, :],
                                gn_bias[1 + 2 * blk, :][None, :])
                h1 = _silu(h1)
                h2 = jnp.dot(h1.astype(jnp.bfloat16), w2[:],
                             preferred_element_type=jnp.float32)
                h2 = h2 + tp_buf[slot, 2 + 2 * blk, :][None, :]
                h2 = group_norm(h2, G[:], gn_scale[2 + 2 * blk, :][None, :],
                                gn_bias[2 + 2 * blk, :][None, :])
                h2 = _silu(h2)
                h = h + h2

            res = jnp.dot(h.astype(jnp.bfloat16), Wpost[:],
                          preferred_element_type=jnp.float32)
            res = res + bpost[:]

            cx = coefs[i, 0]
            cout = coefs[i, 1]
            cn = coefs[i, 2]
            x_mean = cx * x + cout * res
            z_i = _box_muller((batch_blk, dim_p)) if kernel_rng else nz_buf[slot]
            x_st[:] = x_mean + cn * z_i

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
                          n_corrector_steps: int = 1, mesh=None):
    """Build the single-kernel EM sampler. ``sampler(key, z=None) -> (None, x)``.

    Weight/table precomputation happens once at build time (host/XLA);
    the returned callable launches exactly one TPU kernel.

    rng_mode: "host" streams a pregenerated normal array from HBM (stream
    reproducible under jax PRNG, supports injected noise for tests);
    "kernel" draws Box-Muller normals from the on-core PRNG (no [N, B, D]
    noise array, no per-step noise DMA — fastest; TPU only).
    """
    assert rng_mode in ("host", "kernel")
    if corrector not in ("none",):
        raise NotImplementedError(
            f"pallas sampler: corrector '{corrector}' not yet in-kernel")
    if mesh is not None and mesh.devices.size > 1:
        raise NotImplementedError(
            "pallas sampler: multi-device mesh path not yet wired")
    kernel_rng = rng_mode == "kernel"
    # VMEM budget guard: weights (bf16) + x/noise/tp buffers + ~3 live
    # activations must fit on-core; refuse early with a clear error so
    # callers can fall back to the XLA sampler.
    batch_p_est = min(_round_up(shape[0], 128), batch_block)
    dim_p_est = _round_up(shape[1], 128)
    h = model.hidden_dim
    est = (2 * (shape[1] * h + 2 * model.n_blocks * h * h + h * shape[1])  # bf16 weights
           + 4 * (batch_p_est * dim_p_est) * (1 if rng_mode == "kernel" else 3)
           + 4 * 3 * batch_p_est * h                                        # activations
           + 4 * 2 * 8 * h)                                                 # tp buffers
    _VMEM_BUDGET = 100 * 1024 * 1024
    if est > _VMEM_BUDGET:
        raise ValueError(
            f"pallas fused sampler needs ~{est / 2**20:.0f} MiB VMEM for "
            f"batch_block {batch_block} / hidden {h} (budget "
            f"{_VMEM_BUDGET / 2**20:.0f} MiB); reduce batch_block")
    if model.embedding_type != "positional":
        raise NotImplementedError("pallas sampler supports positional embeddings")
    batch, dim = shape
    hidden = model.hidden_dim
    n_blocks = model.n_blocks
    n_steps = sde.N
    # grid over batch blocks: arbitrary batch sizes run block-sequentially
    # with weights VMEM-resident, each block doing the full N-step loop
    batch_blk = min(_round_up(batch, 128), batch_block)
    batch_p = _round_up(batch, batch_blk)
    n_blk = batch_p // batch_blk
    dim_p = _round_up(dim, 128)

    timesteps = sde.timesteps(eps)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _em_tables(sde, timesteps)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    if out_scale is not None:
        cout = cout * out_scale
    coefs = jnp.stack([cx, cout, cnoise, jnp.zeros_like(cx)], axis=1).astype(jnp.float32)

    # --- weights, bf16, padded ----------------------------------------------
    def bf16(a):
        return jnp.asarray(a, jnp.bfloat16)

    Wpre = jnp.zeros((dim_p, hidden), jnp.bfloat16).at[:dim].set(
        bf16(params["pre_dense"]["kernel"]))
    Ws = []
    tp_rows = [tprojs["pre_dense_t"] + params["pre_dense"]["bias"][None, :]]
    gn_names = ["pre_gnorm"]
    for blk in range(n_blocks):
        Ws.append(bf16(params[f"b{blk + 1}_dense1"]["kernel"]))
        Ws.append(bf16(params[f"b{blk + 1}_dense2"]["kernel"]))
        tp_rows.append(tprojs[f"b{blk + 1}_dense1_t"]
                       + params[f"b{blk + 1}_dense1"]["bias"][None, :])
        tp_rows.append(tprojs[f"b{blk + 1}_dense2_t"]
                       + params[f"b{blk + 1}_dense2"]["bias"][None, :])
        gn_names.extend([f"b{blk + 1}_gnorm1", f"b{blk + 1}_gnorm2"])
    Wpost = jnp.zeros((hidden, dim_p), jnp.bfloat16).at[:, :dim].set(
        bf16(params["post_dense"]["kernel"]))
    bpost = jnp.zeros((1, dim_p), jnp.float32).at[0, :dim].set(
        jnp.asarray(params["post_dense"]["bias"], jnp.float32))

    # pad the per-step row count to the 8-sublane tile (Mosaic slice alignment)
    n_tp_pad = _round_up(1 + 2 * n_blocks, 8)
    tp_all = jnp.stack([r.astype(jnp.float32) for r in tp_rows], axis=1)  # [N, n_tp, H]
    tp_all = jnp.pad(tp_all, ((0, 0), (0, n_tp_pad - tp_all.shape[1]), (0, 0)))
    gn_scale = jnp.stack([jnp.asarray(params[n]["scale"], jnp.float32) for n in gn_names])
    gn_bias = jnp.stack([jnp.asarray(params[n]["bias"], jnp.float32) for n in gn_names])

    # group-indicator matrix [H, NG]
    group_ids = np.arange(hidden) // (hidden // NUM_GROUPS)
    G = jnp.asarray(np.eye(NUM_GROUPS, dtype=np.float32)[group_ids], jnp.bfloat16)

    kernel = _make_kernel(n_steps, n_blocks, batch_blk, dim_p, hidden, denoise,
                          kernel_rng, gridded=n_blk > 1)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]          # coefs
    if kernel_rng:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # seed
    # gridless fast path when one block covers the batch (saves ~5 ms of
    # Mosaic grid machinery on the headline 500-sample config)
    x0_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if n_blk == 1 else
               pl.BlockSpec((batch_blk, dim_p), lambda i: (i, 0),
                            memory_space=pltpu.VMEM))
    in_specs += [
        x0_spec,                                 # x0 (blocked when gridded)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # Wpre
        *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2 * n_blocks)],
        pl.BlockSpec(memory_space=pltpu.VMEM),   # Wpost
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bpost
        pl.BlockSpec(memory_space=pltpu.VMEM),   # gn_scale
        pl.BlockSpec(memory_space=pltpu.VMEM),   # gn_bias
        pl.BlockSpec(memory_space=pltpu.VMEM),   # G
        pl.BlockSpec(memory_space=pl.ANY),       # tp_hbm
    ]
    if not kernel_rng:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # noise_hbm

    scratch = [
        pltpu.VMEM((batch_blk, dim_p), jnp.float32),     # x state
        pltpu.VMEM((2, n_tp_pad, hidden), jnp.float32),  # tp double buffer
    ]
    if not kernel_rng:
        scratch.append(pltpu.VMEM((2, batch_blk, dim_p), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))        # sem_tp
    if not kernel_rng:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))    # sem_nz

    out_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if n_blk == 1 else
                pl.BlockSpec((batch_blk, dim_p), lambda i: (i, 0),
                             memory_space=pltpu.VMEM))
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

    @jax.jit
    def sampler(key, z=None, noise=None):
        k_prior, k_noise = jax.random.split(key)
        if z is None:
            x0 = sde.prior_sampling(k_prior, shape)
        else:
            x0 = z
        x0p = jnp.zeros((batch_p, dim_p), jnp.float32).at[:batch, :dim].set(x0)
        if kernel_rng:
            seed = jax.random.randint(k_noise, (1,), 0, 2 ** 31 - 1, jnp.int32)
            out = call(coefs, seed, x0p, Wpre, *Ws, Wpost, bpost, gn_scale,
                       gn_bias, G, tp_all)
        else:
            if noise is None:
                noise_p = jax.random.normal(k_noise, (n_steps, batch_p, dim_p),
                                            jnp.float32)
            else:  # injected noise [N, batch, dim] (tests / parity runs)
                noise_p = jnp.zeros((n_steps, batch_p, dim_p), jnp.float32)
                noise_p = noise_p.at[:, :batch, :dim].set(noise)
            out = call(coefs, x0p, Wpre, *Ws, Wpost, bpost, gn_scale, gn_bias,
                       G, tp_all, noise_p)
        return None, out[:batch, :dim]

    return sampler
