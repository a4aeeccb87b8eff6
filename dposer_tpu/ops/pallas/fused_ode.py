"""The fixed-grid RK4 probability-flow-ODE sampler as ONE Pallas kernel.

Companion to ``fused_em.py`` (same VMEM-resident-weights machinery from
``score_net.py``): the XLA tabled RK4 (``fast_sampler.get_fast_ode_sampler``)
still re-streams the ~8 MB of weights from HBM on every one of its
``4*n_steps`` network evaluations; here the whole integration runs inside
one kernel at kernel-class rates (measured: 41.5 -> ~16 ms for batch 500 x
125 steps on a v5e).

Per step i (h = (eps - T)/M, all per-stage scalars in SMEM tables; the
slab streamed per step holds the THREE stage time-projections
[t_i, t_i + h/2, t_i + h]):

    k1 = a1_0*x          + a2_0*fwd(x,            stage 0)
    k2 = a1_m*(..)       + a2_m*fwd(x + h/2*k1,   stage 1)
    k3 = a1_m*(..)       + a2_m*fwd(x + h/2*k2,   stage 1)
    k4 = a1_e*(..)       + a2_e*fwd(x + h*k3,     stage 2)
    x <- x + h/6 * (k1 + 2*k2 + 2*k3 + k4)

with ``a1*x + a2*out`` the PF-ODE drift (ref sde_lib.py:98-109,
probability_flow=True; ``a2`` folds the sigma-ladder output scaling).
Optional final denoise = one noise-free reverse-diffusion step at eps
(ref sampling.py:492-498), computed from the last slab's stage-2 rows.

Deterministic: no RNG, no noise stream — the only HBM traffic after
weight load is the double-buffered stage-slab DMA.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...diffusion.fast_sampler import _corrector_tables, _labels_for, _pf_tables
from ...diffusion.sde import SDE
from ...models.score_mlp import ScoreModelFC
from .score_net import bind_fwd, build_network_operands, round_up as _round_up


def _make_kernel(n_steps: int, n_blocks: int, hidden: int, n_tp_pad: int,
                 denoise: bool, gn_vpu: bool):
    """refs = [coefs (SMEM [M, 8]), dcoefs (SMEM [1, 8]), x0,
    Wpre, W[2*n_blocks], Wpost, bpost, gn args, tp_hbm (ANY [M, 3*n_tp_pad, H]),
    out_ref, scratch: x_st, tp_buf [2, 3*n_tp_pad, H], sem_tp [2]].

    coefs columns: a1_0, a2_0, a1_m, a2_m, a1_e, a2_e, h, (pad);
    dcoefs: cdx, cdo (denoise), rest pad.
    """

    def kernel(coefs, dcoefs, *rest):
        x0 = rest[0]
        rest = rest[1:]
        Wpre = rest[0]
        Ws = rest[1:1 + 2 * n_blocks]
        rest = rest[1 + 2 * n_blocks:]
        Wpost, bpost = rest[:2]
        rest = rest[2:]
        n_gn = 2 if gn_vpu else 4
        gn_refs = rest[:n_gn]
        rest = rest[n_gn:]
        (tp_hbm, out_ref, x_st, tp_buf, sem_tp) = rest

        fwd = bind_fwd(n_blocks, hidden, gn_vpu, frozenset(),
                       Wpre, Ws, Wpost, bpost, gn_refs, tp_buf)

        x_st[:] = x0[:]

        def tp_dma(slot, step):
            return pltpu.make_async_copy(tp_hbm.at[step], tp_buf.at[slot],
                                         sem_tp.at[slot])

        tp_dma(0, 0).start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < n_steps)
            def _():
                tp_dma(nxt, i + 1).start()

            tp_dma(slot, i).wait()

            x = x_st[:]
            h = coefs[i, 6]
            k1 = coefs[i, 0] * x + coefs[i, 1] * fwd(x, slot, 0)
            xm = x + 0.5 * h * k1
            k2 = coefs[i, 2] * xm + coefs[i, 3] * fwd(xm, slot, n_tp_pad)
            xm = x + 0.5 * h * k2
            k3 = coefs[i, 2] * xm + coefs[i, 3] * fwd(xm, slot, n_tp_pad)
            xe = x + h * k3
            k4 = coefs[i, 4] * xe + coefs[i, 5] * fwd(xe, slot, 2 * n_tp_pad)
            x_st[:] = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)

        if denoise:
            # one noise-free reverse-diffusion step at eps: the last slab's
            # stage-2 rows ARE t = eps (still resident in the last slot)
            slot_last = (n_steps - 1) % 2
            x = x_st[:]
            out = fwd(x, slot_last, 2 * n_tp_pad)
            x_st[:] = dcoefs[0, 0] * x + dcoefs[0, 1] * out
        out_ref[:] = x_st[:]

    return kernel


def get_pallas_ode_sampler(sde: SDE, model: ScoreModelFC, params,
                           shape: Tuple[int, ...], n_steps: int = 125,
                           eps: float = 1e-3, denoise: bool = False,
                           interpret: bool = False, gn: str = "auto",
                           batch_block: int = 512, mesh=None):
    """Build the single-kernel RK4 PF-ODE sampler.

    ``sampler(key, z=None) -> (nfe, x)`` — the ``get_ode_sampler`` /
    ``get_fast_ode_sampler`` contract (nfe = static 4*n_steps). Arbitrary
    batch sizes run through the same batch-block grid as ``fused_em``.

    ``mesh`` (multi-device): shard_map the single-device kernel over the
    mesh's batch shards — the PF-ODE is row-independent, so data-parallel
    sharding is exact; per-shard prior draws decorrelate via
    ``fold_in(axis_index)`` (the same layout as ``fused_em``'s
    ``_sharded_sampler``). Covered by ``dryrun_multichip``.
    """
    batch, dim = shape
    if mesh is not None and mesh.devices.size > 1:
        return _sharded_ode_sampler(sde, model, params, shape, n_steps, eps,
                                    denoise, interpret, gn, batch_block, mesh)
    hidden = model.hidden_dim
    n_blocks = model.n_blocks
    M = n_steps

    batch_blk = min(_round_up(batch, 128), batch_block)
    batch_p = _round_up(batch, batch_blk)
    n_blk = batch_p // batch_blk
    dim_p = _round_up(dim, 128)

    # VMEM guard (weights bf16 + x/x0/out + 3 stage-slab rows doubled + ~3
    # live activations); refuse early so callers can fall back to XLA
    est = (2 * (dim * hidden + 2 * n_blocks * hidden * hidden + hidden * dim)
           + 4 * batch_blk * dim_p * 3
           + 4 * 3 * batch_blk * hidden
           + 4 * 2 * 3 * _round_up(1 + 2 * n_blocks, 8) * hidden)
    budget = 100 * 1024 * 1024
    if est > budget:
        raise ValueError(
            f"pallas ODE sampler needs ~{est / 2**20:.0f} MiB VMEM "
            f"(budget {budget / 2**20:.0f} MiB); reduce batch_block")

    # stage-time grid tau_j = T + j*h/2, j = 0..2M
    taus = jnp.linspace(sde.T, eps, 2 * M + 1)
    h = float(eps - sde.T) / M
    labels = _labels_for(sde, taus)
    a1, a2 = _pf_tables(sde, taus)
    net = build_network_operands(model, params, dim, dim_p, labels, gn=gn)
    if net["out_scale"] is not None:
        a2 = a2 * net["out_scale"]
    n_tp_pad = net["n_tp_pad"]

    # per-step slabs: [M, 3*n_tp_pad, H] = stages (2i, 2i+1, 2i+2)
    idx = jnp.stack([2 * jnp.arange(M), 2 * jnp.arange(M) + 1,
                     2 * jnp.arange(M) + 2], axis=1)          # [M, 3]
    tp_slabs = net["tp_all"][idx].reshape(M, 3 * n_tp_pad, hidden)

    coefs = jnp.stack([a1[idx[:, 0]], a2[idx[:, 0]],
                       a1[idx[:, 1]], a2[idx[:, 1]],
                       a1[idx[:, 2]], a2[idx[:, 2]],
                       jnp.full((M,), h), jnp.zeros((M,))],
                      axis=1).astype(jnp.float32)

    # denoise step coefficients: x <- (1 - f1)*x + G^2 * ss_eps * out
    # (reverse_discretize, noise-free; f is linear in x with f(0)=0 for
    # every supported SDE family, so f1 = f(1) captures it exactly)
    f1_arr, G_arr = sde.discretize(jnp.ones((1, 1)), jnp.full((1,), float(eps)))
    ss_eps, _ = _corrector_tables(
        sde, taus[-1:],
        None if net["out_scale"] is None else net["out_scale"][-1:])
    cdx = 1.0 - f1_arr.reshape(-1)[0]
    cdo = (G_arr.reshape(-1)[0] ** 2) * ss_eps[0]
    dcoefs = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(cdx).at[0, 1].set(cdo)

    kernel = _make_kernel(M, n_blocks, hidden, n_tp_pad, denoise,
                          net["gn_vpu"])

    def blocked(spec_shape, index_map):
        return pl.BlockSpec(spec_shape, index_map, memory_space=pltpu.VMEM)

    x_like_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if n_blk == 1 else
                   blocked((batch_blk, dim_p), lambda i: (i, 0)))

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),   # coefs
                pl.BlockSpec(memory_space=pltpu.SMEM),   # dcoefs
                x_like_spec,                             # x0
                pl.BlockSpec(memory_space=pltpu.VMEM),   # Wpre
                *[pl.BlockSpec(memory_space=pltpu.VMEM)
                  for _ in range(2 * n_blocks)],
                pl.BlockSpec(memory_space=pltpu.VMEM),   # Wpost
                pl.BlockSpec(memory_space=pltpu.VMEM),   # bpost
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in net["gn_args"]],
                pl.BlockSpec(memory_space=pl.ANY)]       # tp_hbm

    scratch = [
        pltpu.VMEM((batch_blk, dim_p), jnp.float32),          # x state
        pltpu.VMEM((2, 3 * n_tp_pad, hidden), jnp.float32),   # slab buffer
        pltpu.SemaphoreType.DMA((2,)),
    ]

    out_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if n_blk == 1 else
                blocked((batch_blk, dim_p), lambda i: (i, 0)))
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=() if n_blk == 1 else (n_blk,),
            in_specs=in_specs, out_specs=out_spec, scratch_shapes=scratch),
        out_shape=jax.ShapeDtypeStruct((batch_p, dim_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    operands = (net["Wpre"], *net["Ws"], net["Wpost"], net["bpost"],
                *net["gn_args"], tp_slabs)

    @jax.jit
    def sampler(key, z=None):
        if z is None:
            key, sub = jax.random.split(key)
            x0 = sde.prior_sampling(sub, shape)
        else:
            x0 = z
        x0p = jnp.zeros((batch_p, dim_p), jnp.float32).at[:batch, :dim].set(x0)
        out = call(coefs, dcoefs, x0p, *operands)
        return 4 * M, out[:batch, :dim]

    return sampler


def _sharded_ode_sampler(sde, model, params, shape, n_steps, eps, denoise,
                         interpret, gn, batch_block, mesh):
    """shard_map the single-device RK4 kernel over the mesh's batch shards."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.sharding import DATA_AXIS

    batch, dim = shape
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} must be divisible by the mesh size "
                         f"{n_dev} for the pallas sharded ODE sampler")
    inner = get_pallas_ode_sampler(
        sde, model, params, (batch // n_dev, dim), n_steps=n_steps, eps=eps,
        denoise=denoise, interpret=interpret, gn=gn, batch_block=batch_block,
        mesh=None)
    axis = DATA_AXIS
    cache = {}

    def build(has_z):
        def shard_fn(key, *arrs):
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            return inner(key, z=arrs[0] if has_z else None)[1]

        specs = [P()] + ([P(axis, None)] if has_z else [])
        return jax.jit(jax.shard_map(shard_fn, mesh=mesh,
                                     in_specs=tuple(specs),
                                     out_specs=P(axis, None),
                                     check_vma=False))

    def sampler(key, z=None):
        has_z = z is not None
        if has_z not in cache:
            cache[has_z] = build(has_z)
        out = cache[has_z](key, *( (z,) if has_z else () ))
        return 4 * n_steps, out

    return sampler
