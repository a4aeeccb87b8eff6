"""Exact PF-ODE log-likelihood as ONE Pallas kernel.

Companion to ``fused_ode.py``: integrates the augmented state
``(x, delta_logp)`` forward (data -> prior, eps -> T) with fixed-grid RK4,
evaluating the network AND its Hutchinson directional derivative inside
the kernel per stage (``score_net.bind_fwd_jvp`` propagates the tangent by
hand through dense/GN/SiLU — forward-mode, one extra bf16 matmul per
primal matmul). The XLA fast path (``likelihood.get_fast_likelihood_fn``)
re-streams the weights per jvp eval; here they stay VMEM-resident.

Per stage at grid point j (PF drift = a1*x + a2*out, ref sde_lib.py:98-109):

    out, dout = fwd_jvp(x_stage, epsv)          # primal + J*epsv
    k_x  = a1[j]*x_stage + a2[j]*out
    k_lp = a1[j]*sum(epsv^2) + a2[j]*sum(dout*epsv)   # exact Hutchinson term

matching ``likelihood.get_div_fn``'s estimator element-for-element (the
``a1*sum(epsv^2)`` term is the identity part of the Jacobian). The wrapper
draws the same Rademacher/Gaussian epsilon from the key as the XLA paths,
and finishes ``bpd = -(prior_logp(z) + delta_logp)/ln2/D`` in XLA.

Scope: lane-strided-GN models (hidden % 128 == 0), positional embeddings —
the flagship config; guards raise so callers fall back to the XLA path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...diffusion.fast_sampler import _labels_for, _pf_tables
from ...diffusion.sde import SDE
from ...models.score_mlp import ScoreModelFC
from .score_net import (bind_fwd_jvp, build_network_operands,
                        round_up as _round_up)


def _make_kernel(n_steps: int, n_blocks: int, hidden: int, n_tp_pad: int):
    """refs = [coefs (SMEM [M, 8]), x0, epsv, Wpre, W[2n], Wpost, bpost,
    gn_scale, gn_bias, tp_hbm (ANY [M, 3*n_tp_pad, H]),
    x_out, lp_out, scratch: x_st, lp_st, tp_buf [2, ...], sem_tp [2]].

    coefs columns: a1_0, a2_0, a1_m, a2_m, a1_e, a2_e, h, (pad).
    """

    def kernel(coefs, *rest):
        x0, epsv = rest[:2]
        rest = rest[2:]
        Wpre = rest[0]
        Ws = rest[1:1 + 2 * n_blocks]
        rest = rest[1 + 2 * n_blocks:]
        Wpost, bpost = rest[:2]
        rest = rest[2:]
        gn_refs = rest[:2]
        rest = rest[2:]
        (tp_hbm, x_out, lp_out, x_st, lp_st, tp_buf, sem_tp) = rest

        fwd_jvp = bind_fwd_jvp(n_blocks, hidden, frozenset(),
                               Wpre, Ws, Wpost, bpost, gn_refs, tp_buf)

        x_st[:] = x0[:]
        lp_st[:] = jnp.zeros_like(lp_st)
        ev = epsv[:]
        cE = jnp.sum(ev * ev, axis=1, keepdims=True)  # = D for Rademacher

        def tp_dma(slot, step):
            return pltpu.make_async_copy(tp_hbm.at[step], tp_buf.at[slot],
                                         sem_tp.at[slot])

        tp_dma(0, 0).start()

        def rhs(x, a1, a2, slot, row0):
            out, dout = fwd_jvp(x, ev, slot, row0)
            kx = a1 * x + a2 * out
            kl = a1 * cE + a2 * jnp.sum(dout * ev, axis=1, keepdims=True)
            return kx, kl

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < n_steps)
            def _():
                tp_dma(nxt, i + 1).start()

            tp_dma(slot, i).wait()

            x = x_st[:]
            h = coefs[i, 6]
            k1x, k1l = rhs(x, coefs[i, 0], coefs[i, 1], slot, 0)
            k2x, k2l = rhs(x + 0.5 * h * k1x, coefs[i, 2], coefs[i, 3],
                           slot, n_tp_pad)
            k3x, k3l = rhs(x + 0.5 * h * k2x, coefs[i, 2], coefs[i, 3],
                           slot, n_tp_pad)
            k4x, k4l = rhs(x + h * k3x, coefs[i, 4], coefs[i, 5],
                           slot, 2 * n_tp_pad)
            x_st[:] = x + (h / 6.0) * (k1x + 2.0 * k2x + 2.0 * k3x + k4x)
            lp_st[:] = lp_st[:] + (h / 6.0) * (k1l + 2.0 * k2l
                                               + 2.0 * k3l + k4l)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        x_out[:] = x_st[:]
        lp_out[:] = lp_st[:]

    return kernel


def get_pallas_likelihood_fn(sde: SDE, model: ScoreModelFC, params,
                             shape: Tuple[int, ...], n_steps: int = 100,
                             hutchinson_type: str = "Rademacher",
                             eps: float = 1e-5, interpret: bool = False,
                             mesh=None):
    """Build the single-kernel likelihood.

    ``likelihood_fn(key, data [B, D]) -> (bpd [B], z [B, D], nfe)`` — the
    ``get_likelihood_fn`` contract (nfe = static 4*n_steps). Single-block
    only (the protocol batch is 50; rows pad to 128).

    ``mesh`` (multi-device): shard_map the single-device kernel over the
    mesh's batch shards — likelihood rows are independent, so
    data-parallel sharding is exact; per-shard Hutchinson draws
    decorrelate via ``fold_in(axis_index)``. Lifts the single-block row
    cap to ``1024 * n_devices``. Covered by ``dryrun_multichip``.
    """
    batch, dim = shape
    if mesh is not None and mesh.devices.size > 1:
        return _sharded_likelihood_fn(sde, model, params, shape, n_steps,
                                      hutchinson_type, eps, interpret, mesh)
    hidden = model.hidden_dim
    n_blocks = model.n_blocks
    M = n_steps
    batch_p = _round_up(batch, 128)
    dim_p = _round_up(dim, 128)
    if batch_p > 1024:
        raise ValueError("pallas likelihood kernel: single-block only; "
                         f"batch {batch} pads past 1024 rows")

    taus = jnp.linspace(eps, sde.T, 2 * M + 1)  # forward: data -> prior
    h = float(sde.T - eps) / M
    labels = _labels_for(sde, taus)
    a1, a2 = _pf_tables(sde, taus)
    net = build_network_operands(model, params, dim, dim_p, labels, gn="vpu")
    if net["out_scale"] is not None:
        a2 = a2 * net["out_scale"]
    n_tp_pad = net["n_tp_pad"]

    idx = jnp.stack([2 * jnp.arange(M), 2 * jnp.arange(M) + 1,
                     2 * jnp.arange(M) + 2], axis=1)
    tp_slabs = net["tp_all"][idx].reshape(M, 3 * n_tp_pad, hidden)
    coefs = jnp.stack([a1[idx[:, 0]], a2[idx[:, 0]],
                       a1[idx[:, 1]], a2[idx[:, 1]],
                       a1[idx[:, 2]], a2[idx[:, 2]],
                       jnp.full((M,), h), jnp.zeros((M,))],
                      axis=1).astype(jnp.float32)

    kernel = _make_kernel(M, n_blocks, hidden, n_tp_pad)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),   # coefs
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x0
                pl.BlockSpec(memory_space=pltpu.VMEM),   # epsv
                pl.BlockSpec(memory_space=pltpu.VMEM),   # Wpre
                *[pl.BlockSpec(memory_space=pltpu.VMEM)
                  for _ in range(2 * n_blocks)],
                pl.BlockSpec(memory_space=pltpu.VMEM),   # Wpost
                pl.BlockSpec(memory_space=pltpu.VMEM),   # bpost
                pl.BlockSpec(memory_space=pltpu.VMEM),   # gn_scale
                pl.BlockSpec(memory_space=pltpu.VMEM),   # gn_bias
                pl.BlockSpec(memory_space=pl.ANY)]       # tp_hbm
    scratch = [
        pltpu.VMEM((batch_p, dim_p), jnp.float32),           # x state
        pltpu.VMEM((batch_p, 128), jnp.float32),             # delta_logp
        pltpu.VMEM((2, 3 * n_tp_pad, hidden), jnp.float32),  # slab buffer
        pltpu.SemaphoreType.DMA((2,)),
    ]

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(), in_specs=in_specs,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)],
            scratch_shapes=scratch),
        out_shape=[jax.ShapeDtypeStruct((batch_p, dim_p), jnp.float32),
                   jax.ShapeDtypeStruct((batch_p, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    operands = (net["Wpre"], *net["Ws"], net["Wpost"], net["bpost"],
                *net["gn_args"], tp_slabs)
    import math as _math

    n_dim = dim

    @jax.jit
    def likelihood_fn(key, data):
        if hutchinson_type == "Gaussian":
            epsv = jax.random.normal(key, data.shape, data.dtype)
        elif hutchinson_type == "Rademacher":
            epsv = jax.random.rademacher(key, data.shape, data.dtype)
        else:
            raise NotImplementedError(
                f"Hutchinson type {hutchinson_type} unknown.")
        pad = lambda a: jnp.zeros((batch_p, dim_p), jnp.float32)\
            .at[:batch, :dim].set(a)  # noqa: E731
        z_p, lp_p = call(coefs, pad(data), pad(epsv), *operands)
        z = z_p[:batch, :dim]
        delta_logp = lp_p[:batch, 0]
        prior_logp = sde.prior_logp(z)
        bpd = -(prior_logp + delta_logp) / _math.log(2) / n_dim
        return bpd, z, 4 * M

    return likelihood_fn


def _sharded_likelihood_fn(sde, model, params, shape, n_steps,
                           hutchinson_type, eps, interpret, mesh):
    """shard_map the single-device likelihood kernel over batch shards."""
    from jax.sharding import PartitionSpec as P

    from ...parallel.sharding import DATA_AXIS

    batch, dim = shape
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise ValueError(f"batch {batch} must be divisible by the mesh size "
                         f"{n_dev} for the pallas sharded likelihood")
    inner = get_pallas_likelihood_fn(
        sde, model, params, (batch // n_dev, dim), n_steps=n_steps,
        hutchinson_type=hutchinson_type, eps=eps, interpret=interpret,
        mesh=None)
    axis = DATA_AXIS

    def shard_fn(key, data):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        bpd, z, _ = inner(key, data)
        return bpd, z

    sharded = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P(axis, None)),
        out_specs=(P(axis), P(axis, None)), check_vma=False))

    def likelihood_fn(key, data):
        bpd, z = sharded(key, data)
        return bpd, z, 4 * n_steps

    return likelihood_fn
