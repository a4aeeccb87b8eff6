"""DSM train step with the network fwd+bwd chain as ONE Pallas kernel.

**Measured outcome (v5e): PARITY with the XLA step, not a win** — through
the real indexed data path the full step is 1.134 ms (kernel) vs 1.131 ms
(XLA), and the isolated loss+grad is 0.758 vs 0.732 ms. XLA already fuses
the GroupNorm/SiLU/dropout chain into the dense matmuls well enough that
the kernel's saved activation round-trips are cancelled by its own bf16
stash write-back (~26 MB/step of dh + dense-input rows the XLA side needs
for the dW matmuls). The kernel stays in-tree (correct, tested, exact in
fp32 mode) behind ``run.train --train-kernel``, default off; see
PERFORMANCE.md "Negative results". The original motivation below is kept
for the record.

Motivation (measured on TPU v5e, `benchmarks/ablate_train.py`): the XLA
train step at the flagship config costs ~1.10 ms/step — forward 0.51 ms,
backward +0.72 ms, clip+Adam+EMA +0.23 ms. The fwd/bwd time is dominated
by elementwise/HBM traffic (the pure matmul work is ~0.3 ms in bf16): every
dense/GroupNorm/SiLU/dropout stage round-trips a [1280, 1024] fp32
activation through HBM. This kernel keeps the whole chain VMEM-resident.

Split of labor (hybrid — each side does what it is fastest at):

- **Pallas kernel**: network forward, the DSM loss/adjoint seed, and the
  backward *data chain* (GroupNorm/SiLU/dropout backward + the ``dh @ W^T``
  hops), all in VMEM. It writes per-row losses, the per-dense-output
  gradients ``dh_j`` (bf16), the dense *inputs* (bf16), and the GroupNorm
  scale/bias grads.
- **XLA**: everything that is a large clean matmul or pure streaming —
  the weight gradients ``dW_j = in_j^T @ dh_j``, the time-embedding path
  (per-row continuous t) forward and backward, bias grads, and the
  optax clip+Adam+EMA update.

All kernel matmuls are NN-form (XLA prepares transposed bf16 weights per
step — a cast+transpose of ~8 MB, trivially fused), so no in-kernel
relayouts. GroupNorm uses the group-indicator-matmul form (``score_net.
group_norm_mm``); its backward needs two extra indicator matmuls:

    g_xhat = g_gn * gamma
    g_pre  = rstd * (g_xhat - mean_g(g_xhat) - xhat * mean_g(g_xhat * xhat))

Dropout draws masks from the on-core PRNG, seeded per (batch-block, stack)
so the backward pass regenerates the exact forward mask by re-seeding (no
mask stash). The mask *stream* therefore differs from the XLA path's
RngBitGenerator stream — same bernoulli(1-rate)/keep distribution, a
documented delta (the XLA step remains the reference; equivalence tests
run at dropout=0, plus trained-convergence checks with dropout on).

Scope guards (callers fall back to the XLA step): ScoreModelFC topology,
positional time embeddings, swish, hidden % 128 == 0, VP/subVP continuous
DSM (both reduce modes, both likelihood weightings), no auxiliary loss.

Loss conventions matched (ref lib/algorithms/advanced/losses.py:61-137 and
utils.py:127-186 via diffusion/losses.py + score_fn.py): the kernel is
loss-agnostic — the wrapper folds the score scaling (``-1/sigma_t`` from
scale_by_sigma, ``1/std``), the reduce mode, and the likelihood weighting
into three per-row coefficients (a, v, s) with

    loss = sum_rows s * sum_d (a * raw_out + v * z)^2,
    d loss / d raw_out = 2 s a (a * raw_out + v * z).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...diffusion.ema import ema_update
from ...diffusion.sde import SDE, VPSDE, SubVPSDE
from ...models.score_mlp import ScoreModelFC, get_sigmas
from ...models.time_embedding import get_timestep_embedding
from .score_net import (GN_EPS, NUM_GROUPS, group_indicator, round_up,
                        unit_uniform as _uniform)


def _make_kernel(n_blocks: int, batch: int, batch_blk: int, dim: int,
                 dim_p: int, hidden: int, keep_prob: float, gridded: bool,
                 cdt=jnp.bfloat16):
    """Kernel body. Refs (VMEM unless noted):

    inputs:  x [Bp, Dp] f32 (perturbed, zero-padded), z [Bp, Dp] f32
             (zero-padded), uvs [Bp, 128] f32 (cols 0/1/2 = a/v/s, padded
             rows all-zero), proj [n_tp, Bp, H] bf16 (temb projection +
             both biases per dense), Wpre [Dp, H] bf16, W1..W{2nb} [H, H]
             bf16, Wpost [H, Dp] bf16, bpost [8, Dp] f32 (row 0),
             WT1..WT{2nb} [H, H] bf16, WpostT [Dp, H] bf16,
             G [H, 128] bf16 (group indicator / group_size, cols >= 32
             zero), Gt [128, H] bf16 (indicator, rows >= 32 zero),
             gamma [8, H] f32, beta [8, H] f32, seed (SMEM [1] int32)
    outputs: loss_rows [Bp, 128] f32 (col 0), dout [Bp, Dp] f32,
             dh [n_tp, Bp, H] bf16, stash_in [n_tp, Bp, H] bf16,
             dgn [16, H] f32 (rows 0..n_tp-1 dgamma, 8..8+n_tp-1 dbeta)
    scratch: xhat [n_tp, blk, H] bf16, rstd [n_tp, blk, 128] f32
    """
    n_tp = 1 + 2 * n_blocks
    use_dropout = keep_prob < 1.0
    inv_keep = 1.0 / keep_prob

    def kernel(x, z, uvs, proj, *rest):
        Wpre = rest[0]
        Ws = rest[1:1 + 2 * n_blocks]
        Wpost, bpost = rest[1 + 2 * n_blocks:3 + 2 * n_blocks]
        rest = rest[3 + 2 * n_blocks:]
        WTs = rest[:2 * n_blocks]
        WpostT = rest[2 * n_blocks]
        G, Gt, gamma, beta, seed = rest[2 * n_blocks + 1:2 * n_blocks + 6]
        (loss_ref, dout_ref, dh_ref, stash_ref, dgn_ref,
         xhat_st, rstd_st) = rest[2 * n_blocks + 6:]

        i_blk = pl.program_id(0) if gridded else 0

        def mm(v, W):
            return jnp.dot(v.astype(cdt), W[:],
                           preferred_element_type=jnp.float32)

        def gmean(v):
            """Per-group mean of v, broadcast back to [blk, H]."""
            m = jnp.dot(v.astype(cdt), G[:],
                        preferred_element_type=jnp.float32)
            return jnp.dot(m.astype(cdt), Gt[:],
                           preferred_element_type=jnp.float32)

        def mask_for(j):
            pltpu.prng_seed(seed[0] + i_blk * 16 + j)
            u = _uniform((batch_blk, hidden))
            return (u < keep_prob).astype(jnp.float32) * inv_keep

        def stack_fwd(j, v, W):
            """dense -> +proj -> GN -> SiLU -> dropout; stashes for bwd."""
            h = mm(v, W) + proj[j].astype(jnp.float32)
            mean_f = gmean(h)
            hc = h - mean_f
            var = jnp.dot((hc * hc).astype(cdt), G[:],
                          preferred_element_type=jnp.float32)  # [blk, 128]
            rstd = jax.lax.rsqrt(var + GN_EPS)
            rstd_st[j] = rstd
            rstd_f = jnp.dot(rstd.astype(cdt), Gt[:],
                             preferred_element_type=jnp.float32)
            xhat = hc * rstd_f
            xhat_st[j] = xhat.astype(cdt)
            y = xhat * gamma[j, :][None, :] + beta[j, :][None, :]
            out = y * jax.nn.sigmoid(y)
            if use_dropout:
                out = out * mask_for(j)
            return out

        def stack_bwd(j, g_out):
            """Backward through dropout/SiLU/GN; returns grad at the dense
            output (pre-GN) and accumulates dgamma/dbeta rows."""
            if use_dropout:
                g_out = g_out * mask_for(j)  # same seed -> same mask
            xhat = xhat_st[j].astype(jnp.float32)
            y = xhat * gamma[j, :][None, :] + beta[j, :][None, :]
            sig = jax.nn.sigmoid(y)
            g_gn = sig * (1.0 + y * (1.0 - sig)) * g_out
            dgamma = jnp.sum(g_gn * xhat, axis=0, keepdims=True)
            dbeta = jnp.sum(g_gn, axis=0, keepdims=True)
            g_xhat = g_gn * gamma[j, :][None, :]
            rstd_f = jnp.dot(rstd_st[j].astype(cdt), Gt[:],
                             preferred_element_type=jnp.float32)
            g_pre = rstd_f * (g_xhat - gmean(g_xhat) - xhat * gmean(g_xhat * xhat))
            return g_pre, dgamma, dbeta

        # ------------------------------ forward ---------------------------
        h = stack_fwd(0, x[:], Wpre)
        stash_ref[0] = h.astype(cdt)
        for blk in range(n_blocks):
            s1 = stack_fwd(2 * blk + 1, h, Ws[2 * blk])
            stash_ref[2 * blk + 1] = s1.astype(cdt)
            s2 = stack_fwd(2 * blk + 2, s1, Ws[2 * blk + 1])
            h = h + s2
            stash_ref[2 * blk + 2] = h.astype(cdt)
        out = mm(h, Wpost) + bpost[0, :][None, :]

        # ----------------------- loss + adjoint seed ----------------------
        a = uvs[:, 0:1]
        v_c = uvs[:, 1:2]
        s_c = uvs[:, 2:3]
        r = a * out + v_c * z[:]
        l_row = s_c * jnp.sum(r * r, axis=1, keepdims=True)  # [blk, 1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (batch_blk, 128), 1)
        loss_ref[:] = jnp.where(lanes == 0, l_row, 0.0)
        dout = (2.0 * s_c * a) * r
        dout_ref[:] = dout

        # ------------------------------ backward --------------------------
        dgn_rows = [None] * n_tp
        dbeta_rows = [None] * n_tp
        g = mm(dout, WpostT)
        for blk in reversed(range(n_blocks)):
            j1, j2 = 2 * blk + 1, 2 * blk + 2
            g_pre2, dg2, db2 = stack_bwd(j2, g)
            dh_ref[j2] = g_pre2.astype(cdt)
            dgn_rows[j2], dbeta_rows[j2] = dg2, db2
            g_s1 = mm(g_pre2, WTs[j2 - 1])
            g_pre1, dg1, db1 = stack_bwd(j1, g_s1)
            dh_ref[j1] = g_pre1.astype(cdt)
            dgn_rows[j1], dbeta_rows[j1] = dg1, db1
            g = g + mm(g_pre1, WTs[j1 - 1])
        g_pre0, dg0, db0 = stack_bwd(0, g)
        dh_ref[0] = g_pre0.astype(cdt)
        dgn_rows[0], dbeta_rows[0] = dg0, db0

        pad = [jnp.zeros((1, hidden), jnp.float32)] * (8 - n_tp)
        dgn = jnp.concatenate(dgn_rows + pad + dbeta_rows + pad, axis=0)
        if gridded:
            @pl.when(i_blk == 0)
            def _():
                dgn_ref[:] = dgn

            @pl.when(i_blk > 0)
            def _():
                dgn_ref[:] = dgn_ref[:] + dgn
        else:
            dgn_ref[:] = dgn

    return kernel


VMEM_BUDGET = 88 * 1024 * 1024  # headroom under the 100 MB compiler limit


def _vmem_estimate(blk: int, n_blk: int, n_tp: int, hidden: int,
                   dim_p: int, n_blocks: int, cdt) -> int:
    """Rough VMEM bytes for one kernel invocation at batch-block ``blk``.
    Gridded runs double-buffer the blocked windows (Mosaic pipelining)."""
    cs = jnp.dtype(cdt).itemsize
    dbuf = 2 if n_blk > 1 else 1
    windows = 3 * n_tp * blk * hidden * cs            # proj in, dh/stash out
    rows = 3 * blk * dim_p * 4 + 2 * blk * 128 * 4     # x, z, dout; uvs, loss
    scratch = n_tp * blk * hidden * cs + n_tp * blk * 128 * 4
    weights = (dim_p * hidden + 4 * n_blocks * hidden * hidden
               + 2 * hidden * dim_p + 2 * hidden * 128) * cs
    weights += (8 * dim_p + 32 * hidden) * 4           # bpost, gamma/beta, dgn
    return dbuf * (windows + rows) + scratch + weights


def _pick_block(batch: int, n_tp: int, hidden: int, dim_p: int,
                n_blocks: int, cdt):
    """The auto batch-block choice for a given batch size: whole-batch
    single block when the VMEM estimate fits (measured ~2.7x faster than
    gridded — no window double-buffering, one grid step), else halve until
    it does. Returns ``(blk, fits)`` — ``fits`` False means even the
    128-row floor exceeds the budget for this batch's layout."""
    blk = round_up(batch, 8)

    def est(b):
        n_blk = (round_up(batch, b) + b - 1) // b
        return _vmem_estimate(b, n_blk, n_tp, hidden, dim_p, n_blocks, cdt)

    while blk > 128 and est(blk) > VMEM_BUDGET:
        blk = max(128, round_up((blk + 1) // 2, 8))
    return blk, est(blk) <= VMEM_BUDGET


def _net_fwd_bwd(model: ScoreModelFC, params, x_pert, z, uvs, proj, seed,
                 batch_blk: Optional[int], interpret: bool, cdt=jnp.bfloat16):
    """Invoke the kernel: returns (loss, dout [B, D], dh [n_tp, B, H],
    stash_in [n_tp, B, H], dgn [16, H]). Shapes are padded/sliced here."""
    batch, dim = x_pert.shape
    hidden = model.hidden_dim
    n_blocks = model.n_blocks
    n_tp = 1 + 2 * n_blocks
    dim_p = round_up(dim, 128)
    if batch_blk is None:
        blk, _ = _pick_block(batch, n_tp, hidden, dim_p, n_blocks, cdt)
    else:
        blk = min(round_up(batch, 8), batch_blk)
    batch_p = round_up(batch, blk)
    n_blk = batch_p // blk
    gridded = n_blk > 1

    def pad_rows(arr, rows, cols=None):
        out = jnp.zeros((rows, cols or arr.shape[1]), arr.dtype)
        return out.at[:arr.shape[0], :arr.shape[1]].set(arr)

    x_p = pad_rows(x_pert.astype(jnp.float32), batch_p, dim_p)
    z_p = pad_rows(z.astype(jnp.float32), batch_p, dim_p)
    uvs_p = pad_rows(uvs.astype(jnp.float32), batch_p, 128)
    proj_p = jnp.zeros((n_tp, batch_p, hidden), cdt
                       ).at[:, :batch, :].set(proj.astype(cdt))

    bf = cdt
    Wpre = jnp.zeros((dim_p, hidden), bf).at[:dim].set(
        params["pre_dense"]["kernel"].astype(bf))
    Ws, WTs = [], []
    for b in range(n_blocks):
        for d in (1, 2):
            W = params[f"b{b + 1}_dense{d}"]["kernel"].astype(bf)
            Ws.append(W)
            WTs.append(W.T)
    Wpost = jnp.zeros((hidden, dim_p), bf).at[:, :dim].set(
        params["post_dense"]["kernel"].astype(bf))
    WpostT = Wpost.T
    bpost = jnp.zeros((8, dim_p), jnp.float32).at[0, :dim].set(
        params["post_dense"]["bias"].astype(jnp.float32))

    ind = group_indicator(hidden)                               # [H, 32]
    G = jnp.zeros((hidden, 128), bf).at[:, :NUM_GROUPS].set(
        jnp.asarray(ind / (hidden // NUM_GROUPS), bf))
    Gt = jnp.zeros((128, hidden), bf).at[:NUM_GROUPS].set(jnp.asarray(ind.T, bf))

    gn_names = ["pre_gnorm"] + [f"b{b + 1}_gnorm{d}" for b in range(n_blocks)
                                for d in (1, 2)]
    gamma = jnp.zeros((8, hidden), jnp.float32)
    beta = jnp.zeros((8, hidden), jnp.float32)
    for j, n in enumerate(gn_names):
        gamma = gamma.at[j].set(params[n]["scale"].astype(jnp.float32))
        beta = beta.at[j].set(params[n]["bias"].astype(jnp.float32))

    kernel = _make_kernel(n_blocks, batch, blk, dim, dim_p, hidden,
                          keep_prob=1.0 - model.dropout, gridded=gridded,
                          cdt=cdt)

    def row_spec(cols):
        return pl.BlockSpec((blk, cols), lambda i: (i, 0))

    def full_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0, 0)) if nd == 2
                            else (lambda i: (0, 0, 0)))

    tp_spec = pl.BlockSpec((n_tp, blk, hidden), lambda i: (0, i, 0))

    in_specs = ([row_spec(dim_p), row_spec(dim_p), row_spec(128), tp_spec,
                 full_spec(Wpre.shape)]
                + [full_spec(W.shape) for W in Ws]
                + [full_spec(Wpost.shape), full_spec(bpost.shape)]
                + [full_spec(W.shape) for W in WTs]
                + [full_spec(WpostT.shape), full_spec(G.shape),
                   full_spec(Gt.shape), full_spec(gamma.shape),
                   full_spec(beta.shape),
                   pl.BlockSpec(memory_space=pltpu.SMEM)])
    out_specs = [row_spec(128), row_spec(dim_p), tp_spec, tp_spec,
                 full_spec((16, hidden))]
    out_shapes = [
        jax.ShapeDtypeStruct((batch_p, 128), jnp.float32),
        jax.ShapeDtypeStruct((batch_p, dim_p), jnp.float32),
        jax.ShapeDtypeStruct((n_tp, batch_p, hidden), cdt),
        jax.ShapeDtypeStruct((n_tp, batch_p, hidden), cdt),
        jax.ShapeDtypeStruct((16, hidden), jnp.float32),
    ]
    scratch = [pltpu.VMEM((n_tp, blk, hidden), cdt),
               pltpu.VMEM((n_tp, blk, 128), jnp.float32)]

    loss_rows, dout, dh, stash_in, dgn = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # resident W + W^T (~17 MB bf16 at hidden=1024) plus the
            # double-buffered [n_tp, blk, H] windows exceed the 16 MB
            # default scoped-vmem budget; v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x_p, z_p, uvs_p, proj_p, Wpre, *Ws, Wpost, bpost, *WTs, WpostT,
      G, Gt, gamma, beta, seed)

    loss = jnp.sum(loss_rows[:, 0])
    return (loss, dout[:batch, :dim], dh[:, :batch, :],
            stash_in[:, :batch, :], dgn)


def get_pallas_train_loss_and_grad(sde: SDE, model: ScoreModelFC, *,
                                   reduce_mean: bool = False,
                                   likelihood_weighting: bool = False,
                                   eps: float = 1e-5,
                                   batch_block: Optional[int] = None,
                                   interpret: bool = False,
                                   compute_dtype=jnp.bfloat16,
                                   batch_hint: Optional[int] = None):
    """Build ``fn(params, key, batch) -> (loss, grads)`` for continuous
    VP/subVP DSM training — the kernel-backed replacement of
    ``jax.value_and_grad(get_sde_loss_fn(...))``.

    Consumes the same (k_t, k_z, k_model) key splits as the XLA loss, so t,
    z, and the perturbation are IDENTICAL to the XLA path; only the dropout
    mask stream differs (on-core PRNG vs RngBitGenerator).
    """
    if not isinstance(sde, (VPSDE, SubVPSDE)):
        raise NotImplementedError(
            "pallas train step supports continuous VP/subVP DSM only")
    if model.embedding_type != "positional":
        raise NotImplementedError("pallas train step needs positional embeddings")
    if model.act_name != "swish":
        raise NotImplementedError("pallas train step hardcodes SiLU")
    if model.hidden_dim % 128 or model.hidden_dim % NUM_GROUPS:
        raise NotImplementedError("pallas train step needs hidden % 128 == 0")
    if model.n_blocks > 3:
        # gamma/beta ship as [8, H] rows and dgn as [16, H] (8 dgamma +
        # 8 dbeta), sized for n_tp = 1 + 2*n_blocks <= 7; deeper models
        # would silently drop the out-of-bounds GN rows (JAX scatter) —
        # refuse instead so callers fall back to the XLA step
        raise NotImplementedError(
            "pallas train step supports n_blocks <= 3 (8-row GN tables)")
    # Build-time VMEM scope check: an over-budget layout would otherwise
    # surface as a Mosaic compile error at the FIRST DISPATCH — outside
    # `run.train --train-kernel auto`'s fallback try/except. Without a
    # batch hint only the most favorable reachable layout (single 128-row
    # block) can be rejected — for deep/wide models whose resident W + W^T
    # alone exceed the budget; with ``batch_hint`` the exact auto-selected
    # layout for that batch is checked.
    _n_tp = 1 + 2 * model.n_blocks
    _dim_p = round_up(model.n_poses * model.pose_dim, 128)
    _checks = [(128, "at the minimum 128-row single block")]
    if batch_hint is not None:
        _checks.append((batch_hint, f"for batch {batch_hint}"))
    for _b, _what in _checks:
        _blk, _fits = _pick_block(_b, _n_tp, model.hidden_dim, _dim_p,
                                  model.n_blocks, compute_dtype)
        if not _fits:
            raise NotImplementedError(
                f"model too large for the fused train kernel's VMEM budget "
                f"(hidden={model.hidden_dim}, n_blocks={model.n_blocks}, "
                f"~{_vmem_estimate(_blk, 2, _n_tp, model.hidden_dim, _dim_p, model.n_blocks, compute_dtype) // 2**20}"
                f" MB {_what})")

    sigmas = None
    if model.scale_by_sigma:
        sigmas = jnp.asarray(get_sigmas(model.sigma_min, model.sigma_max,
                                        model.num_scales))
    n_blocks = model.n_blocks
    gn_names = ["pre_gnorm"] + [f"b{b + 1}_gnorm{d}" for b in range(n_blocks)
                                for d in (1, 2)]
    dense_t_names = ["pre_dense_t"] + [f"b{b + 1}_dense{d}_t"
                                       for b in range(n_blocks) for d in (1, 2)]
    dense_names = [f"b{b + 1}_dense{d}" for b in range(n_blocks) for d in (1, 2)]

    def fn(params, key, batch):
        batch_n, dim = batch.shape
        k_t, k_z, k_model = jax.random.split(key, 3)
        t = jax.random.uniform(k_t, (batch_n,), batch.dtype,
                               minval=eps, maxval=sde.T)
        z = jax.random.normal(k_z, batch.shape, batch.dtype)
        mean, std = sde.marginal_prob(batch, t)
        x_pert = mean + std[:, None] * z
        labels = t * 999

        # ---- time path forward (XLA: per-row matmuls, MXU-friendly) -----
        temb0 = get_timestep_embedding(labels, model.embed_dim)
        p_sh = params["shared_time_embed_0"]
        pre_t = temb0 @ p_sh["kernel"] + p_sh["bias"]
        temb = pre_t * jax.nn.sigmoid(pre_t)
        proj = jnp.stack(
            [temb @ params[n]["kernel"] + params[n]["bias"]
             + params[n[:-2]]["bias"] for n in dense_t_names], axis=0)

        # ---- per-row loss coefficients (a, v, s) -------------------------
        oscale = (1.0 / sigmas[labels.astype(jnp.int32)]
                  if sigmas is not None else jnp.ones_like(t))
        red = (1.0 / dim) if reduce_mean else 0.5
        if likelihood_weighting:
            g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
            a_row = -oscale / std
            v_row = 1.0 / std
            s_row = g2 * (red / batch_n)
        else:
            a_row = -oscale
            v_row = jnp.ones_like(t)
            s_row = jnp.full_like(t, red / batch_n)
        uvs = jnp.stack([a_row, v_row, s_row], axis=1)      # [B, 3]

        seed = jax.random.randint(k_model, (1,), 0, np.int32(2 ** 31 - 1),
                                  dtype=jnp.int32)

        loss, dout, dh, stash_in, dgn = _net_fwd_bwd(
            model, params, x_pert, z, uvs, proj, seed,
            batch_blk=batch_block, interpret=interpret, cdt=compute_dtype)

        # ---- weight/bias grads (XLA: clean TN matmuls) -------------------
        bf = compute_dtype

        def dW(inp_bf16, dh_j):
            return jnp.einsum("bi,bo->io", inp_bf16, dh_j,
                              preferred_element_type=jnp.float32)

        grads = {}
        grads["pre_dense"] = {
            "kernel": dW(x_pert.astype(bf), dh[0]),
            "bias": jnp.sum(dh[0], axis=0, dtype=jnp.float32)}
        for k, n in enumerate(dense_names):
            grads[n] = {"kernel": dW(stash_in[k], dh[k + 1]),
                        "bias": jnp.sum(dh[k + 1], axis=0, dtype=jnp.float32)}
        grads["post_dense"] = {
            "kernel": dW(stash_in[2 * n_blocks], dout.astype(bf)),
            "bias": jnp.sum(dout, axis=0)}
        temb_bf = temb.astype(bf)
        d_temb = jnp.zeros_like(temb)
        for j, n in enumerate(dense_t_names):
            grads[n] = {"kernel": jnp.einsum("be,bo->eo", temb_bf, dh[j],
                                             preferred_element_type=jnp.float32),
                        "bias": jnp.sum(dh[j], axis=0, dtype=jnp.float32)}
            d_temb = d_temb + jnp.einsum(
                "bo,eo->be", dh[j], params[n]["kernel"].astype(bf),
                preferred_element_type=jnp.float32)
        sig = jax.nn.sigmoid(pre_t)
        d_pre_t = d_temb * sig * (1.0 + pre_t * (1.0 - sig))
        grads["shared_time_embed_0"] = {
            "kernel": jnp.einsum("be,bf->ef", temb0.astype(bf),
                                 d_pre_t.astype(bf),
                                 preferred_element_type=jnp.float32),
            "bias": jnp.sum(d_pre_t, axis=0)}
        for j, n in enumerate(gn_names):
            grads[n] = {"scale": dgn[j], "bias": dgn[8 + j]}

        # any leaves this path does not touch (e.g. a converted checkpoint's
        # dead pre_dense_cond) get zero grads, matching jax.grad
        full = jax.tree.map(jnp.zeros_like, params)
        full = {**full, **{k: jax.tree.map(
            lambda g, p: g.astype(p.dtype), grads[k], dict(params[k]))
            for k in grads}}
        return loss, full

    return fn


def get_pallas_step_fn(sde: SDE, model: ScoreModelFC,
                       tx: optax.GradientTransformation, *,
                       reduce_mean: bool = False,
                       likelihood_weighting: bool = False,
                       eps: float = 1e-5, batch_block: Optional[int] = None,
                       interpret: bool = False,
                       compute_dtype=jnp.bfloat16,
                       batch_hint: Optional[int] = None):
    """Drop-in replacement for ``losses.get_step_fn(train=True, ...)`` with
    the network fwd/bwd running as one Pallas kernel. Same contract:
    ``step_fn(state, key, batch) -> (state, loss_dict)`` — composes with
    ``multi_step`` / ``multi_step_indexed`` unchanged."""
    lg = get_pallas_train_loss_and_grad(
        sde, model, reduce_mean=reduce_mean,
        likelihood_weighting=likelihood_weighting, eps=eps,
        batch_block=batch_block, interpret=interpret,
        compute_dtype=compute_dtype, batch_hint=batch_hint)

    def step_fn(state, key, batch):
        loss, grads = lg(state.params, key, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, ema=ema)
        return new_state, {"step_loss": loss, "score_loss": loss}

    return step_fn
