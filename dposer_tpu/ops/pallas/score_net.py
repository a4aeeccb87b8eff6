"""Shared ScoreModelFC machinery for the fused Pallas kernels.

Both single-program kernels (the reverse-diffusion sampler in
``fused_em.py`` and the completion optimizer in ``fused_comp.py``) run the
same network body — pre-Dense + per-block twin Dense/GroupNorm/SiLU with
residual skips (ref lib/algorithms/advanced/model.py:141-196) — with
weights VMEM-resident in bf16 and the per-step time-projection rows
DMA-streamed from HBM. This module holds the two shared halves:

- ``build_network_operands``: host-side build — bf16 weight padding, the
  lane-strided GroupNorm permutation (see ``bind_fwd``), the scale/bias
  tables, and the per-step time-projection rows for a given label table.
- ``bind_fwd``: kernel-side — binds unpacked refs into ``fwd(x, slot)``
  plus the GroupNorm implementations.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from ...diffusion.fast_sampler import precompute_time_tables

NUM_GROUPS = 32
GN_EPS = 1e-5


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def silu(x):
    return x * jax.nn.sigmoid(x)


def unit_uniform(shape):
    """U[0,1) from the on-core PRNG (top 24 bits). ``>>8`` clears the sign
    bit, so the int32 reinterpretation is exact (Mosaic has no
    uint32->f32 cast)."""
    bits = pltpu.prng_random_bits(shape)
    top24 = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.uint32),
                                        jnp.uint32(8))
    return pltpu.bitcast(top24, jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)


def box_muller(shape):
    """Standard normals from the on-core PRNG (Box-Muller, cos branch)."""
    u1 = unit_uniform(shape)
    u2 = unit_uniform(shape)
    u1 = jnp.maximum(u1, 1e-12)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)


def group_indicator(hidden: int) -> np.ndarray:
    """[H, NUM_GROUPS] one-hot group-membership matrix (fp32 numpy) — the
    shared basis of every group-mean-as-matmul GroupNorm path."""
    group_ids = np.arange(hidden) // (hidden // NUM_GROUPS)
    return np.eye(NUM_GROUPS, dtype=np.float32)[group_ids]


def build_network_operands(model, params, dim: int, dim_p: int, labels,
                           gn: str = "auto", quant=None, act_amax=None):
    """Host-side kernel-operand prep for a ScoreModelFC.

    Returns a dict with: ``Wpre, Ws, Wpost, bpost`` (bf16, padded),
    ``gn_args`` (2 arrays in vpu mode / 4 in mm mode), ``gn_vpu``,
    ``tp_all`` ([len(labels), n_tp_pad, H] fp32 — per-step dense bias +
    time-embedding projections, already permuted), ``out_scale``
    ([len(labels)] or None — the model's 1/sigma output scaling to fold
    into downstream coefficient tables), ``n_tp_pad``, ``quant``.

    ``quant="int8"`` (requires ``act_amax``) emits ``Wpre / Ws`` as
    symmetric per-output-column int8 (``Wpost`` — the output head — stays
    bf16; rationale at the quant branch below), and ``quant`` as a dict
    with the kernel-side rescale rows: ``qs_h`` ([rows, H] fp32; row k =
    act_scale_k * w_col_scales_k for the pre + block matmuls) plus the
    activation side — per-TENSOR when ``act_amax`` is an ``[n_mm]`` array
    (``quant.calibrate_act_amax``): ``act_inv`` python-float immediates,
    ``qinv=None``; per-CHANNEL when it is the list from
    ``quant.calibrate_act_amax_per_channel``: the smooth_fold migration
    bakes channel scales into the int8 weights and ``qinv`` carries the
    [rows, H] runtime quantization rows (``act_inv=None``). Otherwise
    ``quant`` is None.
    """
    if gn not in ("auto", "vpu", "mm"):
        raise ValueError(f"gn must be 'auto', 'vpu' or 'mm', got {gn!r}")
    if quant not in (None, "int8"):
        raise ValueError(f"quant must be None or 'int8', got {quant!r}")
    if (quant == "int8") != (act_amax is not None):
        raise ValueError("act_amax must be passed iff quant='int8'")
    hidden = model.hidden_dim
    n_blocks = model.n_blocks
    if model.embedding_type != "positional":
        raise NotImplementedError("fused kernels support positional embeddings")
    if model.act_name != "swish":
        raise NotImplementedError(
            f"fused kernels hardcode SiLU; model uses {model.act_name!r} — "
            "use the XLA samplers/solvers")
    gn_vpu = hidden % 128 == 0 if gn == "auto" else gn == "vpu"
    if gn_vpu and hidden % 128:
        raise ValueError("gn='vpu' needs hidden % 128 == 0")

    # lane-strided GN: permute the hidden dim so feature p lands in group
    # p % NUM_GROUPS — GN then needs zero matmuls (see bind_fwd). The
    # permutation is applied consistently to every producer (dense columns,
    # temb rows, GN affine) and consumer (dense rows) of the hidden axis, so
    # the network function is unchanged.
    if gn_vpu:
        gs = hidden // NUM_GROUPS
        p = np.arange(hidden)
        k_t, lane = p // 128, p % 128
        perm = gs * (lane % NUM_GROUPS) + (4 * k_t + lane // NUM_GROUPS)
        assert np.array_equal(np.sort(perm), np.arange(hidden))
    else:
        perm = np.arange(hidden)

    tprojs, out_scale = precompute_time_tables(model, params, labels)

    # padded, permuted fp32 weights first; then cast to the kernel's
    # matmul operand format (bf16, or per-column int8 in quant mode)
    Wpre_f = np.zeros((dim_p, hidden), np.float32)
    Wpre_f[:dim] = np.asarray(params["pre_dense"]["kernel"],
                              np.float32)[:, perm]
    Ws_f = []
    tp_rows = [(tprojs["pre_dense_t"]
                + params["pre_dense"]["bias"][None, :])[:, perm]]
    gn_names = ["pre_gnorm"]
    for blk in range(n_blocks):
        Ws_f.append(np.asarray(params[f"b{blk + 1}_dense1"]["kernel"],
                               np.float32)[perm][:, perm])
        Ws_f.append(np.asarray(params[f"b{blk + 1}_dense2"]["kernel"],
                               np.float32)[perm][:, perm])
        tp_rows.append((tprojs[f"b{blk + 1}_dense1_t"]
                        + params[f"b{blk + 1}_dense1"]["bias"][None, :])[:, perm])
        tp_rows.append((tprojs[f"b{blk + 1}_dense2_t"]
                        + params[f"b{blk + 1}_dense2"]["bias"][None, :])[:, perm])
        gn_names.extend([f"b{blk + 1}_gnorm1", f"b{blk + 1}_gnorm2"])
    Wpost_f = np.zeros((hidden, dim_p), np.float32)
    Wpost_f[:, :dim] = np.asarray(params["post_dense"]["kernel"],
                                  np.float32)[perm, :]
    bpost = jnp.zeros((1, dim_p), jnp.float32).at[0, :dim].set(
        jnp.asarray(params["post_dense"]["bias"], jnp.float32))

    quant_dict = None
    if quant == "int8":
        from .quant import quantize_cols, smooth_fold
        n_mm = 2 + 2 * n_blocks
        per_channel = isinstance(act_amax, (list, tuple))
        if per_channel:
            # SmoothQuant-style fold (quant.smooth_fold): per-input-channel
            # difficulty migrates into the (padded, permuted) weights, and
            # the runtime quantization scale becomes a per-channel ROW —
            # the same single VPU multiply the per-tensor path already
            # spends on its scalar, so this costs nothing at run time.
            # Measured motivation: trained GN scales develop outlier
            # channels that starve per-tensor int8 of levels on the
            # imputation path (completion MPJPE 128 -> 216 mm per-tensor
            # vs 135 per-channel in the twin probe,
            # benchmarks/probe_perchannel_completion.py).
            if len(act_amax) != n_mm:
                raise ValueError(
                    f"per-channel act_amax must have {n_mm} entries "
                    f"(quant.calibrate_act_amax_per_channel); got "
                    f"{len(act_amax)}")
            if hidden < dim_p:
                raise NotImplementedError(
                    "per-channel quant packs the input row into the "
                    "hidden-width table; needs hidden >= dim_p")
            qinv = np.zeros((round_up(1 + 2 * n_blocks, 8), hidden),
                            np.float32)
            a0 = np.zeros((dim_p,), np.float32)
            a0[:dim] = np.asarray(act_amax[0], np.float32).reshape(-1)
            inv0, Wpre_f, amax_t0 = smooth_fold(a0, Wpre_f)
            qinv[0, :dim_p] = inv0
            Wpre, s_pre = quantize_cols(jnp.asarray(Wpre_f))
            Ws, s_blk, amax_t_blk = [], [], []
            for k, Wf in enumerate(Ws_f):
                # block inputs live in the PERMUTED hidden domain
                ak = np.asarray(act_amax[1 + k], np.float32).reshape(-1)[perm]
                inv_k, Wf_fold, amax_tk = smooth_fold(ak, Wf)
                qinv[1 + k, :hidden] = inv_k
                q, s = quantize_cols(jnp.asarray(Wf_fold))
                Ws.append(q)
                s_blk.append(np.asarray(s))
                amax_t_blk.append(amax_tk)
            amax = np.asarray([amax_t0] + amax_t_blk + [1.0], np.float32)
        else:
            amax = np.asarray(act_amax, np.float32).reshape(-1)
            if amax.shape != (n_mm,) or not np.all(amax > 0):
                raise ValueError(
                    f"act_amax must be {n_mm} positive ranges (one per "
                    f"matmul input: x, h_pre, (h1, h_res) per block, "
                    f"h_post); got {amax!r}")
            Wpre, s_pre = quantize_cols(jnp.asarray(Wpre_f))
            Ws, s_blk = [], []
            for Wf in Ws_f:
                q, s = quantize_cols(jnp.asarray(Wf))
                Ws.append(q)
                s_blk.append(np.asarray(s))
        # The OUTPUT HEAD stays bf16: it is the only matmul whose output is
        # not renormalized (every hidden matmul feeds a GroupNorm, which
        # washes per-step quantization error out; the head's error lands
        # directly on the score). Measured on the round-4 400k flagship:
        # quantizing the head alone inflates APD 0.89 -> 1.33 while
        # quantizing all five hidden-side matmuls together costs < 2%
        # (PERFORMANCE.md "int8 serving mode"). It is also only ~1.5% of
        # the matmul FLOPs, so keeping it bf16 costs nothing.
        Wpost = jnp.asarray(Wpost_f, jnp.bfloat16)
        qs_h = np.zeros((round_up(1 + 2 * n_blocks, 8), hidden), np.float32)
        qs_h[0] = (amax[0] / 127.0) * np.asarray(s_pre)
        for k in range(2 * n_blocks):
            qs_h[1 + k] = (amax[1 + k] / 127.0) * s_blk[k]
        quant_dict = dict(qs_h=jnp.asarray(qs_h),
                          act_inv=(None if per_channel else
                                   tuple(float(127.0 / a)
                                         for a in amax[:n_mm - 1])),
                          qinv=(jnp.asarray(qinv) if per_channel else None))
    else:
        Wpre = jnp.asarray(Wpre_f, jnp.bfloat16)
        Ws = [jnp.asarray(Wf, jnp.bfloat16) for Wf in Ws_f]
        Wpost = jnp.asarray(Wpost_f, jnp.bfloat16)

    # pad the per-step row count to the 8-sublane tile (Mosaic slice alignment)
    n_tp_pad = round_up(1 + 2 * n_blocks, 8)
    tp_all = jnp.stack([r.astype(jnp.float32) for r in tp_rows], axis=1)
    tp_all = jnp.pad(tp_all, ((0, 0), (0, n_tp_pad - tp_all.shape[1]), (0, 0)))
    gn_bias = jnp.stack([jnp.asarray(
        np.asarray(params[n]["bias"], np.float32)[perm]) for n in gn_names])

    if gn_vpu:
        gn_scale = jnp.stack([jnp.asarray(
            np.asarray(params[n]["scale"], np.float32)[perm]) for n in gn_names])
        gn_args = (gn_scale, gn_bias)
    else:
        # group-indicator matrix [H, NG], carrying 1/group_size so dot(h, G)
        # is the group mean directly (1/32 is exact in bf16)
        indicator = group_indicator(hidden)  # [H, NG]
        G = jnp.asarray(indicator / (hidden // NUM_GROUPS), jnp.bfloat16)
        # transposed indicator with each GN's scale folded in: [n_tp, NG, H]
        Gts = jnp.stack([
            jnp.asarray(indicator.T * np.asarray(params[n]["scale"], np.float32)[None, :],
                        jnp.bfloat16) for n in gn_names])
        Gt = jnp.asarray(indicator.T, jnp.bfloat16)  # plain broadcast [NG, H]
        gn_args = (Gts, gn_bias, G, Gt)

    return dict(Wpre=Wpre, Ws=Ws, Wpost=Wpost, bpost=bpost, gn_args=gn_args,
                gn_vpu=gn_vpu, tp_all=tp_all, out_scale=out_scale,
                n_tp_pad=n_tp_pad, quant=quant_dict)


def bind_fwd(n_blocks: int, hidden: int, gn_vpu: bool, ablate: frozenset,
             Wpre, Ws, Wpost, bpost, gn_refs, tp_buf, quant=None):
    """Bind unpacked kernel refs into ``fwd(x, slot) -> raw network output``
    (Wpost + bias; any sigma output scaling is folded into the caller's
    per-step coefficient tables).

    ``quant=(qs_h_ref, act_inv)`` switches the pre + block dense matmuls
    to the MXU int8 path: inputs quantize on-core with the static scales
    ``act_inv`` (python-float immediates), weights are the per-column int8
    refs, and the int32 accumulator rescales by one fp32 row per matmul
    (activation scale x per-column weight scales, prefolded by
    ``build_network_operands``). The post matmul (output head) stays bf16
    and GN/SiLU/residual/EM math stays fp32."""

    def group_norm_vpu(h, scale_row, bias_row):
        """GN with zero matmuls: the build pre-permutes the hidden dim so
        feature p belongs to group ``p % 32`` (lane-strided groups). Group
        sums then collapse to per-lane-tile VPU adds followed by two lane
        rolls (lane l accumulates lanes {l, l+32, l+64, l+96}), leaving the
        group stats replicated in exactly the lanes that need them — no
        broadcast matmul either. Stats run one-pass in fp32 off the fp32
        matmul accumulators, which is *more* accurate than the bf16
        two-pass matmul path it replaces (bf16 rounds h to 8 bits first).
        """
        if "gn" in ablate:  # measurement-only ablation
            return h
        n_t = hidden // 128
        inv_gs = 1.0 / (hidden // NUM_GROUPS)
        s1 = h[:, 0:128]
        s2 = s1 * s1
        for kk in range(1, n_t):
            t = h[:, 128 * kk:128 * (kk + 1)]
            s1 = s1 + t
            s2 = s2 + t * t
        s1 = s1 + pltpu.roll(s1, 32, 1)
        s1 = s1 + pltpu.roll(s1, 64, 1)
        s2 = s2 + pltpu.roll(s2, 32, 1)
        s2 = s2 + pltpu.roll(s2, 64, 1)
        mu = s1 * inv_gs
        var = s2 * inv_gs - mu * mu
        a = jax.lax.rsqrt(jnp.maximum(var, 0.0) + GN_EPS)
        if n_t > 1:  # tile the per-group stats back to full width
            mu = jnp.concatenate([mu] * n_t, axis=1)
            a = jnp.concatenate([a] * n_t, axis=1)
        return (h - mu) * (a * scale_row) + bias_row

    def group_norm_mm(h, G, Gt, Gts_j, bias_row):
        """GN(h)*scale + bias as ``(h - mean)*af + bias``, via four bf16
        group-indicator matmuls (fallback for hidden % 128 != 0). ``G``
        carries the 1/group_size factor, so ``dot(h, G)`` IS the group
        mean. The variance uses the two-pass *centered* form: the one-pass
        E[h^2]-E[h]^2 cancels catastrophically in bf16 (can go negative ->
        NaN). ``Gts_j`` is the transposed indicator with the GN scale
        folded in."""
        if "gn" in ablate:  # measurement-only ablation
            return h
        hb = h.astype(jnp.bfloat16)
        mean = jnp.dot(hb, G, preferred_element_type=jnp.float32)
        mean_f = jnp.dot(mean.astype(jnp.bfloat16), Gt,
                         preferred_element_type=jnp.float32)
        hc = h - mean_f
        var = jnp.dot((hc * hc).astype(jnp.bfloat16), G,
                      preferred_element_type=jnp.float32)
        a = jax.lax.rsqrt(var + GN_EPS)                     # [B, NG] rstd
        af = jnp.dot(a.astype(jnp.bfloat16), Gts_j,
                     preferred_element_type=jnp.float32)
        return hc * af + bias_row

    if gn_vpu:
        gn_scale, gn_bias = gn_refs

        def gnorm(h, j):
            return group_norm_vpu(h, gn_scale[j, :][None, :],
                                  gn_bias[j, :][None, :])
    else:
        Gts, gn_bias, G, Gt = gn_refs

        def gnorm(h, j):
            return group_norm_mm(h, G[:], Gt[:], Gts[j],
                                 gn_bias[j, :][None, :])

    act = (lambda v: v) if "silu" in ablate else silu

    if quant is None:
        def mm(h, k, Wref, post=False):
            return jnp.dot(h.astype(jnp.bfloat16), Wref[:],
                           preferred_element_type=jnp.float32)
    else:
        qs_h, act_inv = quant
        # act_inv: per-tensor mode = a tuple of python-float immediates;
        # per-channel mode = a VMEM ref of quantization rows (smooth_fold
        # scales pre-divided out; same one VPU multiply either way)
        per_channel_q = not isinstance(act_inv, tuple)

        def mm(h, k, Wref, post=False):
            if post:  # bf16 head — see build_network_operands quant branch
                return jnp.dot(h.astype(jnp.bfloat16), Wref[:],
                               preferred_element_type=jnp.float32)
            if per_channel_q:
                row = act_inv[k, :][None, :]
                hq = h * row[:, : h.shape[-1]]
            else:
                hq = h * act_inv[k]
            hq = jnp.clip(jnp.round(hq), -127.0, 127.0)
            acc = jnp.dot(hq.astype(jnp.int8), Wref[:],
                          preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * qs_h[k, :][None, :]

    def fwd(x, slot, row0=0):
        # ``row0`` selects a stage block inside the slab (multi-stage
        # integrators stream several time points per step, e.g. the RK4 ODE
        # kernel's [3 * n_tp] slabs); the GN affine index stays stage-free.
        h = mm(x, 0, Wpre)
        h = h + tp_buf[slot, row0 + 0, :][None, :]
        h = gnorm(h, 0)
        h = act(h)
        for blk in range(n_blocks):
            w1 = Ws[2 * blk]
            w2 = Ws[2 * blk + 1]
            h1 = mm(h, 1 + 2 * blk, w1)
            h1 = h1 + tp_buf[slot, row0 + 1 + 2 * blk, :][None, :]
            h1 = gnorm(h1, 1 + 2 * blk)
            h1 = act(h1)
            h2 = mm(h1, 2 + 2 * blk, w2)
            h2 = h2 + tp_buf[slot, row0 + 2 + 2 * blk, :][None, :]
            h2 = gnorm(h2, 2 + 2 * blk)
            h2 = act(h2)
            h = h + h2
        res = mm(h, 1 + 2 * n_blocks, Wpost, post=True)
        return res + bpost[:]

    return fwd


def bind_fwd_jvp(n_blocks: int, hidden: int, ablate: frozenset,
                 Wpre, Ws, Wpost, bpost, gn_refs, tp_buf):
    """Bind kernel refs into ``fwd_jvp(x, dx, slot, row0) -> (out, dout)`` —
    the network forward AND its jvp in direction ``dx``, propagated by hand
    (the likelihood kernel needs the Hutchinson directional derivative
    inside the kernel; lane-strided-GN mode only, hidden % 128 == 0).

    Tangent rules per layer:
      dense:  dh = dx @ W                       (bias/temb have no tangent)
      GN:     dmu = mean_g(dh); dvar = 2*(mean_g(h*dh) - mu*dmu)
              da  = -0.5 * a^3 * dvar
              dout = (dh - dmu)*a*gamma + (h - mu)*da*gamma
      SiLU:   dsilu = sig(h) * (1 + h*(1 - sig(h))) * dh
      skip:   dh = dh + dh2
    """
    gn_scale, gn_bias = gn_refs
    n_t = hidden // 128
    inv_gs = 1.0 / (hidden // NUM_GROUPS)

    def _group_reduce(v):
        """Sum over each lane-strided group, replicated into its lanes."""
        s = v[:, 0:128]
        for kk in range(1, n_t):
            s = s + v[:, 128 * kk:128 * (kk + 1)]
        s = s + pltpu.roll(s, 32, 1)
        s = s + pltpu.roll(s, 64, 1)
        if n_t > 1:
            s = jnp.concatenate([s] * n_t, axis=1)
        return s

    def gnorm_jvp(h, dh, j):
        mu = _group_reduce(h) * inv_gs
        var = _group_reduce(h * h) * inv_gs - mu * mu
        a = jax.lax.rsqrt(jnp.maximum(var, 0.0) + GN_EPS)
        dmu = _group_reduce(dh) * inv_gs
        dvar = 2.0 * (_group_reduce(h * dh) * inv_gs - mu * dmu)
        da = -0.5 * a * a * a * dvar
        g_row = gn_scale[j, :][None, :]
        b_row = gn_bias[j, :][None, :]
        hc = h - mu
        out = hc * (a * g_row) + b_row
        dout = (dh - dmu) * (a * g_row) + hc * (da * g_row)
        return out, dout

    def silu_jvp(h, dh):
        sig = jax.nn.sigmoid(h)
        return h * sig, sig * (1.0 + h * (1.0 - sig)) * dh

    def mm(v, W):
        return jnp.dot(v.astype(jnp.bfloat16), W[:],
                       preferred_element_type=jnp.float32)

    def fwd_jvp(x, dx, slot, row0=0):
        h = mm(x, Wpre) + tp_buf[slot, row0 + 0, :][None, :]
        dh = mm(dx, Wpre)
        h, dh = gnorm_jvp(h, dh, 0)
        h, dh = silu_jvp(h, dh)
        for blk in range(n_blocks):
            w1, w2 = Ws[2 * blk], Ws[2 * blk + 1]
            h1 = mm(h, w1) + tp_buf[slot, row0 + 1 + 2 * blk, :][None, :]
            dh1 = mm(dh, w1)
            h1, dh1 = gnorm_jvp(h1, dh1, 1 + 2 * blk)
            h1, dh1 = silu_jvp(h1, dh1)
            h2 = mm(h1, w2) + tp_buf[slot, row0 + 2 + 2 * blk, :][None, :]
            dh2 = mm(dh1, w2)
            h2, dh2 = gnorm_jvp(h2, dh2, 2 + 2 * blk)
            h2, dh2 = silu_jvp(h2, dh2)
            h = h + h2
            dh = dh + dh2
        out = mm(h, Wpost) + bpost[:]
        dout = mm(dh, Wpost)
        return out, dout

    return fwd_jvp
