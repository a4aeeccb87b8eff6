"""Int8 quantized sampler path: calibration, quant math, kernel parity.

The W8A8 mode is opt-in (``get_pallas_em_sampler(quant="int8",
act_amax=...)``); these tests pin:

- ``quantize_cols``: symmetric per-column int8 with exact zero-column
  handling (padding) and bounded reconstruction error
- ``calibrate_act_amax``: shape/positivity and the imputation-free EM
  trajectory contract
- the kernel's quant math (permuted padded weights + folded rescale rows)
  against the UNPERMUTED jnp twin ``make_fast_forward_int8`` — int32
  accumulation is order-exact, so short-horizon trajectories must agree
  to fp32-ordering noise
- builder validation errors

The distribution-level quality pin on a trained model lives in
``test_golden_pipeline.py::test_int8_kernel_moments_on_trained_model``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion.fast_sampler import (_labels_for, _pred_tables,
                                               get_fast_pc_sampler,
                                               precompute_time_tables)
from dposer_tpu.diffusion.sde import SubVPSDE
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler
from dposer_tpu.ops.pallas.quant import (calibrate_act_amax,
                                         calibrate_act_amax_per_channel,
                                         make_fast_forward_int8, n_matmuls,
                                         quantize_cols)

DIM = 63


@pytest.fixture(scope="module")
def small():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=256, embed_dim=64,
                         n_blocks=2, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    return SubVPSDE(N=8), model, params


def test_quantize_cols_roundtrip_and_padding():
    rng = np.random.default_rng(0)
    W = rng.normal(size=(40, 96)).astype(np.float32)
    W[:, -16:] = 0.0  # padded columns
    q, s = quantize_cols(jnp.asarray(W))
    q, s = np.asarray(q), np.asarray(s)
    assert q.dtype == np.int8 and s.shape == (96,)
    assert np.all(q[:, -16:] == 0) and np.all(s[-16:] == 0)
    recon = q.astype(np.float32) * s[None, :]
    # symmetric per-column int8: error bounded by half a quant step
    assert np.all(np.abs(recon - W) <= 0.5 * np.maximum(s, 1e-30)[None, :] + 1e-7)
    assert np.abs(q).max() <= 127


def test_calibrate_shapes_and_positivity(small):
    sde, model, params = small
    amax = calibrate_act_amax(sde, model, params, (16, DIM),
                              jax.random.PRNGKey(1))
    assert amax.shape == (n_matmuls(model),) == (6,)
    assert np.all(amax > 0)
    # langevin coverage path runs and can only widen ranges (needs a real
    # discretization: at tiny N the discrete alphas go negative — the
    # reference's own corrector semantics, ref sampling.py:280-287)
    amax_c = calibrate_act_amax(SubVPSDE(N=100), model, params, (16, DIM),
                                jax.random.PRNGKey(1), corrector="langevin")
    assert amax_c.shape == amax.shape and np.all(amax_c > 0)


def test_builder_validation(small):
    sde, model, params = small
    with pytest.raises(ValueError, match="act_amax"):
        get_pallas_em_sampler(sde, model, params, (8, DIM), interpret=True,
                              quant="int8")
    with pytest.raises(ValueError, match="positive ranges"):
        get_pallas_em_sampler(sde, model, params, (8, DIM), interpret=True,
                              quant="int8", act_amax=np.zeros(6, np.float32))
    with pytest.raises(ValueError, match="quant"):
        get_pallas_em_sampler(sde, model, params, (8, DIM), interpret=True,
                              quant="int4", act_amax=np.ones(6, np.float32))


def test_kernel_matches_jnp_int8_twin_short_horizon(small):
    """The kernel's permuted/padded quant plumbing computes the same int8
    math as the unpermuted twin: same weight scales (column max-abs is
    permutation-invariant), same static activation scales, saturating
    round. int32 accumulation is exact, so over a short horizon the two
    trajectories agree to fp32 GN/SiLU ordering noise."""
    sde, model, params = small
    shape = (8, DIM)
    amax = calibrate_act_amax(sde, model, params, shape, jax.random.PRNGKey(2),
                              margin=1.2)

    timesteps = sde.timesteps(1e-3)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _pred_tables(sde, timesteps, "euler_maruyama")
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    fwd_q = make_fast_forward_int8(model, params, tprojs, out_scale, amax)

    z = jax.random.normal(jax.random.PRNGKey(3), shape)
    noise = jax.random.normal(jax.random.PRNGKey(4), (sde.N,) + shape)

    x = z
    for i in range(sde.N):
        x_mean = cx[i] * x + cout[i] * fwd_q(x, i)
        x = x_mean + cnoise[i] * noise[i]
    twin_out = x_mean  # denoise=True returns the final mean

    sampler = get_pallas_em_sampler(sde, model, params, shape, interpret=True,
                                    rng_mode="host", quant="int8",
                                    act_amax=amax, denoise=True)
    _, kern_out = sampler(jax.random.PRNGKey(5), z=z, noise=noise)

    scale = float(jnp.max(jnp.abs(twin_out))) + 1e-9
    err = float(jnp.max(jnp.abs(kern_out - twin_out))) / scale
    assert err < 2e-2, err


def test_single_forward_int8_vs_fp32_error_bound(small):
    """One network evaluation: the int8 twin tracks the fp32 forward to
    quantization-level error at a well-ranged input. (Full-trajectory
    closeness is untestable on an untrained model — the reverse drift of a
    random score field diverges for any discretization — so trajectory
    quality is pinned on a trained model in test_golden_pipeline.py.)"""
    sde, model, params = small
    timesteps = sde.timesteps(1e-3)
    labels = _labels_for(sde, timesteps)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    from dposer_tpu.diffusion.fast_sampler import make_fast_forward
    fwd_fp = make_fast_forward(model, params, tprojs, out_scale)
    x = jax.random.normal(jax.random.PRNGKey(7), (16, DIM))
    # ranges captured at the probe input (trajectory calibration on the
    # untrained fixture would hand the quantizer a divergence-inflated x
    # range and the error bound would measure the fixture, not the math)
    from dposer_tpu.ops.pallas.quant import _make_amax_forward
    _, am = _make_amax_forward(model, params, tprojs, out_scale)(x, 0)
    amax = np.asarray(am) * 1.05
    fwd_q = make_fast_forward_int8(model, params, tprojs, out_scale, amax)
    a, b = fwd_fp(x, 0), fwd_q(x, 0)
    scale = float(jnp.max(jnp.abs(a))) + 1e-9
    assert float(jnp.max(jnp.abs(b - a))) / scale < 0.05


def test_int8_sharded_mesh_matches_single_device(small):
    """The quant kwargs thread through the shard_map multi-chip path: the
    8-device mesh int8 sampler == the single-device int8 kernel for
    identical injected inputs (int32 accumulation is shard-exact)."""
    from dposer_tpu import parallel as par

    sde, model, params = small
    mesh = par.make_mesh()
    batch = 64
    amax = np.array([4.0, 3.0, 3.0, 4.0, 3.0, 5.0], np.float32)
    z0 = jax.random.normal(jax.random.PRNGKey(13), (batch, DIM))
    noise = jax.random.normal(jax.random.PRNGKey(14), (sde.N, 1, batch, DIM))

    single = get_pallas_em_sampler(sde, model, params, (batch, DIM), eps=1e-3,
                                   interpret=True, quant="int8",
                                   act_amax=amax)
    _, a = single(jax.random.PRNGKey(0), z=z0, noise=noise)
    sharded = get_pallas_em_sampler(sde, model, params, (batch, DIM), eps=1e-3,
                                    interpret=True, quant="int8",
                                    act_amax=amax, mesh=mesh,
                                    batch_block=batch // mesh.devices.size)
    _, b = sharded(jax.random.PRNGKey(0), z=z0, noise=noise)
    assert len(b.sharding.device_set) == 8, b.sharding
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_int8_weights_halve_vmem_budget(small):
    """The VMEM guard accounts int8 weights at 1 byte (the quant mode's
    capacity headroom is real, not just speed)."""
    sde, model, params = small
    amax = np.ones(6, np.float32)
    # hidden=256: both modes fit; just assert the builder succeeds and the
    # operands really are int8
    s = get_pallas_em_sampler(sde, model, params, (8, DIM), interpret=True,
                              quant="int8", act_amax=amax)
    assert s is not None
    from dposer_tpu.ops.pallas.score_net import build_network_operands
    net = build_network_operands(model, params, DIM, 128,
                                 _labels_for(sde, sde.timesteps(1e-3)),
                                 quant="int8", act_amax=amax)
    assert net["Wpre"].dtype == jnp.int8
    assert all(w.dtype == jnp.int8 for w in net["Ws"])
    # the output head stays bf16 (no normalizer after it — its quant error
    # would land directly on the score; measured in PERFORMANCE.md)
    assert net["Wpost"].dtype == jnp.bfloat16
    assert net["quant"]["qs_h"].dtype == jnp.float32
    assert len(net["quant"]["act_inv"]) == 5


def test_step_range_split_is_exact(small):
    """Splitting the N-step schedule into two kernel dispatches via
    ``step_range`` (state carried through ``z=``) is EXACT: every per-step
    coefficient table is a function of the timestep value and ``sde.N``
    (dt = -1/N), never the grid length. Exercised on the richest path
    (imputation + langevin corrector) with injected noise — the foundation
    of the mixed-precision int8→bf16 serving mode."""
    sde, model, params = small
    batch = 8
    shape = (batch, DIM)
    kw = dict(eps=1e-3, interpret=True, rng_mode="host", denoise=True,
              imputation=True, corrector="langevin", n_corrector_steps=1)
    K = 1 + 2 + 1
    noise = jax.random.normal(jax.random.PRNGKey(21), (sde.N, K, batch, DIM))
    z0 = jax.random.normal(jax.random.PRNGKey(22), shape)
    poses = 0.1 * jax.random.normal(jax.random.PRNGKey(23), shape)
    mask = (jnp.arange(DIM) < 20).astype(jnp.float32) * jnp.ones(shape)
    obs = poses * mask

    full = get_pallas_em_sampler(sde, model, params, shape, **kw)
    _, want = full(jax.random.PRNGKey(0), observation=obs, mask=mask,
                   z=z0, noise=noise)

    m = sde.N // 2 + 1
    head = get_pallas_em_sampler(sde, model, params, shape,
                                 step_range=(0, m), **{**kw, "denoise": False})
    tail = get_pallas_em_sampler(sde, model, params, shape,
                                 step_range=(m, sde.N), **kw)
    _, mid = head(jax.random.PRNGKey(0), observation=obs, mask=mask,
                  z=z0, noise=noise[:m])
    _, got = tail(jax.random.PRNGKey(0), observation=obs, mask=mask,
                  z=mid, noise=noise[m:])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mixed_int8_bf16_tail_matches_jnp_twin(small):
    """``quant="int8", bf16_tail_steps=k`` == the jnp twin that runs the
    int8 forward for the first N−k steps and the full-precision forward
    for the last k (same noise stream; int32 accumulation is order-exact,
    so the trajectories agree to fp32/bf16 ordering noise)."""
    from dposer_tpu.diffusion.fast_sampler import make_fast_forward

    sde, model, params = small
    shape = (8, DIM)
    k_tail = 3
    amax = calibrate_act_amax(sde, model, params, shape, jax.random.PRNGKey(2),
                              margin=1.2)
    timesteps = sde.timesteps(1e-3)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _pred_tables(sde, timesteps, "euler_maruyama")
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    fwd_q = make_fast_forward_int8(model, params, tprojs, out_scale, amax)
    fwd_fp = make_fast_forward(model, params, tprojs, out_scale)

    z = jax.random.normal(jax.random.PRNGKey(3), shape)
    noise = jax.random.normal(jax.random.PRNGKey(4), (sde.N,) + shape)

    x = z
    for i in range(sde.N):
        fwd = fwd_fp if i >= sde.N - k_tail else fwd_q
        x_mean = cx[i] * x + cout[i] * fwd(x, i)
        x = x_mean + cnoise[i] * noise[i]
    twin_out = x_mean  # denoise=True returns the final mean

    sampler = get_pallas_em_sampler(sde, model, params, shape, eps=1e-3,
                                    interpret=True, rng_mode="host",
                                    quant="int8", act_amax=amax,
                                    bf16_tail_steps=k_tail, denoise=True)
    _, kern_out = sampler(jax.random.PRNGKey(5), z=z, noise=noise)

    scale = float(jnp.max(jnp.abs(twin_out))) + 1e-9
    err = float(jnp.max(jnp.abs(kern_out - twin_out))) / scale
    assert err < 2e-2, err


def test_mixed_builder_validation(small):
    sde, model, params = small
    amax = np.ones(6, np.float32)
    with pytest.raises(ValueError, match="requires quant='int8'"):
        get_pallas_em_sampler(sde, model, params, (8, DIM), interpret=True,
                              bf16_tail_steps=2)
    with pytest.raises(ValueError, match="bf16_tail_steps must be in"):
        get_pallas_em_sampler(sde, model, params, (8, DIM), interpret=True,
                              quant="int8", act_amax=amax,
                              bf16_tail_steps=sde.N)
    with pytest.raises(ValueError, match="step_range .* out of bounds"):
        get_pallas_em_sampler(sde, model, params, (8, DIM), interpret=True,
                              step_range=(0, sde.N + 1))


def test_mixed_hypo_sampler_completion_shapes(small):
    """The completion entry point: the multi-hypothesis imputation sampler
    threads ``bf16_tail_steps`` through (int8 head + bf16 tail, obs/mask
    re-applied in both segments)."""
    from dposer_tpu.ops.pallas.fused_em import get_pallas_em_hypo_sampler

    sde, model, params = small
    batch, hypo = 4, 3
    amax = calibrate_act_amax(sde, model, params, (batch, DIM),
                              jax.random.PRNGKey(2), margin=1.2)
    poses = 0.1 * jax.random.normal(jax.random.PRNGKey(23), (batch, DIM))
    mask = (jnp.arange(DIM) < 20).astype(jnp.float32) * jnp.ones((batch, DIM))
    obs = poses * mask
    s = get_pallas_em_hypo_sampler(sde, model, params, (batch, DIM), hypo,
                                   eps=1e-3, interpret=True, rng_mode="host",
                                   quant="int8", act_amax=amax,
                                   bf16_tail_steps=2)
    out = s(jax.random.PRNGKey(9), obs, mask)
    assert out.shape == (batch, hypo, DIM)
    # observed dims end pinned to the observation's denoised mean family
    assert np.isfinite(np.asarray(out)).all()


def test_mixed_ddim_matches_jnp_twin(small):
    """Few-step analogue: ``get_pallas_ddim_sampler(quant="int8",
    bf16_tail_steps=k)`` == the jnp twin driving the same DDIM rows with
    the int8 forward for the head rows and the full-precision forward for
    the tail rows (rows are deterministic: cnoise = 0)."""
    from dposer_tpu.diffusion.fast_sampler import make_fast_forward
    from dposer_tpu.diffusion.few_step import (ddim_tables,
                                               get_pallas_ddim_sampler)

    sde, model, params = small
    shape = (8, DIM)
    n_steps, k_tail = 6, 2
    amax = calibrate_act_amax(sde, model, params, shape, jax.random.PRNGKey(2),
                              margin=1.2)
    taus, cx, cout, cnoise = ddim_tables(sde, n_steps, 1e-3, model, params,
                                         denoise=True)
    labels = _labels_for(sde, taus)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    # ddim_tables folds out_scale into cout; the twins must not re-apply it
    fwd_q = make_fast_forward_int8(model, params, tprojs, None, amax)
    fwd_fp = make_fast_forward(model, params, tprojs, None)

    z = jax.random.normal(jax.random.PRNGKey(3), shape)
    n_rows = int(taus.shape[0])
    x = z
    for i in range(n_rows):
        fwd = fwd_fp if i >= n_rows - k_tail else fwd_q
        x = cx[i] * x + cout[i] * fwd(x, i)  # cnoise = 0
    twin_out = x

    s = get_pallas_ddim_sampler(sde, model, params, shape, n_steps=n_steps,
                                eps=1e-3, denoise=True, interpret=True,
                                rng_mode="host", quant="int8", act_amax=amax,
                                bf16_tail_steps=k_tail)
    nfe, kern_out = s(jax.random.PRNGKey(5), z=z)
    assert nfe == n_rows

    scale = float(jnp.max(jnp.abs(twin_out))) + 1e-9
    err = float(jnp.max(jnp.abs(kern_out - twin_out))) / scale
    assert err < 2e-2, err


def test_kernel_matches_jnp_per_channel_twin_short_horizon(small):
    """Per-channel (smooth_fold) kernel plumbing == the per-channel jnp
    twin: same channel scales folded into the weights (fold happens in the
    PERMUTED domain in the kernel, unpermuted in the twin — column max-abs
    and the per-channel algebra are permutation-consistent), same runtime
    quantization rows, saturating round. Short-horizon trajectories agree
    to fp32 ordering noise, like the per-tensor twin test above."""
    sde, model, params = small
    shape = (8, DIM)
    amax_c = calibrate_act_amax_per_channel(
        sde, model, params, shape, jax.random.PRNGKey(2), margin=1.2)

    timesteps = sde.timesteps(1e-3)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _pred_tables(sde, timesteps, "euler_maruyama")
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    fwd_q = make_fast_forward_int8(model, params, tprojs, out_scale,
                                   list(amax_c))

    z = jax.random.normal(jax.random.PRNGKey(3), shape)
    noise = jax.random.normal(jax.random.PRNGKey(4), (sde.N,) + shape)

    x = z
    for i in range(sde.N):
        x_mean = cx[i] * x + cout[i] * fwd_q(x, i)
        x = x_mean + cnoise[i] * noise[i]
    twin_out = x_mean

    sampler = get_pallas_em_sampler(sde, model, params, shape, interpret=True,
                                    rng_mode="host", quant="int8",
                                    act_amax=list(amax_c), denoise=True)
    _, kern_out = sampler(jax.random.PRNGKey(5), z=z, noise=noise)

    scale = float(jnp.max(jnp.abs(twin_out))) + 1e-9
    err = float(jnp.max(jnp.abs(kern_out - twin_out))) / scale
    assert err < 2e-2, err


def test_per_channel_builder_validation_and_operands(small):
    from dposer_tpu.ops.pallas.score_net import build_network_operands

    sde, model, params = small
    labels = _labels_for(sde, sde.timesteps(1e-3))
    with pytest.raises(ValueError, match="per-channel act_amax must have"):
        build_network_operands(model, params, DIM, 128, labels,
                               quant="int8", act_amax=[np.ones(DIM)])
    amax_c = [np.ones(DIM, np.float32)] + \
        [np.ones(model.hidden_dim, np.float32)] * (2 * model.n_blocks) + \
        [np.ones(model.hidden_dim, np.float32)]
    net = build_network_operands(model, params, DIM, 128, labels,
                                 quant="int8", act_amax=amax_c)
    q = net["quant"]
    assert q["act_inv"] is None and q["qinv"] is not None
    assert q["qinv"].shape == q["qs_h"].shape
    assert net["Wpre"].dtype == jnp.int8
    # per-channel row for the input matmul occupies the padded dim slots
    assert float(jnp.abs(q["qinv"][0, :DIM]).min()) > 0


def test_per_channel_sharded_mesh_matches_single_device(small):
    """Per-channel quant kwargs thread through the shard_map path like the
    per-tensor ones (int32 accumulation is shard-exact)."""
    from dposer_tpu import parallel as par

    sde, model, params = small
    mesh = par.make_mesh()
    batch = 64
    amax_c = calibrate_act_amax_per_channel(
        sde, model, params, (batch, DIM), jax.random.PRNGKey(2), margin=1.2)
    z0 = jax.random.normal(jax.random.PRNGKey(13), (batch, DIM))
    noise = jax.random.normal(jax.random.PRNGKey(14), (sde.N, 1, batch, DIM))

    single = get_pallas_em_sampler(sde, model, params, (batch, DIM), eps=1e-3,
                                   interpret=True, quant="int8",
                                   act_amax=list(amax_c))
    _, a = single(jax.random.PRNGKey(0), z=z0, noise=noise)
    sharded = get_pallas_em_sampler(sde, model, params, (batch, DIM), eps=1e-3,
                                    interpret=True, quant="int8",
                                    act_amax=list(amax_c), mesh=mesh,
                                    batch_block=batch // mesh.devices.size)
    _, b = sharded(jax.random.PRNGKey(0), z=z0, noise=noise)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
