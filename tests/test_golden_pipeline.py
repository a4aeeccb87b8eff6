"""Capstone integration: train -> sample (3 backends) -> complete.

A small ScoreModelFC is trained on a synthetic anisotropic-Gaussian "pose
prior"; then all sampler backends must produce the same distribution, and
the DPoser completion solver must exploit the learned correlations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion import losses as losses_lib
from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.fast_sampler import get_fast_em_sampler
from dposer_tpu.diffusion.sampling import get_pc_sampler
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.models.score_mlp import make_model_apply
from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler
from dposer_tpu.tasks import DPoserComp

DIM = 63


def sample_toy_poses(key, n):
    """Correlated "poses": first half strongly predicts the second half."""
    k1, k2 = jax.random.split(key)
    a = 0.6 * jax.random.normal(k1, (n, DIM // 2 + 1))
    b = a[:, : DIM - (DIM // 2 + 1)] * 0.9 + 0.1 * jax.random.normal(
        k2, (n, DIM - (DIM // 2 + 1)))
    return jnp.concatenate([a, b], axis=1)


@pytest.fixture(scope="module")
def trained():
    import ml_collections

    c = ml_collections.ConfigDict()
    c.optim = ml_collections.ConfigDict(dict(optimizer="Adam", lr=1e-3, beta1=0.9,
                                             eps=1e-8, warmup=100, grad_clip=1.0,
                                             weight_decay=0))
    c.model = ml_collections.ConfigDict(dict(ema_rate=0.999))
    sde = sde_lib.SubVPSDE(N=100)
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=256, embed_dim=64,
                         n_blocks=2, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    state, tx = losses_lib.init_train_state(c, params)
    step_fn = jax.jit(losses_lib.get_step_fn(
        sde, train=True, model_apply=make_model_apply(model), tx=tx,
        reduce_mean=True))
    key = jax.random.PRNGKey(1)
    for i in range(2500):
        key, k1, k2 = jax.random.split(key, 3)
        state, _ = step_fn(state, k2, sample_toy_poses(k1, 512))
    return sde, model, state.ema.shadow_params


def test_all_sampler_backends_agree(trained):
    sde, model, params = trained
    shape = (2000, DIM)
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))

    samplers = {
        "generic": get_pc_sampler(sde, shape, score_fn, denoise=True, eps=1e-3),
        "fast": get_fast_em_sampler(sde, model, params, shape, eps=1e-3),
        "pallas": get_pallas_em_sampler(sde, model, params, shape, eps=1e-3,
                                        interpret=True),
    }
    stats = {}
    for name, s in samplers.items():
        _, x = s(jax.random.PRNGKey(7))
        x = np.asarray(x)
        stats[name] = (x.mean(), x.std(), np.corrcoef(x[:, 0], x[:, 32])[0, 1])
        assert np.isfinite(x).all(), name

    ref = stats["generic"]
    for name in ("fast", "pallas"):
        assert abs(stats[name][0] - ref[0]) < 0.05, (name, stats)
        assert abs(stats[name][1] - ref[1]) < 0.05, (name, stats)

    # the learned prior must reproduce the cross-dim correlation of the data
    data_corr = np.corrcoef(
        np.asarray(sample_toy_poses(jax.random.PRNGKey(9), 2000))[:, 0],
        np.asarray(sample_toy_poses(jax.random.PRNGKey(9), 2000))[:, 32])[0, 1]
    assert abs(ref[2] - data_corr) < 0.25, (ref[2], data_corr)


def test_completion_uses_learned_correlations(trained):
    """Masked second-half dims should be predicted from observed first half
    far better than the prior mean would."""
    sde, model, params = trained
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))
    comp = DPoserComp(sde, score_fn, iterations=2, steps_per_iter=60)

    gt = sample_toy_poses(jax.random.PRNGKey(11), 32)
    mask = jnp.ones((32, DIM)).at[:, 32:].set(0.0)  # complete the second half
    key = jax.random.PRNGKey(12)
    observation = gt.at[:, 32:].set(jax.random.normal(key, (32, DIM - 32)))
    out = comp.optimize(jax.random.PRNGKey(13), observation, mask)

    err_completed = float(jnp.abs(out[:, 32:] - gt[:, 32:]).mean())
    err_zero_baseline = float(jnp.abs(gt[:, 32:]).mean())  # predicting the mean
    assert err_completed < 0.8 * err_zero_baseline, (err_completed, err_zero_baseline)


def test_few_step_samplers_converge_to_pf_ode(trained):
    """DDIM and DPM-Solver++(2M) integrate the SAME probability-flow ODE
    the RK4 sampler integrates: on a trained score field, pointwise
    convergence to the RK4 reference from the same prior draw, with DDIM
    first-order (error ~4x between 50 and 200 steps) and DPM++2M reaching
    RK4-class accuracy at ~20 evals."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_ode_sampler
    from dposer_tpu.diffusion.few_step import (get_ddim_sampler,
                                               get_dpm_sampler)

    sde, model, params = trained
    shape = (128, DIM)
    z = jax.random.normal(jax.random.PRNGKey(41), shape)
    _, ref = get_fast_ode_sampler(sde, model, params, shape, n_steps=200,
                                  eps=1e-3, denoise=False)(
        jax.random.PRNGKey(0), z=z)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9

    def err(sampler):
        _, x = sampler(jax.random.PRNGKey(0), z=z)
        return float(jnp.max(jnp.abs(x - ref))) / scale

    e_ddim_200 = err(get_ddim_sampler(sde, model, params, shape, n_steps=200,
                                      denoise=False))
    e_ddim_50 = err(get_ddim_sampler(sde, model, params, shape, n_steps=50,
                                     denoise=False))
    e_dpm_20 = err(get_dpm_sampler(sde, model, params, shape, n_steps=20,
                                   denoise=False))
    assert e_ddim_200 < 5e-2, e_ddim_200
    assert e_ddim_50 < 0.15, e_ddim_50
    assert e_ddim_200 < e_ddim_50, (e_ddim_200, e_ddim_50)
    # the second-order multistep reaches ~10x fewer evals for the same error
    assert e_dpm_20 < e_ddim_50, (e_dpm_20, e_ddim_50)
    assert e_dpm_20 < 8e-2, e_dpm_20


def test_int8_kernel_moments_on_trained_model(trained):
    """Quality pin for the opt-in W8A8 sampler mode: on a trained model,
    trajectory-calibrated int8 sampling must match the fp32 sampler in
    DISTRIBUTION (pointwise trajectories diverge chaotically, for int8 as
    for bf16 — moments and learned correlations are the honest contract)."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_pc_sampler
    from dposer_tpu.ops.pallas.quant import calibrate_act_amax

    sde, model, params = trained
    shape = (2000, DIM)
    amax = calibrate_act_amax(sde, model, params, (256, DIM),
                              jax.random.PRNGKey(31))
    fast = get_fast_pc_sampler(sde, model, params, shape, eps=1e-3)
    q = get_pallas_em_sampler(sde, model, params, shape, eps=1e-3,
                              interpret=True, quant="int8", act_amax=amax)
    _, a = fast(jax.random.PRNGKey(33))
    _, b = q(jax.random.PRNGKey(33))
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 1e-2, (a.mean(), b.mean())
    assert abs(a.std() - b.std()) < 1e-2, (a.std(), b.std())
    ca = np.corrcoef(a[:, 0], a[:, 32])[0, 1]
    cb = np.corrcoef(b[:, 0], b[:, 32])[0, 1]
    assert abs(ca - cb) < 5e-2, (ca, cb)


def test_int8_per_channel_kernel_moments_on_trained_model(trained):
    """The per-channel (SmoothQuant-fold) int8 mode is held to the same
    trained-model distribution contract as per-tensor int8; the twin probe
    (benchmarks/probe_perchannel_completion.py) is where its advantage on
    the imputation path is measured."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_pc_sampler
    from dposer_tpu.ops.pallas.quant import calibrate_act_amax_per_channel

    sde, model, params = trained
    shape = (2000, DIM)
    amax_c = calibrate_act_amax_per_channel(sde, model, params, (256, DIM),
                                            jax.random.PRNGKey(31))
    fast = get_fast_pc_sampler(sde, model, params, shape, eps=1e-3)
    q = get_pallas_em_sampler(sde, model, params, shape, eps=1e-3,
                              interpret=True, quant="int8",
                              act_amax=list(amax_c))
    _, a = fast(jax.random.PRNGKey(33))
    _, b = q(jax.random.PRNGKey(33))
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 1e-2, (a.mean(), b.mean())
    assert abs(a.std() - b.std()) < 1e-2, (a.std(), b.std())
    ca = np.corrcoef(a[:, 0], a[:, 32])[0, 1]
    cb = np.corrcoef(b[:, 0], b[:, 32])[0, 1]
    assert abs(ca - cb) < 5e-2, (ca, cb)


def test_int8_mixed_kernel_moments_on_trained_model(trained):
    """The mixed-precision serving mode (int8 head + bf16 tail) is held to
    the same trained-model distribution contract as plain int8 — and its
    final steps run the bf16 kernel, the regime where score precision
    matters most (the completion-path rescue, PERFORMANCE.md)."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_pc_sampler
    from dposer_tpu.ops.pallas.quant import calibrate_act_amax

    sde, model, params = trained
    shape = (2000, DIM)
    amax = calibrate_act_amax(sde, model, params, (256, DIM),
                              jax.random.PRNGKey(31))
    fast = get_fast_pc_sampler(sde, model, params, shape, eps=1e-3)
    q = get_pallas_em_sampler(sde, model, params, shape, eps=1e-3,
                              interpret=True, quant="int8", act_amax=amax,
                              bf16_tail_steps=max(1, int(sde.N) // 10))
    _, a = fast(jax.random.PRNGKey(33))
    _, b = q(jax.random.PRNGKey(33))
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 1e-2, (a.mean(), b.mean())
    assert abs(a.std() - b.std()) < 1e-2, (a.std(), b.std())
    ca = np.corrcoef(a[:, 0], a[:, 32])[0, 1]
    cb = np.corrcoef(b[:, 0], b[:, 32])[0, 1]
    assert abs(ca - cb) < 5e-2, (ca, cb)


def test_langevin_kernel_moments_on_trained_model(trained):
    """Trained-model statistical pin for the langevin-corrector kernel path
    (VERDICT r2 weak #3: the twin test tolerates 6e-2*scale because
    untrained-model trajectories amplify bf16 rounding chaotically; on a
    trained model the two backends must agree in DISTRIBUTION, tight)."""
    sde, model, params = trained
    shape = (2000, DIM)
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))

    generic = get_pc_sampler(sde, shape, score_fn, corrector="langevin",
                             snr=0.16, denoise=True, eps=1e-3)
    _, a = generic(jax.random.PRNGKey(21))
    kern = get_pallas_em_sampler(sde, model, params, shape, eps=1e-3,
                                 corrector="langevin", snr=0.16,
                                 interpret=True)
    _, b = kern(jax.random.PRNGKey(21))
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all()
    # moment space: mean/std per backend within 1e-2 absolute
    assert abs(a.mean() - b.mean()) < 1e-2, (a.mean(), b.mean())
    assert abs(a.std() - b.std()) < 1e-2, (a.std(), b.std())
    # learned cross-dim correlation agrees between backends
    ca = np.corrcoef(a[:, 0], a[:, 32])[0, 1]
    cb = np.corrcoef(b[:, 0], b[:, 32])[0, 1]
    assert abs(ca - cb) < 5e-2, (ca, cb)


def test_fast_ode_paths_on_trained_model(trained):
    """Realistic trained score field: the fixed-grid RK4 sampler tracks the
    adaptive oracle tightly, and the fast likelihood matches adaptive bpd."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_ode_sampler
    from dposer_tpu.diffusion.likelihood import (get_fast_likelihood_fn,
                                                 get_likelihood_fn)
    from dposer_tpu.diffusion.sampling import get_ode_sampler

    sde, model, params = trained
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))
    z0 = jax.random.normal(jax.random.PRNGKey(31), (64, DIM))

    adaptive = get_ode_sampler(sde, (64, DIM), score_fn, denoise=False,
                               rtol=1e-6, atol=1e-6, eps=1e-3)
    _, ref = adaptive(jax.random.PRNGKey(0), z=z0)
    fast = get_fast_ode_sampler(sde, model, params, (64, DIM), n_steps=125,
                                eps=1e-3, denoise=False)
    _, out = fast(jax.random.PRNGKey(0), z=z0)
    ref = np.asarray(ref)
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3 * scale)

    data = sample_toy_poses(jax.random.PRNGKey(33), 64)
    ad_lik = get_likelihood_fn(sde, score_fn, rtol=1e-5, atol=1e-5, eps=1e-4)
    bpd_ref, z_ref, _ = ad_lik(jax.random.PRNGKey(2), data)
    f_lik = get_fast_likelihood_fn(sde, model, params, n_steps=100, eps=1e-4)
    bpd, z, _ = f_lik(jax.random.PRNGKey(2), data)
    np.testing.assert_allclose(np.asarray(bpd), np.asarray(bpd_ref),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-2)


def test_pallas_likelihood_kernel_on_trained_model(trained):
    """Realistic trained field: the likelihood KERNEL (in-kernel jvp)
    matches the adaptive oracle's bpd within Hutchinson-identical
    tolerance."""
    from dposer_tpu.diffusion.likelihood import get_likelihood_fn
    from dposer_tpu.ops.pallas.fused_lik import get_pallas_likelihood_fn

    sde, model, params = trained
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))
    data = sample_toy_poses(jax.random.PRNGKey(41), 32)
    ad = get_likelihood_fn(sde, score_fn, rtol=1e-5, atol=1e-5, eps=1e-4)
    bpd_ref, z_ref, _ = ad(jax.random.PRNGKey(2), data)
    kern = get_pallas_likelihood_fn(sde, model, params, (32, DIM),
                                    n_steps=100, eps=1e-4, interpret=True)
    bpd, z, _ = kern(jax.random.PRNGKey(2), data)
    # bpd (the protocol metric) tracks the fp32 adaptive oracle to
    # ~0.03 bits/dim; the intermediate z accumulates bf16 input rounding
    # over the 400 chained in-kernel evals (~2-3% of its ~2.6 scale) — a
    # tangent-rule wiring bug would show as O(bpd) ~ 5, not 0.03
    np.testing.assert_allclose(np.asarray(bpd), np.asarray(bpd_ref),
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1.5e-1)


def test_quality_vs_nfe_pins_on_trained_model(trained):
    """Live quality-at-speed pins (VERDICT r3 Next #4) on the toy prior.

    Measured property of this under-trained fixture (2500 steps): the
    stochastic PC sampler self-corrects score error every step and
    reproduces the data distribution (APD 1.32 vs data 1.29, std 0.587
    vs 0.587), while ALL deterministic PF-ODE-family samplers amplify it
    identically (RK4-200 APD 3.17, std 1.64) — on the real 400k
    checkpoint they agree with PC to <2% (see
    tests/test_golden_files.py::test_quality_vs_nfe_artifact_pins, the
    real-checkpoint half of this pin). So the live invariants are:

    - PC matches DATA (APD + bpd) — the stochastic-quality pin;
    - the few-step modes (DDIM 50/20/10, DPM++2M 20/10) match the
      RK4 PF-ODE reference *of the same stack* — the consistency pin
      that catches few-step drift without requiring a toy score good
      enough for deterministic sampling;
    - DDIM's deviation from the ODE reference grows monotonically as
      steps fall (first-order behavior), and PC beats every
      deterministic mode on data APD (stochastic self-correction).
    """
    from dposer_tpu.diffusion.fast_sampler import (get_fast_ode_sampler,
                                                   get_fast_pc_sampler)
    from dposer_tpu.diffusion.few_step import (get_ddim_sampler,
                                               get_dpm_sampler)
    from dposer_tpu.diffusion.likelihood import get_fast_likelihood_fn
    from dposer_tpu.ops.metrics import average_pairwise_distance

    sde, model, params = trained
    B = 1500
    shape = (B, DIM)

    def apd(x):
        return float(average_pairwise_distance(
            jnp.reshape(x, (x.shape[0], DIM // 3, 3))))

    data = sample_toy_poses(jax.random.PRNGKey(7), B)
    apd_data = apd(data)
    lik = get_fast_likelihood_fn(sde, model, params, n_steps=50, eps=1e-4)

    def bpd(x):
        return float(jnp.mean(lik(jax.random.PRNGKey(3), x)[0]))

    bpd_data = bpd(data)

    # --- the stochastic-quality pin: PC reproduces the data ---
    _, x_pc = get_fast_pc_sampler(sde, model, params, shape,
                                  eps=1e-3)(jax.random.PRNGKey(11))
    apd_pc, bpd_pc = apd(x_pc), bpd(x_pc)
    assert abs(apd_pc - apd_data) / apd_data < 0.06, (apd_pc, apd_data)
    assert abs(bpd_pc - bpd_data) < 0.35, (bpd_pc, bpd_data)

    # --- the deterministic-consistency pins: few-step vs RK4 PF-ODE ---
    _, x_ode = get_fast_ode_sampler(sde, model, params, shape,
                                    n_steps=200)(jax.random.PRNGKey(11))
    apd_ode, bpd_ode = apd(x_ode), bpd(x_ode)
    # bands = measured deviation (8.7/24/58/3.5/10.3%) + headroom
    modes = {
        "ddim-50": (get_ddim_sampler(sde, model, params, shape,
                                     n_steps=50), 0.15),
        "ddim-20": (get_ddim_sampler(sde, model, params, shape,
                                     n_steps=20), 0.35),
        "ddim-10": (get_ddim_sampler(sde, model, params, shape,
                                     n_steps=10), 0.75),
        "dpm-20": (get_dpm_sampler(sde, model, params, shape,
                                   n_steps=20), 0.12),
        "dpm-10": (get_dpm_sampler(sde, model, params, shape,
                                   n_steps=10), 0.18),
    }
    apds = {}
    for name, (sampler, tol) in modes.items():
        _, x = sampler(jax.random.PRNGKey(11))
        apds[name] = apd(x)
        assert abs(apds[name] - apd_ode) / apd_ode < tol, \
            (name, apds[name], apd_ode)
        # same-stack density band: an off-manifold few-step sampler shows
        # up as bits, not tenths (the int8 head regression measured +35,000)
        assert abs(bpd(x) - bpd_ode) < 0.8, (name, bpd_ode)

    # first-order DDIM: deviation from the ODE grows as steps fall
    dev = {k: abs(apds[k] - apd_ode) for k in ("ddim-50", "ddim-20",
                                               "ddim-10")}
    assert dev["ddim-50"] < dev["ddim-20"] < dev["ddim-10"], dev
    # stochastic self-correction: PC is closer to the data than every
    # deterministic mode on this under-trained score
    for name, a in {**apds, "ode-200": apd_ode}.items():
        assert abs(apd_pc - apd_data) < abs(a - apd_data), (name, a)


def test_hybrid_beats_pure_few_step_imputation_on_trained_model(trained):
    """The hybrid sampler's measured rationale, live on the toy prior: a
    deterministic few-step integrator never reconciles the overwritten
    observed block with the sampled remainder, the stochastic pc tail
    does. At matched-or-fewer NFE the hybrid's masked-completion error
    must land strictly below the pure-DDIM modes and within reach of the
    full 100-row imputation run (measured on this fixture: pc-100 0.212,
    ddim-10 0.498, ddim-20 0.416, hybrid-10+20 [NFE 30] 0.311, zero
    baseline 0.439 — real-checkpoint twin in
    artifacts/protocols_r5/quality_vs_nfe_r5.json)."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_pc_sampler
    from dposer_tpu.diffusion.few_step import (get_ddim_sampler,
                                               get_hybrid_sampler)

    sde, model, params = trained
    B = 32
    shape = (B, DIM)
    gt = sample_toy_poses(jax.random.PRNGKey(11), B)
    mask = jnp.ones((B, DIM)).at[:, 32:].set(0.0)  # second half masked

    def err(x):
        return float(jnp.abs(x[:, 32:] - gt[:, 32:]).mean())

    k = jax.random.PRNGKey(21)
    _, x_pc = get_fast_pc_sampler(sde, model, params, shape,
                                  imputation=True)(k, observation=gt,
                                                   mask=mask)
    e_pc = err(x_pc)
    e_ddim = {n: err(get_ddim_sampler(sde, model, params, shape, n_steps=n,
                                      imputation=True)(
        k, observation=gt, mask=mask)[1]) for n in (10, 20)}
    nfe, x_h = get_hybrid_sampler(sde, model, params, shape, n_head=10,
                                  m_tail=20, imputation=True)(
        k, observation=gt, mask=mask)
    e_hyb = err(x_h)
    assert nfe == 30
    # hybrid strictly beats the pure few-step modes...
    assert e_hyb < e_ddim[10] and e_hyb < e_ddim[20], (e_hyb, e_ddim)
    # ...approaching the full-schedule run, which stays the floor
    assert e_pc < e_hyb < 1.8 * e_pc, (e_pc, e_hyb)
    # and actually uses the observations (beats predicting the mean)
    assert e_hyb < 0.8 * float(jnp.abs(gt[:, 32:]).mean())
