"""Task engines: completion (DPoserComp) and motion denoising, analytic prior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.data import PoseNormalizer
from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.tasks import DPoserComp, MotionDenoise
from dposer_tpu.tasks.prior import DPoserPrior, one_step_denoise, sample_quan_t
from dposer_tpu.tasks.motion_denoising import noise_schedule_kwargs

from fixtures import make_stats_dir, make_synthetic_body_model

M0, S0 = 0.4, 0.5
DIM = 63


def gaussian_score(sde, m0=M0, s0=S0):
    def score_fn(x, t):
        a_t, std_t = sde.marginal_prob(jnp.ones_like(x), jnp.atleast_1d(t))
        a = a_t[..., 0] if a_t.ndim == x.ndim else a_t
        var = (a * s0) ** 2 + std_t ** 2
        return -(x - a[..., None] * m0) / var[..., None] if a.ndim == x.ndim - 1 \
            else -(x - a * m0) / var

    return score_fn


def test_one_step_denoise_recovers_posterior_mean():
    """With the exact Gaussian score, x0_hat at small t ~= x_t (posterior)."""
    sde = sde_lib.SubVPSDE(N=1000)
    score_fn = gaussian_score(sde)
    x = jnp.full((8, DIM), M0)
    t = jnp.full((8,), 0.01)
    x0_hat, snr = one_step_denoise(sde, score_fn, x, t)
    np.testing.assert_allclose(np.asarray(x0_hat), M0, atol=0.01)
    assert np.all(np.asarray(snr) > 10)  # low noise -> high SNR


def test_sample_quan_t_strategies():
    key = jax.random.PRNGKey(0)
    # strategy 3 anneals from small t-index up to N-offset
    first = int(sample_quan_t(key, jnp.asarray(0), 200, 1000, "3", 5.0))
    last = int(sample_quan_t(key, jnp.asarray(199), 200, 1000, "3", 5.0))
    assert first == 1000 - int(np.floor(199 * (1000 / (5.0 * 200)))) - 2
    assert last == 998
    assert first < last
    assert int(sample_quan_t(key, jnp.asarray(5), 200, 1000, "2", 5.0, 900)) == 900
    r = int(sample_quan_t(key, jnp.asarray(5), 200, 1000, "1"))
    assert 0 <= r < 1000


def test_completion_pins_observed_and_fills_masked(rng):
    sde = sde_lib.SubVPSDE(N=500)
    comp = DPoserComp(sde, gaussian_score(sde), iterations=2, steps_per_iter=50)
    B = 16
    gt = jnp.full((B, DIM), M0)
    mask = jnp.ones((B, DIM)).at[:, :21].set(0.0)  # complete first 21 dims
    observation = gt.at[:, :21].set(
        jnp.asarray(rng.normal(size=(B, 21)).astype(np.float32)))
    out = comp.optimize(jax.random.PRNGKey(0), observation, mask)
    out = np.asarray(out)
    # observed dims pasted exactly (ref completion.py:205)
    np.testing.assert_allclose(out[:, 21:], M0, atol=1e-6)
    # masked dims pulled from noise toward the prior mean
    init_err = np.abs(np.asarray(observation[:, :21]) - M0).mean()
    final_err = np.abs(out[:, :21] - M0).mean()
    assert final_err < 0.5 * init_err


def test_completion_hypotheses_vmap(rng):
    sde = sde_lib.SubVPSDE(N=200)
    comp = DPoserComp(sde, gaussian_score(sde), iterations=1, steps_per_iter=20)
    B, hypo = 4, 3
    poses = jnp.asarray(rng.normal(size=(B, DIM)).astype(np.float32))
    mask = jnp.ones((B, DIM)).at[:, :12].set(0.0)
    out = comp.optimize_hypos(jax.random.PRNGKey(1), poses, mask, hypo)
    assert out.shape == (B, hypo, DIM)
    # hypotheses differ on masked dims (different PRNG paths)
    assert not np.allclose(np.asarray(out[:, 0, :12]), np.asarray(out[:, 1, :12]))
    # and agree exactly on observed dims
    np.testing.assert_allclose(np.asarray(out[:, 0, 12:]), np.asarray(out[:, 1, 12:]))


@pytest.fixture(scope="module")
def motion_setup(tmp_path_factory, rng):
    tmp = tmp_path_factory.mktemp("md")
    path, vids = make_synthetic_body_model(tmp / "m.npz", "smplx")
    from dposer_tpu.body_model.smplx_jax import BodyModel

    bm = BodyModel(path, vertex_ids=vids)
    stats = make_stats_dir(tmp / "stats")
    nz = PoseNormalizer(stats, normalize=True, min_max=False, rot_rep="axis")
    return bm, nz


def test_motion_denoising_reduces_error(motion_setup, rng):
    bm, nz = motion_setup
    sde = sde_lib.SubVPSDE(N=500)
    # prior over normalized poses ~ N(0, 0.3): gt poses are small rotations
    md = MotionDenoise(sde, gaussian_score(sde, m0=0.0, s0=0.3), bm, nz,
                       dposer_weight=1.0, batch_size=12)
    T = 12
    gt_poses = jnp.asarray((0.25 * rng.normal(size=(T, 63))).astype(np.float32))
    joints = bm(pose_body=gt_poses).Jtr[:, :22]
    noisy = joints + 0.04 * jax.random.normal(jax.random.PRNGKey(3), joints.shape)
    res = md.optimize(jax.random.PRNGKey(4), noisy, gt_poses,
                      time_strategy="3", iterations=3, steps_per_iter=40,
                      sample_trun=4.0)
    # On a synthetic random-LBS model (random posedirs/skinning; only the
    # kinematic tree is the real one) the landscape is far more nonconvex
    # than real SMPL-X, so the noise floor (init_MPJPE ~7cm) is out of
    # reach; assert substantial convergence from the zero-pose start
    # (measured plateau ~0.79x regardless of step budget).
    start_err = float(jnp.sqrt(jnp.maximum((
        (bm(pose_body=jnp.zeros((T, 63))).Jtr[:, :22] - noisy) ** 2).sum(-1), 1e-12)
    ).mean() * 100)
    assert res["MPJPE"].mean() < 0.85 * start_err
    assert md.last_poses.shape == (T, 63)
    assert np.isfinite(res["MPVPE"]).all()


def test_noise_schedules():
    assert noise_schedule_kwargs(0.04)["steps_per_iter"] == 60
    assert noise_schedule_kwargs(0.02)["sample_trun"] == 10.0
    with pytest.raises(NotImplementedError):
        noise_schedule_kwargs(0.5)


def test_motion_denoising_batch_matches_sequential(motion_setup, rng):
    """optimize_batch (vmapped fragments) == per-fragment optimize for the
    same keys — the run.motion_denoising directory-mode fast path."""
    bm, nz = motion_setup
    sde = sde_lib.SubVPSDE(N=100)
    md = MotionDenoise(sde, gaussian_score(sde, m0=0.0, s0=0.3), bm, nz,
                       dposer_weight=1.0, batch_size=12)
    T, F = 12, 3
    kwargs = dict(time_strategy="3", iterations=1, steps_per_iter=5,
                  sample_trun=4.0)
    noisy = jnp.asarray((0.3 * rng.normal(size=(F, T, 22, 3))).astype(np.float32))
    keys = jnp.stack([jax.random.PRNGKey(100 + i) for i in range(F)])

    batched = md.optimize_batch(keys, noisy, **kwargs)
    assert batched.shape == (F, T, 63)
    for i in range(F):
        md.optimize(keys[i], noisy[i], gt_poses=None, **kwargs)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(md.last_poses),
                                   rtol=1e-5, atol=1e-6, err_msg=f"fragment {i}")


# ---------------------------------------------------------------------------
# Trained-prior protocol regression (VERDICT r3 item 1c)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trained_motion_setup(tmp_path_factory):
    """Human-scale body model + temporally coherent fragment + a score model
    actually TRAINED (DSM) on the protocol mixture — the full config-3
    pipeline in miniature, so the denoising contract (final MPJPE < init
    MPJPE, ref run/motion_denoising.py:210-212,292-299) can't silently rot
    the way the round-3 i.i.d.-fragment protocol did."""
    import os
    import sys

    import optax

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks"))
    from gen_synth_amass import make_mixture, sample_poses
    from gen_synth_motion import sample_sequence

    from dposer_tpu.body_model.smplx_jax import BodyModel
    from dposer_tpu.diffusion.losses import get_sde_loss_fn
    from dposer_tpu.diffusion.score_fn import get_score_fn
    from dposer_tpu.models import ScoreModelFC

    tmp = tmp_path_factory.mktemp("trained_md")
    path, vids = make_synthetic_body_model(tmp / "m.npz", "smplx",
                                           template_scale=0.15)
    bm = BodyModel(path, vertex_ids=vids)

    centers, mixweights, basis = make_mixture(np.random.default_rng(0))
    data = sample_poses(np.random.default_rng(5), 16384, centers, mixweights,
                        basis)
    mean, std = data.mean(0), data.std(0)
    stats = make_stats_dir(tmp / "stats", mean=mean, std=std)
    nz = PoseNormalizer(stats, normalize=True, min_max=False, rot_rep="axis")
    normed = jnp.asarray((data - mean) / std)

    sde = sde_lib.SubVPSDE(N=500)
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=256, embed_dim=128,
                         n_blocks=2, dropout=0.0)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, DIM)), jnp.zeros((1,)))["params"]

    def model_apply(p, x, labels, k, train):
        return model.apply({"params": p}, x, labels)

    loss_fn = get_sde_loss_fn(sde, train=True, model_apply=model_apply)
    opt = optax.adam(1e-3)

    @jax.jit
    def train_steps(params, opt_state, key, n=400, batch=256):
        def step(carry, i):
            params, opt_state = carry
            k = jax.random.fold_in(key, i)
            k_b, k_l = jax.random.split(k)
            idx = jax.random.randint(k_b, (batch,), 0, normed.shape[0])
            loss, grads = jax.value_and_grad(loss_fn)(params, k_l, normed[idx])
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n, dtype=jnp.int32))
        return params, losses

    params, losses = train_steps(params, opt.init(params), jax.random.PRNGKey(7))
    assert float(losses[-20:].mean()) < 0.5 * float(losses[:20].mean()), \
        "tiny prior failed to train"

    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t),
                            continuous=True)
    frag = sample_sequence(np.random.default_rng(77), 16, centers, mixweights,
                           basis, 30.0)
    return bm, nz, sde, score_fn, jnp.asarray(frag)


def test_motion_denoising_trained_prior_beats_init(trained_motion_setup):
    """The reference contract on the full miniature pipeline: denoised MPJPE
    strictly below the init (noise-floor) MPJPE, with the synthetic-world
    recalibrated schedule (lr 0.05, 3x150; see
    benchmarks/diag_motion_denoising.py for the calibration)."""
    bm, nz, sde, score_fn, gt = trained_motion_setup
    T = gt.shape[0]
    md = MotionDenoise(sde, score_fn, bm, nz, dposer_weight=1.0,
                       batch_size=T, lr=0.05)
    joints = bm(pose_body=gt).Jtr[:, :22]
    noisy = joints + 0.04 * jax.random.normal(jax.random.PRNGKey(3), joints.shape)
    res = md.optimize(jax.random.PRNGKey(4), noisy, gt, time_strategy="3",
                      iterations=3, steps_per_iter=150, sample_trun=4.0,
                      sample_time=490)
    init = float(np.mean(res["init_MPJPE"]))
    final = float(np.mean(res["MPJPE"]))
    assert final < init, (init, final)
    assert np.isfinite(res["MPVPE"]).all()
