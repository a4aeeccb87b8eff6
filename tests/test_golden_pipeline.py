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
