"""Training loop end-to-end: loss decreases, EMA tracks, samples match target."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion import losses as losses_lib
from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.sampling import get_pc_sampler
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.models.score_mlp import make_model_apply


def tiny_config():
    import ml_collections

    c = ml_collections.ConfigDict()
    c.optim = ml_collections.ConfigDict()
    c.optim.optimizer = "Adam"
    c.optim.lr = 1e-3
    c.optim.beta1 = 0.9
    c.optim.eps = 1e-8
    c.optim.warmup = 100
    c.optim.grad_clip = 1.0
    c.optim.weight_decay = 0
    c.model = ml_collections.ConfigDict()
    c.model.ema_rate = 0.999
    return c


DIM = 8


M0, S0 = 0.3, 0.8
N_STEPS = 2000


@pytest.fixture(scope="module")
def trained():
    """Train a small score net on N(0.3, 0.8^2).

    Sizing matters: GroupNorm uses 32 groups, so hidden_dim must give >=8
    channels per group or the net saturates and reverse-SDE trajectories
    diverge (observed with hidden_dim=64). scale_by_sigma is off — the
    /sigma(t) output scaling needs far more steps to train than a unit test
    affords; machinery is identical either way.
    """
    sde = sde_lib.SubVPSDE(N=100)
    model = ScoreModelFC(n_poses=2, pose_dim=4, hidden_dim=256, embed_dim=64,
                         n_blocks=2, dropout=0.0, scale_by_sigma=False)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, DIM)), jnp.zeros((1,)))["params"]
    config = tiny_config()
    state, tx = losses_lib.init_train_state(config, params)
    model_apply = make_model_apply(model)
    step_fn = jax.jit(losses_lib.get_step_fn(
        sde, train=True, model_apply=model_apply, tx=tx, reduce_mean=True))

    data_key = jax.random.PRNGKey(1)
    losses = []
    for i in range(N_STEPS):
        k1, k2, data_key = jax.random.split(data_key, 3)
        batch = M0 + S0 * jax.random.normal(k1, (512, DIM))
        state, ld = step_fn(state, k2, batch)
        losses.append(float(ld["step_loss"]))
    return sde, model, state, losses


def test_loss_decreases(trained):
    _, _, _, losses = trained
    assert np.mean(losses[-50:]) < 0.5 * np.mean(losses[:20])


def test_step_counter_and_ema(trained):
    _, _, state, _ = trained
    assert int(state.step) == N_STEPS
    assert int(state.ema.num_updates) == N_STEPS
    # EMA shadow differs from online params but is close
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, state.ema.shadow_params)
    max_d = max(jax.tree.leaves(d))
    assert 0 < max_d < 1.0


def test_trained_model_samples_target(trained):
    sde, model, state, _ = trained
    score_fn = get_score_fn(
        sde, lambda x, t: model.apply({"params": state.ema.shadow_params}, x, t))
    sampler = get_pc_sampler(sde, (2000, DIM), score_fn, denoise=True, eps=1e-3)
    _, x = sampler(jax.random.PRNGKey(5))
    x = np.asarray(x)
    assert abs(x.mean() - M0) < 0.08
    assert abs(x.std() - S0) < 0.08
    assert np.abs(x).max() < 6.0  # no diverged trajectories


def test_eval_step_uses_ema(trained):
    sde, model, state, _ = trained
    eval_fn = jax.jit(losses_lib.get_step_fn(
        sde, train=False, model_apply=make_model_apply(model), reduce_mean=True))
    _, ld = eval_fn(state, jax.random.PRNGKey(0),
                    M0 + S0 * jax.random.normal(jax.random.PRNGKey(1), (128, DIM)))
    assert np.isfinite(float(ld["step_loss"]))


def test_likelihood_weighted_loss_runs():
    sde = sde_lib.SubVPSDE(N=100)
    model = ScoreModelFC(n_poses=2, pose_dim=4, hidden_dim=32, embed_dim=16,
                         n_blocks=1, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)), jnp.zeros((1,)))["params"]
    loss_fn = losses_lib.get_sde_loss_fn(
        sde, train=False, model_apply=make_model_apply(model),
        likelihood_weighting=True)
    loss = loss_fn(params, jax.random.PRNGKey(1), jnp.ones((16, DIM)))
    assert np.isfinite(float(loss))


def test_discrete_losses_run():
    model = ScoreModelFC(n_poses=2, pose_dim=4, hidden_dim=32, embed_dim=16,
                         n_blocks=1, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)), jnp.zeros((1,)))["params"]
    ma = make_model_apply(model)
    smld = losses_lib.get_smld_loss_fn(sde_lib.VESDE(N=100), False, ma)
    ddpm = losses_lib.get_ddpm_loss_fn(sde_lib.VPSDE(N=100), False, ma)
    for fn in (smld, ddpm):
        v = fn(params, jax.random.PRNGKey(1), jnp.ones((8, DIM)))
        assert np.isfinite(float(v))


def test_auxiliary_loss_with_body_model(tmp_path):
    """Aux v2v/j2j loss through the JAX body model inside one jitted step."""
    from fixtures import make_synthetic_body_model
    from dposer_tpu.body_model.smplx_jax import BodyModel

    path, vids = make_synthetic_body_model(tmp_path / "m.npz", "smplx")
    bm = BodyModel(path, vertex_ids=vids)

    sde = sde_lib.SubVPSDE(N=100)
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=32, embed_dim=16,
                         n_blocks=1, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)), jnp.zeros((1,)))["params"]
    config = tiny_config()
    state, tx = losses_lib.init_train_state(config, params)

    def body_fn(pose_axis):
        out = bm(pose_body=pose_axis)
        return out.v, out.Jtr

    step_fn = jax.jit(losses_lib.get_step_fn(
        sde, train=True, model_apply=make_model_apply(model), tx=tx,
        reduce_mean=True, auxiliary_loss=True,
        denormalize=lambda x: x, body_model_fn=body_fn, rot_rep="axis",
        denoise_steps=3))
    state, ld = step_fn(state, jax.random.PRNGKey(2),
                        0.1 * jax.random.normal(jax.random.PRNGKey(3), (4, 63)))
    for k in ("step_loss", "score_loss", "v2v_loss", "j2j_loss"):
        assert np.isfinite(float(ld[k])), k
