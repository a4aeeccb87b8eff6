"""Data-parallel training/sampling on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from dposer_tpu.diffusion import losses as losses_lib
from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.sampling import get_pc_sampler
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.models.score_mlp import make_model_apply
from dposer_tpu import parallel as par

DIM = 8


def _setup():
    import ml_collections

    c = ml_collections.ConfigDict()
    c.optim = ml_collections.ConfigDict(dict(optimizer="Adam", lr=1e-3, beta1=0.9,
                                             eps=1e-8, warmup=10, grad_clip=1.0,
                                             weight_decay=0))
    c.model = ml_collections.ConfigDict(dict(ema_rate=0.999))
    sde = sde_lib.SubVPSDE(N=50)
    model = ScoreModelFC(n_poses=2, pose_dim=4, hidden_dim=64, embed_dim=32,
                         n_blocks=1, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)), jnp.zeros((1,)))["params"]
    state, tx = losses_lib.init_train_state(c, params)
    step_fn = losses_lib.get_step_fn(sde, True, make_model_apply(model), tx=tx,
                                     reduce_mean=True)
    return sde, model, state, step_fn


def test_mesh_has_8_devices():
    mesh = par.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device():
    """GSPMD data-parallel must be numerically identical to single-device."""
    _, _, state0, step_fn = _setup()
    mesh = par.make_mesh()
    sharded = par.data_parallel_step(step_fn, mesh)
    single = jax.jit(step_fn)

    key = jax.random.PRNGKey(7)
    batch = jax.random.normal(jax.random.PRNGKey(8), (64, DIM))

    s1, ld1 = single(state0, key, batch)
    s2, ld2 = sharded(state0, key, par.shard_batch(mesh, batch))
    np.testing.assert_allclose(float(ld1["step_loss"]), float(ld2["step_loss"]),
                               rtol=1e-5)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(s1.params),
                               jax.tree_util.tree_leaves_with_path(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6, err_msg=str(pa))


def test_sharded_multi_step_training_runs():
    _, _, state, step_fn = _setup()
    mesh = par.make_mesh()
    sharded = par.data_parallel_step(step_fn, mesh)
    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, k1, k2 = jax.random.split(key, 3)
        batch = par.shard_batch(mesh, 0.3 + 0.8 * jax.random.normal(k1, (128, DIM)))
        state, ld = sharded(state, k2, batch)
    assert int(state.step) == 4
    assert np.isfinite(float(ld["step_loss"]))


def test_sharded_sampler():
    sde = sde_lib.SubVPSDE(N=50)

    def score_fn(x, t):
        a_t, std_t = sde.marginal_prob(jnp.ones_like(x), jnp.atleast_1d(t))
        a = a_t[..., 0] if a_t.ndim == x.ndim else a_t
        var = (a * 0.6) ** 2 + std_t ** 2
        return -(x - a[..., None] * 0.7) / var[..., None] if a.ndim == x.ndim - 1 \
            else -(x - a * 0.7) / var

    mesh = par.make_mesh()
    sampler = get_pc_sampler(sde, (256, DIM), score_fn, denoise=True, jit=False)
    run = par.data_parallel_sampler(sampler, mesh)
    _, x = run(jax.random.PRNGKey(0))
    x = np.asarray(x)
    assert x.shape == (256, DIM)
    assert abs(x.mean() - 0.7) < 0.1


def test_eval_shard_ranges():
    # 100 batches over 8 processes: contiguous, disjoint, covering
    allidx = []
    for pi in range(8):
        r = par.shard_eval_batches(1000, 10, process_index=pi, process_count=8)
        allidx.extend(list(r))
    assert sorted(allidx) == list(range(100))
