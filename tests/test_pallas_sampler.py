"""Pallas fused EM kernel vs an XLA reference with identical noise."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.fast_sampler import (_em_tables, _labels_for,
                                               make_fast_forward,
                                               precompute_time_tables)
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler


def xla_reference(sde, model, params, x0, noise, eps, denoise=True):
    """Same tables/updates as the kernel, plain XLA."""
    timesteps = sde.timesteps(eps)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _em_tables(sde, timesteps)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    if out_scale is not None:
        cout = cout * out_scale
    fwd = make_fast_forward(model, params, tprojs,
                            None)  # out_scale folded into cout

    def step(carry, i):
        x, _ = carry
        out = fwd(x, i)
        x_mean = cx[i] * x + cout[i] * out
        return (x_mean + cnoise[i] * noise[i], x_mean), None

    (x, x_mean), _ = jax.lax.scan(step, (x0, x0),
                                  jnp.arange(sde.N, dtype=jnp.int32))
    return x_mean if denoise else x



def run_parity(sde, eps, shape=(8, 63), atol_scale=2e-2, n_steps=None,
               model_kwargs=None, **sampler_kwargs):
    """Shared parity harness: build model+params, run the XLA twin and the
    interpret-mode kernel on identical injected noise, compare at
    trajectory scale."""
    mk = dict(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=64,
              n_blocks=2, dropout=0.0, scale_by_sigma=False)
    mk.update(model_kwargs or {})
    model = ScoreModelFC(**mk)
    dim = mk["n_poses"] * mk["pose_dim"]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, dim)),
                        jnp.zeros((1,)))["params"]
    n = n_steps or sde.N
    x0 = jax.random.normal(jax.random.PRNGKey(1), shape)
    noise = jax.random.normal(jax.random.PRNGKey(2), (n,) + shape)
    ref = np.asarray(xla_reference(sde, model, params, x0, noise, eps=eps))
    sampler = get_pallas_em_sampler(sde, model, params, shape, eps=eps,
                                    interpret=True, **sampler_kwargs)
    _, out = sampler(jax.random.PRNGKey(9), z=x0, noise=noise)
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=atol_scale * scale)


@pytest.mark.parametrize("gn", ["vpu", "mm"])
@pytest.mark.parametrize("scale_by_sigma", [False, True])
def test_kernel_matches_xla_reference(scale_by_sigma, gn):
    """Both GN paths: lane-strided VPU (hidden % 128 == 0, the default) and
    the group-matmul fallback; kernel bf16 matmuls vs the fp32 XLA twin."""
    run_parity(sde_lib.SubVPSDE(N=20), eps=1e-3, gn=gn,
               model_kwargs=dict(scale_by_sigma=scale_by_sigma))


@pytest.mark.parametrize("sde_name", ["vp", "ve"])
def test_kernel_other_sde_families(sde_name):
    """The kernel's coefficient tables are SDE-generic: VP and VE must match
    the XLA twin too (flagship protocols use subVP; covered above)."""
    if sde_name == "vp":
        run_parity(sde_lib.VPSDE(N=20), eps=1e-3,
                   model_kwargs=dict(n_blocks=1))
    else:
        run_parity(sde_lib.VESDE(N=20), eps=1e-5,
                   model_kwargs=dict(n_blocks=1))


def test_kernel_rot6d_dims():
    """126-dim rot6d poses (dim_p = 128, partially padded lane tile)."""
    run_parity(sde_lib.SubVPSDE(N=15), eps=1e-3, shape=(8, 126),
               model_kwargs=dict(pose_dim=6, n_blocks=1))


def test_kernel_gn_fallback_unaligned_hidden():
    """hidden % 128 != 0 selects the matmul-GN path automatically and still
    matches the XLA reference."""
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=192, embed_dim=64,
                         n_blocks=1, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)),
                        jnp.zeros((1,)))["params"]
    sde = sde_lib.SubVPSDE(N=10)
    shape = (4, 63)
    x0 = jax.random.normal(jax.random.PRNGKey(1), shape)
    noise = jax.random.normal(jax.random.PRNGKey(2), (10,) + shape)
    ref = np.asarray(xla_reference(sde, model, params, x0, noise, eps=1e-3))
    sampler = get_pallas_em_sampler(sde, model, params, shape, eps=1e-3,
                                    interpret=True)
    _, out = sampler(jax.random.PRNGKey(9), z=x0, noise=noise)
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2 * scale)
    with pytest.raises(ValueError):
        get_pallas_em_sampler(sde, model, params, shape, interpret=True,
                              gn="vpu")


def test_kernel_prior_sampling_runs():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=64,
                         n_blocks=1, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)),
                        jnp.zeros((1,)))["params"]
    sde = sde_lib.SubVPSDE(N=10)
    sampler = get_pallas_em_sampler(sde, model, params, (4, 63), interpret=True)
    _, x = sampler(jax.random.PRNGKey(5))
    assert x.shape == (4, 63)
    assert np.isfinite(np.asarray(x)).all()


def test_kernel_multi_block_grid():
    """Batch larger than batch_block runs the grid path; per-sample results
    must be independent of the blocking (compare 2-block vs 1-block)."""
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=64,
                         n_blocks=1, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 63)),
                        jnp.zeros((1,)))["params"]
    sde = sde_lib.SubVPSDE(N=15)
    shape = (256, 63)
    x0 = jax.random.normal(jax.random.PRNGKey(2), shape)
    noise = jax.random.normal(jax.random.PRNGKey(3), (15,) + shape)
    one = get_pallas_em_sampler(sde, model, params, shape, interpret=True,
                                batch_block=256)
    two = get_pallas_em_sampler(sde, model, params, shape, interpret=True,
                                batch_block=128)
    _, a = one(jax.random.PRNGKey(4), z=x0, noise=noise)
    _, b = two(jax.random.PRNGKey(4), z=x0, noise=noise)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
