"""Few-step deterministic samplers (DDIM / DPM-Solver++(2M)) — structure.

These tests pin the machinery on an untrained model (grids, tables, nfe
accounting, the Pallas table-override path, VE support). The convergence
and quality contracts — DDIM/DPM converge pointwise to the same
probability-flow solution the RK4 ODE sampler integrates, at their
respective orders — live in ``test_golden_pipeline.py`` on a trained
model (an untrained score field's reverse flow diverges, so trajectory
comparisons are only meaningful there between IDENTICAL flows).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion.few_step import (ddim_tables, get_ddim_sampler,
                                           get_dpm_sampler,
                                           get_pallas_ddim_sampler, step_grid)
from dposer_tpu.diffusion.sde import SubVPSDE, VESDE, VPSDE
from dposer_tpu.models import ScoreModelFC

DIM = 63


@pytest.fixture(scope="module")
def small():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=256, embed_dim=64,
                         n_blocks=2, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    return model, params


def test_step_grid_t_and_lambda():
    sde = SubVPSDE(N=1000)
    for grid in ("t", "lambda"):
        g = np.asarray(step_grid(sde, 17, 1e-3, grid))
        assert g.shape == (17,)
        assert g[0] == pytest.approx(sde.T) and g[-1] == pytest.approx(1e-3)
        assert np.all(np.diff(g) < 0), grid  # strictly decreasing
    with pytest.raises(ValueError, match="grid"):
        step_grid(sde, 5, 1e-3, "cosine")


@pytest.mark.parametrize("sde", [SubVPSDE(N=1000), VPSDE(N=1000)])
def test_ddim_tables_shapes_and_denoise_row(sde, small):
    model, params = small
    taus, cx, cout, cnoise = ddim_tables(sde, 10, 1e-3, model, params,
                                         denoise=True)
    assert taus.shape == cx.shape == cout.shape == (11,)
    assert np.all(np.asarray(cnoise) == 0)
    # final row is the x0 projection at eps: cx = 1/alpha(eps) ~ 1
    a_eps, _ = sde.return_alpha_sigma(jnp.asarray([1e-3]))
    assert float(cx[-1]) == pytest.approx(1.0 / float(a_eps.reshape(())), rel=1e-5)
    taus_nd, cx_nd, *_ = ddim_tables(sde, 10, 1e-3, model, params,
                                     denoise=False)
    assert taus_nd.shape == cx_nd.shape == (10,)


@pytest.mark.parametrize("sde", [SubVPSDE(N=1000), VPSDE(N=1000),
                                 VESDE(N=1000)])
def test_samplers_run_and_count_nfe(sde, small):
    model, params = small
    shape = (8, DIM)
    nfe, x = get_ddim_sampler(sde, model, params, shape, n_steps=6)(
        jax.random.PRNGKey(1))
    assert nfe == 7 and x.shape == shape  # 6 steps + denoise projection
    assert bool(jnp.isfinite(x).all())
    nfe, x = get_dpm_sampler(sde, model, params, shape, n_steps=6)(
        jax.random.PRNGKey(1))
    assert nfe == 7 and x.shape == shape
    assert bool(jnp.isfinite(x).all())
    nfe, x = get_dpm_sampler(sde, model, params, shape, n_steps=6,
                             denoise=False)(jax.random.PRNGKey(1))
    assert nfe == 6


def test_pallas_ddim_matches_xla_twin(small):
    """The table-override path through the fused EM kernel integrates the
    same DDIM rows: bf16 kernel vs fp32 XLA over a deterministic short
    horizon (no noise amplification) stays within bf16 rounding scale."""
    model, params = small
    sde = SubVPSDE(N=1000)
    shape = (8, DIM)
    z = jax.random.normal(jax.random.PRNGKey(2), shape)
    xla = get_ddim_sampler(sde, model, params, shape, n_steps=10)
    pal = get_pallas_ddim_sampler(sde, model, params, shape, n_steps=10,
                                  interpret=True)
    nfe_a, a = xla(jax.random.PRNGKey(1), z=z)
    nfe_b, b = pal(jax.random.PRNGKey(1), z=z)
    assert nfe_a == nfe_b == 11
    scale = float(jnp.max(jnp.abs(a))) + 1e-9
    assert float(jnp.max(jnp.abs(b - a))) / scale < 2e-2


def test_pallas_ddim_quant_runs(small):
    """DDIM + int8 compose (both ride get_pallas_em_sampler options)."""
    model, params = small
    sde = SubVPSDE(N=1000)
    amax = np.array([4.0, 3.0, 3.0, 4.0, 3.0, 5.0], np.float32)
    s = get_pallas_ddim_sampler(sde, model, params, (8, DIM), n_steps=5,
                                interpret=True, quant="int8", act_amax=amax)
    nfe, x = s(jax.random.PRNGKey(1))
    assert nfe == 6 and bool(jnp.isfinite(x).all())
