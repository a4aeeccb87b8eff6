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


# ---------------------------------------------------------------------------
# Masked imputation (few-step completion serving; ref sampling.py:410-427)
# ---------------------------------------------------------------------------

def _obs_mask(shape):
    obs = 0.3 * jax.random.normal(jax.random.PRNGKey(5), shape)
    mask = jnp.zeros(shape).at[:, 10:30].set(1.0)
    return obs, mask


@pytest.mark.parametrize("builder", [get_ddim_sampler, get_dpm_sampler])
def test_few_step_imputation_pins_observed_dims(small, builder):
    """After the final x0 projection the observed dims sit within the
    eps-level re-noise band of the observation (the reference pastes them
    exactly afterwards, ref run/completion.py:205)."""
    model, params = small
    sde = SubVPSDE(N=1000)
    shape = (8, DIM)
    obs, mask = _obs_mask(shape)
    nfe, x = builder(sde, model, params, shape, n_steps=8,
                     imputation=True)(jax.random.PRNGKey(1), obs, mask)
    assert nfe == 9 and bool(jnp.isfinite(x).all())
    # subVP marginal std at eps=1e-3 is ~2e-4 of the data scale
    err = float(jnp.max(jnp.abs((x - obs) * mask)))
    assert err < 1e-2, err
    # unobserved dims were actually sampled, not copied
    assert float(jnp.max(jnp.abs(x * (1 - mask)))) > 0.01


def test_pallas_ddim_imputation_matches_xla_rows(small):
    """Injected noise slabs (kernel order imput_c, em, imput_p) through the
    Pallas DDIM+imputation path vs a hand-rolled XLA twin over the same
    tables: the kernel derives its imputation columns from the overridden
    DDIM timesteps, so both must integrate identical rows."""
    from dposer_tpu.diffusion.fast_sampler import (_imputation_tables,
                                                   _labels_for,
                                                   make_fast_forward,
                                                   precompute_time_tables)

    model, params = small
    sde = SubVPSDE(N=1000)
    shape = (8, DIM)
    n_steps = 6
    obs, mask = _obs_mask(shape)
    z0 = jax.random.normal(jax.random.PRNGKey(2), shape)
    taus, cx, cout, _ = ddim_tables(sde, n_steps, 1e-3, model, params,
                                    denoise=True)
    n_rows = int(taus.shape[0])
    noise = jax.random.normal(jax.random.PRNGKey(3), (n_rows, 3, *shape))

    tprojs, _ = precompute_time_tables(model, params, _labels_for(sde, taus))
    fwd = make_fast_forward(model, params, tprojs, None)
    mc, istd = _imputation_tables(sde, taus)

    x = z0
    for i in range(n_rows):
        x = x * (1 - mask) + (mc[i] * obs + istd[i] * noise[i, 0]) * mask
        x_mean = cx[i] * x + cout[i] * fwd(x, i)
        # cnoise = 0 (slab noise[i, 1] multiplies zero); post-predictor impute
        x = x_mean * (1 - mask) + (mc[i] * obs + istd[i] * noise[i, 2]) * mask
    ref = x_mean  # kernel denoise=True returns the LAST row's x_mean

    pal = get_pallas_ddim_sampler(sde, model, params, shape, n_steps=n_steps,
                                  interpret=True, imputation=True)
    nfe, out = pal(jax.random.PRNGKey(0), observation=obs, mask=mask, z=z0,
                   noise=noise)
    assert nfe == n_rows
    ref_np = np.asarray(ref)
    scale = max(1.0, np.abs(ref_np).max())
    err = np.abs(np.asarray(out) - ref_np).max() / scale
    # bf16 kernel matmuls vs fp32 XLA twin over a deterministic short horizon
    assert err < 5e-2, err


def test_hypo_samplers_shapes_and_decorrelation(small):
    """[B, H, D] contract; hypotheses differ on unobserved dims and agree
    (to re-noise tolerance) on observed ones."""
    from dposer_tpu.diffusion.few_step import (get_ddim_hypo_sampler,
                                               get_dpm_hypo_sampler,
                                               get_pallas_ddim_hypo_sampler)

    model, params = small
    sde = SubVPSDE(N=1000)
    shape = (4, DIM)
    obs, mask = _obs_mask(shape)
    for build in (lambda: get_ddim_hypo_sampler(sde, model, params, shape, 3,
                                                n_steps=6),
                  lambda: get_dpm_hypo_sampler(sde, model, params, shape, 3,
                                               n_steps=6),
                  lambda: get_pallas_ddim_hypo_sampler(sde, model, params,
                                                       shape, 3, n_steps=6,
                                                       interpret=True)):
        nfe, out = build()(jax.random.PRNGKey(1), obs, mask)
        assert out.shape == (4, 3, DIM)
        m = mask[:, None]
        assert float(jnp.max(jnp.abs((out - obs[:, None]) * m))) < 1e-2
        spread = jnp.std(out * (1 - m), axis=1).max()
        assert float(spread) > 1e-3  # hypotheses decorrelate


def test_pallas_ddim_mixed_precision_threads_imputation(small):
    """bf16_tail_steps head/tail composition forwards observation/mask to
    both kernel dispatches."""
    model, params = small
    sde = SubVPSDE(N=1000)
    shape = (8, DIM)
    obs, mask = _obs_mask(shape)
    amax = np.array([4.0, 3.0, 3.0, 4.0, 3.0, 5.0], np.float32)
    s = get_pallas_ddim_sampler(sde, model, params, shape, n_steps=8,
                                interpret=True, imputation=True,
                                quant="int8", act_amax=amax,
                                bf16_tail_steps=2)
    nfe, x = s(jax.random.PRNGKey(1), observation=obs, mask=mask)
    assert nfe == 9 and bool(jnp.isfinite(x).all())
    assert float(jnp.max(jnp.abs((x - obs) * mask))) < 5e-2


# ---------------------------------------------------------------------------
# Hybrid DDIM head + exact pc tail (few-step completion serving mode)
# ---------------------------------------------------------------------------

def test_fast_pc_step_range_is_exact(small):
    """get_fast_pc_sampler(step_range=): head+tail under ONE key is
    bitwise the full run — tables are per-row value functions and the
    generic PRNG folds the GLOBAL step index (the property the hybrid
    sampler's 'exact pc tail' claim rests on)."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_pc_sampler
    from dposer_tpu.diffusion.sde import SubVPSDE

    model, params = small
    sde = SubVPSDE(N=40)
    shape = (4, DIM)
    obs, mask = _obs_mask(shape)
    kw = dict(corrector="langevin", imputation=True)
    full = get_fast_pc_sampler(sde, model, params, shape, **kw)
    head = get_fast_pc_sampler(sde, model, params, shape, denoise=False,
                               step_range=(0, 25), **kw)
    tail = get_fast_pc_sampler(sde, model, params, shape,
                               step_range=(25, 40), **kw)
    k = jax.random.PRNGKey(5)
    _, xf = full(k, observation=obs, mask=mask)
    k2, sub = jax.random.split(k)  # replicate full()'s prior-draw split
    z0 = sde.prior_sampling(sub, shape)
    _, xh = head(k2, observation=obs, mask=mask, z=z0)
    _, xt = tail(k2, observation=obs, mask=mask, z=xh)
    np.testing.assert_array_equal(np.asarray(xt), np.asarray(xf))
    with pytest.raises(ValueError, match="step_range"):
        get_fast_pc_sampler(sde, model, params, shape, step_range=(0, 99))


def test_hybrid_sampler_runs_counts_nfe_and_pins_observed(small):
    from dposer_tpu.diffusion.few_step import (get_hybrid_sampler,
                                               get_pallas_hybrid_sampler,
                                               hybrid_t_switch)

    model, params = small
    sde = SubVPSDE(N=100)
    shape = (8, DIM)
    obs, mask = _obs_mask(shape)
    with pytest.raises(ValueError, match="m_tail"):
        hybrid_t_switch(sde, 100, 1e-3)
    # XLA twin: corrector-none tail (the completion protocol's form)
    nfe, x = get_hybrid_sampler(sde, model, params, shape, n_head=5,
                                m_tail=20, imputation=True)(
        jax.random.PRNGKey(1), observation=obs, mask=mask)
    assert nfe == 25 and bool(jnp.isfinite(x).all())
    assert float(jnp.max(jnp.abs((x - obs) * mask))) < 1e-2
    assert float(jnp.max(jnp.abs(x * (1 - mask)))) > 0.01
    # langevin tail doubles the tail NFE
    nfe, _ = get_hybrid_sampler(sde, model, params, shape, n_head=5,
                                m_tail=20, tail_corrector="langevin")(
        jax.random.PRNGKey(1))
    assert nfe == 45
    # Pallas two-dispatch form (interpret): same contract
    nfe, x = get_pallas_hybrid_sampler(sde, model, params, shape, n_head=5,
                                       m_tail=20, imputation=True,
                                       interpret=True)(
        jax.random.PRNGKey(1), observation=obs, mask=mask)
    assert nfe == 25 and bool(jnp.isfinite(x).all())
    assert float(jnp.max(jnp.abs((x - obs) * mask))) < 1e-2


def test_hybrid_hypo_samplers_shapes(small):
    from dposer_tpu.diffusion.few_step import (get_hybrid_hypo_sampler,
                                               get_pallas_hybrid_hypo_sampler)

    model, params = small
    sde = SubVPSDE(N=100)
    shape = (4, DIM)
    obs, mask = _obs_mask(shape)
    for build in (lambda: get_hybrid_hypo_sampler(sde, model, params, shape,
                                                  3, n_head=4, m_tail=10),
                  lambda: get_pallas_hybrid_hypo_sampler(
                      sde, model, params, shape, 3, n_head=4, m_tail=10,
                      interpret=True)):
        nfe, out = build()(jax.random.PRNGKey(1), obs, mask)
        assert nfe == 14 and out.shape == (4, 3, DIM)
        m = mask[:, None]
        assert float(jnp.max(jnp.abs((out - obs[:, None]) * m))) < 1e-2
        spread = jnp.std(out * (1 - m), axis=1).max()
        assert float(spread) > 1e-3


def test_pallas_hybrid_quant_composes(small):
    """int8 per-channel rides both hybrid dispatches (head via table
    override, tail via step_range)."""
    from dposer_tpu.diffusion.few_step import get_pallas_hybrid_sampler

    model, params = small
    sde = SubVPSDE(N=100)
    d_in = model.n_poses * model.pose_dim
    hid = model.hidden_dim
    amax_c = ([np.full((d_in,), 4.0, np.float32)]
              + [np.full((hid,), 3.0, np.float32)] * (2 * model.n_blocks)
              + [np.full((hid,), 5.0, np.float32)])
    s = get_pallas_hybrid_sampler(sde, model, params, (8, DIM), n_head=4,
                                  m_tail=10, interpret=True,
                                  quant="int8", act_amax=amax_c)
    nfe, x = s(jax.random.PRNGKey(1))
    assert nfe == 14 and bool(jnp.isfinite(x).all())
