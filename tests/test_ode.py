"""On-device RK45 vs scipy solve_ivp."""
import jax.numpy as jnp
import numpy as np
from scipy import integrate

from dposer_tpu.diffusion import ode as ode_lib


def test_exponential_decay():
    sol = ode_lib.rk45(lambda t, y: -y, 0.0, 2.0, jnp.ones((4,)), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.y), np.exp(-2.0), rtol=1e-5)
    assert int(sol.status) == 0


def test_backward_integration():
    # dy/dt = y integrated backward from t=1 to 0 with y(1)=e -> y(0)=1
    sol = ode_lib.rk45(lambda t, y: y, 1.0, 0.0, jnp.full((3,), np.e), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.y), 1.0, rtol=1e-5)


def test_nonlinear_system_vs_scipy():
    def f_np(t, y):
        return np.array([y[1], -np.sin(y[0]) - 0.1 * y[1]])  # damped pendulum

    def f_jx(t, y):
        return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1]])

    y0 = np.array([1.2, 0.0])
    ref = integrate.solve_ivp(f_np, (0, 10), y0, rtol=1e-6, atol=1e-8, method="RK45")
    sol = ode_lib.rk45(f_jx, 0.0, 10.0, jnp.asarray(y0), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.y), ref.y[:, -1], rtol=1e-4, atol=1e-6)
    # comparable adaptive behavior: NFE within 3x of scipy's
    assert int(sol.nfe) < 3 * ref.nfev


def test_matrix_state():
    # state can be any shape (batch, dim)
    y0 = jnp.ones((5, 3))
    sol = ode_lib.rk45(lambda t, y: -2.0 * y, 0.0, 1.0, y0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.y), np.exp(-2.0), rtol=1e-5)


def test_max_steps_status():
    # stiff-ish problem with absurdly tight tolerance and tiny max_steps
    sol = ode_lib.rk45(lambda t, y: -1000 * y, 0.0, 1.0, jnp.ones((2,)),
                       rtol=1e-12, atol=1e-14, max_steps=3)
    assert int(sol.status) == 1
