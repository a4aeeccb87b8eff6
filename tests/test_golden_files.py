"""Golden-file regression pins for the PC sampler (fixed PRNG, CPU).

Catches silent numerics changes across refactors: the sampler trajectory for
a fixed init/key/tiny-model must stay within fp tolerance of the committed
values (regenerate deliberately via the snippet in tests/golden/README).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.sampling import get_pc_sampler
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.models import ScoreModelFC

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pc_sampler_cpu.npz")


def test_pc_sampler_golden():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=64, embed_dim=32,
                         n_blocks=1, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(1234), jnp.zeros((1, 63)),
                        jnp.zeros((1,)))["params"]
    golden = np.load(GOLDEN)
    for name, sde in [("subvp", sde_lib.SubVPSDE(N=50)),
                      ("vp", sde_lib.VPSDE(N=50)),
                      ("ve", sde_lib.VESDE(N=50))]:
        score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))
        eps = 1e-5 if name == "ve" else 1e-3
        sampler = get_pc_sampler(sde, (4, 63), score_fn, denoise=True, eps=eps)
        _, x = sampler(jax.random.PRNGKey(777))
        ref = golden[name]
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-3 * scale,
                                   err_msg=name)
