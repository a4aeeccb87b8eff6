"""Probe: does splitting the batch block into two interleaved half-chains
let Mosaic overlap VPU work (GroupNorm/SiLU) with MXU matmuls?

The fused EM sampler's step is a strictly dependent chain per batch block:
6 matmuls (~20 us MXU) serialized against ~23 us of VPU work (GN + SiLU +
EM update). Every op is row-independent, so processing the 512-row block
as two 256-row chains, interleaved instruction-by-instruction, exposes
MXU/VPU parallelism *without changing a single computed value* (GroupNorm
normalizes over the hidden dim per row).

This probe times a representative step body (matmul -> lane-strided GN ->
SiLU, CHAIN deep, then an elementwise state update) in three layouts:

  whole   — one 512-row chain (the current kernel's layout)
  split2  — two 256-row chains, interleaved op-by-op
  split4  — four 128-row chains

    python -u benchmarks/ilp_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dposer_tpu.utils.benchtime import steady_state  # noqa: E402

B, H, N_STEPS, CHAIN = 512, 1024, 1000, 6
NUM_GROUPS = 32


def gn_silu(h):
    """Lane-strided GroupNorm (the kernel's real VPU pattern) + SiLU."""
    n_t = H // 128
    inv_gs = 1.0 / (H // NUM_GROUPS)
    s1 = h[:, 0:128]
    s2 = s1 * s1
    for kk in range(1, n_t):
        t = h[:, 128 * kk:128 * (kk + 1)]
        s1 = s1 + t
        s2 = s2 + t * t
    s1 = s1 + pltpu.roll(s1, 32, 1)
    s1 = s1 + pltpu.roll(s1, 64, 1)
    s2 = s2 + pltpu.roll(s2, 32, 1)
    s2 = s2 + pltpu.roll(s2, 64, 1)
    mu = s1 * inv_gs
    var = s2 * inv_gs - mu * mu
    a = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    if n_t > 1:
        mu = jnp.concatenate([mu] * n_t, axis=1)
        a = jnp.concatenate([a] * n_t, axis=1)
    h = (h - mu) * a
    return h * jax.nn.sigmoid(h)


def build(n_split):
    assert B % n_split == 0
    rows = B // n_split

    def kernel(x0, *ws_and_out):
        ws = ws_and_out[:CHAIN]
        out_ref, x_st = ws_and_out[CHAIN], ws_and_out[CHAIN + 1]
        x_st[:] = x0[:]

        def body(i, _):
            # n_split independent half-chains, interleaved op by op
            hs = [x_st[s * rows:(s + 1) * rows, :] for s in range(n_split)]
            for k in range(CHAIN):
                hs = [jnp.dot(h.astype(jnp.bfloat16), ws[k][:],
                              preferred_element_type=jnp.float32) for h in hs]
                hs = [gn_silu(h) for h in hs]
            for s in range(n_split):
                x_st[s * rows:(s + 1) * rows, :] = (
                    x_st[s * rows:(s + 1) * rows, :] * 0.5 + hs[s] * 1e-3)
            return i

        jax.lax.fori_loop(0, N_STEPS, body, 0)
        out_ref[:] = x_st[:]

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + CHAIN),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )

    @jax.jit
    def run(x0, ws):
        return call(x0, *ws)

    return run


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, H), jnp.float32)
    ws = [jax.random.normal(jax.random.fold_in(key, k), (H, H),
                            jnp.bfloat16) * 0.03 for k in range(CHAIN)]
    ref = None
    for n_split in (1, 2, 4):
        run = build(n_split)
        x = np.asarray(run(x0, ws))
        if ref is None:
            ref = x
        else:
            # row-independent ops: splitting must be bit-identical
            print(f"  split{n_split} bitwise == whole: {np.array_equal(ref, x)}")
        t = steady_state(lambda i: run(x0, ws))
        us_per_step = t / N_STEPS * 1e6
        print(f"n_split={n_split}  {t * 1e3:7.2f} ms  {us_per_step:6.2f} us/step",
              flush=True)


if __name__ == "__main__":
    main()
