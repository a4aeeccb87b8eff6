"""Mosaic MXU microbenchmark: dependent-matmul chain inside one kernel.

Isolates what a [512,1024]x[1024,1024] bf16 matmul chain actually costs in a
Pallas fori_loop (vs the 197 TFLOP/s roofline), with/without fp32 accumulate
and with loop unrolling — to pin the fused sampler's true speed-of-light.

Timing is steady-state: M launches enqueued back-to-back, completion of the
last forced with a D2H read. A single timed call on this tunneled host
includes ~25 ms of fixed RPC dispatch latency (see PERFORMANCE.md), which
earlier versions of this benchmark wrongly attributed to per-matmul issue
overhead (9.6 us/matmul single-call -> ~4.8 us/matmul steady-state).

    python -u benchmarks/mxu_micro.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dposer_tpu.utils.benchtime import steady_state  # noqa: E402
from jax.experimental.pallas import tpu as pltpu

B, H, N_STEPS, CHAIN = 512, 1024, 1000, 6


def build(acc_dtype, operand="bf16"):
    """operand: 'bf16' (bf16 x bf16 -> acc) or 'int8' (int8 x int8 -> int32,
    with the per-pass activation requantization the real kernel would pay:
    fp32 accumulator -> scale -> round -> clip -> int8)."""

    def kernel(x0, *ws_and_out):
        ws = ws_and_out[:CHAIN]
        out_ref, x_st = ws_and_out[CHAIN], ws_and_out[CHAIN + 1]
        x_st[:] = x0[:]

        def body(i, _):
            h = x_st[:]
            for k in range(CHAIN):
                if operand == "int8":
                    hq = jnp.clip(jnp.round(h * 21.0), -127, 127).astype(jnp.int8)
                    acc = jnp.dot(hq, ws[k][:], preferred_element_type=jnp.int32)
                    h = acc.astype(jnp.float32) * (1.0 / (21.0 * 127.0))
                else:
                    hb = h.astype(jnp.bfloat16)
                    h = jnp.dot(hb, ws[k][:], preferred_element_type=acc_dtype)
                    h = h.astype(jnp.float32)
            # accumulate so every iteration observably changes state
            x_st[:] = x_st[:] * 0.5 + h * 1e-3
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
    ws_i8 = [jnp.clip(jnp.round(w.astype(jnp.float32) * 127.0 / 0.12),
                      -127, 127).astype(jnp.int8) for w in ws]
    flops = 2 * B * H * H * CHAIN * N_STEPS
    for acc, operand, weights in ((jnp.float32, "bf16", ws),
                                  (jnp.bfloat16, "bf16", ws),
                                  (jnp.int32, "int8", ws_i8)):
        run = build(acc, operand)
        try:
            x = run(x0, weights)
        except Exception as e:  # e.g. Mosaic rejects bf16 accumulators
            print(f"op={operand:5s} acc={acc.__name__:9s} unsupported: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        np.asarray(x)  # compile + force true completion
        t = steady_state(lambda i: run(x0, weights))
        us_per_mm = t / N_STEPS / CHAIN * 1e6
        print(f"op={operand:5s} acc={acc.__name__:9s} {t * 1e3:7.2f} ms  "
              f"{us_per_mm:5.2f} us/matmul  "
              f"{flops / t / 1e12:6.1f} T(FL)OP/s  checksum={float(abs(x).sum()):.3e}",
              flush=True)


if __name__ == "__main__":
    main()
