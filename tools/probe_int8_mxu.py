"""Probe: int8 x int8 MXU dot rate in Pallas on v5e vs bf16-dequant dot.

The w8a8 question (VERDICT r03 next #4): the v5e MXU runs int8 dots at 2x
the bf16 rate. Is that reachable from Pallas (does Mosaic legalize
int8 dot_general with preferred_element_type=int32), and does it beat the
production bf16-dequant path at prefill tiles once the per-token/per-group
rescale is added?

Timing: chained fori_loop on device (one dispatch), value-fetch barrier,
RTT subtracted (see profile_quant_gemm.py for methodology).
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import lvllm_tpu
lvllm_tpu.enable_compile_cache()

# Prefill-ish tile: the fused-FFN kernel runs tile_m=128 row blocks against
# K=2048, per-expert N1=1536 (w1) at the 8B bench geometry.
M, K, N = 256, 2048, 1536
ITERS = 4096
GROUP = 128

_probe = jax.jit(lambda x: x.ravel()[0].astype(jnp.float32))


def measure_rtt(x) -> float:
    float(_probe(x))
    t0 = time.time()
    float(_probe(x))
    return time.time() - t0


def _pallas_matmul(kernel, out_dtype, *arrays):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(*arrays)


def k_bf16(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def k_int8_raw(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def k_int8_dequant_bf16(x_ref, w_ref, s_ref, o_ref):
    # Production-style: int8 weight -> bf16, per-group OUTPUT scale.
    x = x_ref[:]
    acc = None
    sc = s_ref[:]
    for g in range(K // GROUP):
        wg = w_ref[g * GROUP:(g + 1) * GROUP, :].astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            x[:, g * GROUP:(g + 1) * GROUP], wg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        part = part * sc[g][None, :]
        acc = part if acc is None else acc + part
    o_ref[:] = acc.astype(jnp.bfloat16)


def k_w8a8(x_ref, xs_ref, w_ref, s_ref, o_ref):
    # int8 activations x int8 weights -> int32, scaled per (row, group, col).
    x = x_ref[:]
    xs = xs_ref[:]                   # [M, 1] f32 per-token scale
    sc = s_ref[:]                    # [K//G, N] f32 per-group weight scale
    acc = None
    for g in range(K // GROUP):
        part = jax.lax.dot_general(
            x[:, g * GROUP:(g + 1) * GROUP], w_ref[g * GROUP:(g + 1) * GROUP, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        partf = part.astype(jnp.float32) * sc[g][None, :]
        acc = partf if acc is None else acc + partf
    o_ref[:] = (acc * xs).astype(jnp.bfloat16)


def k_w8a8_onedot(x_ref, xs_ref, w_ref, s_ref, o_ref):
    # One whole-K int8 dot, then a single rescale using per-tensor-ish
    # weight scale folded per column (valid when group scales are equal;
    # here just to measure the raw dot rate with the rescale epilogue).
    part = jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (part.astype(jnp.float32) * s_ref[0][None, :] *
                xs_ref[:]).astype(jnp.bfloat16)


def chain(fn, n_arrays):
    """Run fn ITERS times chained through a data dependency on x."""
    @jax.jit
    def run(x, *rest):
        def body(i, x):
            o = fn(x, *rest)
            # Data dependency XLA cannot fold away: the comparison value is
            # data-dependent, so every iteration's matmul feeds the next x.
            return jnp.where(o[0, 0].astype(jnp.float32) == 12345.6789,
                             x + 1, x).astype(x.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return run


def timeit(name, fn, x, *rest):
    flops = 2 * M * K * N * ITERS
    run = chain(fn, len(rest))
    try:
        r = run(x, *rest)
        float(_probe(r))
    except Exception as e:
        print(f"{name:<28} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    rtt = measure_rtt(x)
    t0 = time.time()
    r = run(x, *rest)
    float(_probe(r))
    dt = time.time() - t0 - rtt
    print(f"{name:<28} {dt / ITERS * 1e6:9.1f} us/iter   "
          f"{flops / dt / 1e12:7.2f} TF/s", flush=True)


def main():
    print(f"backend={jax.default_backend()} M={M} K={K} N={N}")
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    xs = jnp.asarray(rng.random((M, 1)), jnp.float32)
    sc = jnp.asarray(rng.random((K // GROUP, N)), jnp.float32)

    timeit("bf16 dot", lambda x, w: _pallas_matmul(k_bf16, jnp.bfloat16, x, w), xb, wb)
    timeit("int8 raw dot (i32 out)",
           lambda x, w: _pallas_matmul(k_int8_raw, jnp.int32, x, w), xi, wi)
    timeit("int8 dequant->bf16 dot",
           lambda x, w, s: _pallas_matmul(k_int8_dequant_bf16, jnp.bfloat16, x, w, s),
           xb, wi, sc)
    timeit("w8a8 grouped rescale",
           lambda x, xs_, w, s: _pallas_matmul(k_w8a8, jnp.bfloat16, x, xs_, w, s),
           xi, xs, wi, sc)
    timeit("w8a8 one dot + epilogue",
           lambda x, xs_, w, s: _pallas_matmul(k_w8a8_onedot, jnp.bfloat16, x, xs_, w, s),
           xi, xs, wi, sc)


if __name__ == "__main__":
    main()
