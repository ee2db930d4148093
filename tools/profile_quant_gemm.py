"""Microbench: fused dequant grouped GEMM at the 8B-bench decode shapes.

Times the production kernel against candidate variants to attribute the
decode roofline gap (bench r02: 22% of HBM peak). Run on the real chip:
python tools/profile_quant_gemm.py

Timing methodology for the remote (axon) backend: block_until_ready does
NOT barrier on remote execution — only a host VALUE fetch does. Every
measurement chains iterations through a data dependency and ends with one
scalar fetch; the measured fetch RTT is subtracted.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.ops import quant
from lvllm_tpu.ops.pallas import quant_gemm

REPS = 24

# 8B bench decode shapes: batch 16 x top-8 over 64 experts, w1 of one
# layer (K=hidden 2048, N=2*768 moe intermediate).
E, K, N = 64, 2048, 1536
TILE_M = 16
M_PAD = E * TILE_M    # worst case: every expert active with one block

_probe = jax.jit(lambda x: x.ravel()[0].astype(jnp.float32))


def measure_rtt(x) -> float:
    float(_probe(x))
    t0 = time.time()
    float(_probe(x))
    return time.time() - t0


def timeit(name, step, state, rtt, weight_bytes):
    state = step(state)
    float(_probe(state))          # compile + warm
    t0 = time.time()
    for _ in range(REPS):
        state = step(state)
    float(_probe(state))
    ms = (time.time() - t0 - rtt) / REPS * 1000
    print(f"{name:<42} {ms:8.3f} ms   "
          f"({weight_bytes / ms / 1e6:.0f} GB/s eff. weight read)", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((E, K, N), dtype=np.float32) * 0.05
    qw, s = quant.quantize_int4_np(w, 128)
    qw = jnp.asarray(qw)
    s = jnp.asarray(s, jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((M_PAD, K)), jnp.float32)
    block_expert = jnp.asarray(np.arange(M_PAD // TILE_M) % E, jnp.int32)
    wbytes = qw.nbytes + s.nbytes
    rtt = measure_rtt(x0)
    import sys as _sys
    print(f"fetch RTT {rtt*1000:.1f} ms; weights {wbytes/1e6:.0f} MB", flush=True)

    def make_step(variant):
        @jax.jit
        def step(x):
            out = quant_gemm.grouped_quant_matmul(
                x.astype(jnp.bfloat16), qw, s, block_expert,
                method="int4", tile_m=TILE_M, variant=variant)
            # Chain: fold a tiny function of the output back into x so
            # iterations cannot be elided or reordered.
            pad = jnp.zeros((M_PAD, K - N), out.dtype)
            return x + jnp.concatenate([out, pad], 1).astype(jnp.float32) \
                * 1e-6
        return step

    for variant in ("default", "bf16dot", "groupscale"):
        try:
            timeit(f"int4 kernel: {variant}", make_step(variant), x0, rtt,
                   wbytes)
        except Exception as e:  # noqa: BLE001
            print(f"variant {variant} failed: {repr(e)[:200]}")

    # HBM floor: stream the weights once per iteration.
    @jax.jit
    def floor_step(t):
        return t + qw.astype(jnp.float32).sum() * 1e-12 + \
            s.astype(jnp.float32).sum() * 1e-12
    timeit("HBM floor (sum over weights)", floor_step,
           jnp.float32(0.0), rtt, wbytes)

    # Dense bf16 ragged_dot on dequantized weights (2x the bytes).
    wd = jnp.asarray(quant.dequant_int4(qw, s, 128, jnp.bfloat16))
    gs = jnp.full((E,), TILE_M, jnp.int32)

    @jax.jit
    def ragged_step(x):
        out = jax.lax.ragged_dot(x.astype(jnp.bfloat16), wd, gs)
        pad = jnp.zeros((M_PAD, K - N), out.dtype)
        return x + jnp.concatenate([out, pad], 1).astype(jnp.float32) * 1e-6
    timeit("bf16 ragged_dot (2x bytes)", ragged_step, x0, rtt, wd.nbytes)


if __name__ == "__main__":
    main()
