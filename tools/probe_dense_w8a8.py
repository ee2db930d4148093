"""Probe: XLA-level dense w8a8 (per-token act quant + s8xs8 dot_general)
vs bf16 at the 8B bench geometry, on the real chip.

Questions (VERDICT r04 #5):
- does XLA:TPU legalize jnp-level int8 dot_general on v5e (the r04 probe
  answered this for Pallas/Mosaic only)?
- net step-time effect at decode tiles (M=16: weight-HBM-bound, int8
  halves bytes) and prefill tiles (M=2048: MXU-bound, int8 doubles rate)?
- lm_head [2048 x 151936]: the single biggest dense read per decode step.

Timing: chained lax.fori_loop on device (one dispatch), value-fetch
barrier, RTT subtracted (methodology: tools/profile_quant_gemm.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import lvllm_tpu

lvllm_tpu.enable_compile_cache()
from lvllm_tpu.ops.quant import quantize_dense_np, w8a8_dense  # noqa: E402

_probe = jax.jit(lambda x: x.ravel()[0].astype(jnp.float32))


def rtt() -> float:
    x = jnp.zeros((8,), jnp.float32)
    float(_probe(x))
    t0 = time.time()
    for _ in range(6):
        float(_probe(x))
    return (time.time() - t0) / 6


def chain_time(fn, x, iters, label):
    """fn: x -> y with y.shape == x.shape-compatible chain carry."""

    @jax.jit
    def run(x0):
        def body(i, c):
            y = fn(c)
            # Data dependency XLA can't fold away.
            return c + (y.ravel()[0] * 1e-20).astype(c.dtype)
        return jax.lax.fori_loop(0, iters, body, x0)

    run(x).block_until_ready()
    r = rtt()
    t0 = time.time()
    float(_probe(run(x)))
    el = time.time() - t0 - r
    per = el / iters * 1e6
    print(f"{label:34s} {per:9.2f} us/iter")
    return per


def bench_shape(M, K, N, iters, tag):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    qw, s = quantize_dense_np(w)
    wb = jnp.asarray(w, jnp.bfloat16)
    qw = jnp.asarray(qw)
    s = jnp.asarray(s)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    t_bf = chain_time(lambda c: (c @ wb).astype(jnp.bfloat16)[:, :K],
                      x, iters, f"{tag} bf16 M={M}")
    t_q = chain_time(
        lambda c: w8a8_dense(c, qw, s).astype(jnp.bfloat16)[:, :K],
        x, iters, f"{tag} w8a8 M={M}")
    gb = (K * N) / 1e9
    print(f"  -> bf16 {2 * gb / (t_bf / 1e6):6.1f} GB/s eff | w8a8 "
          f"{gb / (t_q / 1e6):6.1f} GB/s eff | speedup "
          f"{t_bf / t_q:.2f}x")
    return t_bf, t_q


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    # o_proj decode + prefill
    bench_shape(16, 2048, 2048, 512, "o_proj")
    bench_shape(2048, 2048, 2048, 128, "o_proj")
    # lm_head decode (the big fixed-cost read)
    bench_shape(16, 2048, 151936, 32, "lm_head")
