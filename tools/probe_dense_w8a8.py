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


def chain_time(fn, x, wargs, iters, label):
    """fn(c, *wargs) -> y. Weights are jit ARGUMENTS (a closed-over
    622 MB lm_head becomes a >100 MB remote-compile payload -> HTTP 413;
    CLAUDE.md r02). Differential timing: per-iter = (t(4N) - t(N)) / 3N
    with a fresh carry per timed run — subtracting the two runs cancels
    dispatch/fetch constants, and varying the input defeats any
    result-level caching in the remote transport."""
    import functools

    @functools.partial(jax.jit, static_argnums=(0,))
    def run(n, x0, *ws):
        def body(i, c):
            y = fn(c, *ws)
            # Data dependency XLA can't fold away: y feeds the carry at
            # full rank (not just one element).
            return c + y * 1e-20
        return jax.lax.fori_loop(0, n, body, x0, unroll=False)

    run(iters, x, *wargs).block_until_ready()
    run(4 * iters, x, *wargs).block_until_ready()

    def timed(n, seed):
        xv = x + jnp.bfloat16(seed * 1e-6)
        t0 = time.time()
        float(_probe(run(n, xv, *wargs)))
        return time.time() - t0

    t1 = min(timed(iters, 1), timed(iters, 2))
    t4 = min(timed(4 * iters, 3), timed(4 * iters, 4))
    per = (t4 - t1) / (3 * iters) * 1e6
    print(f"{label:34s} {per:9.2f} us/iter", flush=True)
    return per


def bench_shape(M, K, N, iters, tag):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    qw, s = quantize_dense_np(w)
    wb = jnp.asarray(w, jnp.bfloat16)
    qw = jnp.asarray(qw)
    s = jnp.asarray(s)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    t_bf = chain_time(lambda c, wb_: (c @ wb_).astype(jnp.bfloat16)[:, :K],
                      x, (wb,), iters, f"{tag} bf16 M={M}")
    t_q = chain_time(
        lambda c, qw_, s_:
            w8a8_dense(c, qw_, s_).astype(jnp.bfloat16)[:, :K],
        x, (qw, s), iters, f"{tag} w8a8 M={M}")
    gb = (K * N) / 1e9
    print(f"  -> bf16 {2 * gb / (t_bf / 1e6):6.1f} GB/s eff | w8a8 "
          f"{gb / (t_q / 1e6):6.1f} GB/s eff | speedup "
          f"{t_bf / t_q:.2f}x", flush=True)
    return t_bf, t_q


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    # o_proj decode + prefill
    bench_shape(16, 2048, 2048, 512, "o_proj")
    bench_shape(2048, 2048, 2048, 128, "o_proj")
    # lm_head decode (the big fixed-cost read)
    bench_shape(16, 2048, 151936, 32, "lm_head")
