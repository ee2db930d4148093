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

    def make_step(variant, wq, ws, method="int4"):
        # Weights ride as jit ARGUMENTS (closure constants ship inside the
        # remote-compile payload and 413 past ~100 MB).
        @jax.jit
        def step_inner(x, wq, ws):
            out = quant_gemm.grouped_quant_matmul(
                x.astype(jnp.bfloat16), wq, ws, block_expert,
                method=method, tile_m=TILE_M, variant=variant)
            # Chain: fold a tiny function of the output back into x so
            # iterations cannot be elided or reordered.
            pad = jnp.zeros((M_PAD, K - N), out.dtype)
            return x + jnp.concatenate([out, pad], 1).astype(jnp.float32) \
                * 1e-6
        return lambda x: step_inner(x, wq, ws)

    for variant in ("default", "bf16dot", "groupscale", "twodot", "touch"):
        try:
            timeit(f"int4 kernel: {variant}", make_step(variant, qw, s),
                   x0, rtt, wbytes)
        except Exception as e:  # noqa: BLE001
            print(f"variant {variant} failed: {repr(e)[:200]}")

    # Column-tiled contiguous layout (load-time repack): one contiguous
    # slab DMA per (expert, col-tile) + far fewer grid steps.
    for tn in (512, 768, 1536):
        if N % tn:
            continue
        try:
            wt = quant_gemm._tile_last_dim(qw, tn)
            st = quant_gemm._tile_last_dim(s, tn)

            def make_tiled(wt, st):
                @jax.jit
                def step_inner(x, wt, st):
                    out = quant_gemm.grouped_quant_matmul_tiled(
                        x.astype(jnp.bfloat16), wt, st, block_expert,
                        method="int4", tile_m=TILE_M)
                    pad = jnp.zeros((M_PAD, K - N), out.dtype)
                    return x + jnp.concatenate(
                        [out, pad], 1).astype(jnp.float32) * 1e-6
                return lambda x: step_inner(x, wt, st)

            timeit(f"int4 tiled layout tn={tn}", make_tiled(wt, st), x0,
                   rtt, wbytes)
        except Exception as e:  # noqa: BLE001
            print(f"tiled tn={tn} failed: {repr(e)[:200]}")

    # jnp.int4 native storage (bit-packed in HBM; Mosaic hardware convert).
    try:
        lo = (qw_np := np.asarray(qw)) & 0x0F
        lo = ((lo ^ 8) - 8).astype(np.int8)
        hi = ((((qw_np >> 4) & 0x0F) ^ 8) - 8).astype(np.int8)
        q_unpacked = np.concatenate([lo, hi], axis=1)      # [E, K, N] int8
        w4 = jnp.asarray(q_unpacked, dtype=jnp.int4)
        print(f"int4 native storage: {w4.nbytes / 1e6:.0f} MB on device",
              flush=True)

        timeit("int4 kernel: native jnp.int4",
               make_step("native", w4, s), x0, rtt, wbytes)
    except Exception as e:  # noqa: BLE001
        print(f"variant native failed: {repr(e)[:240]}")

    # int8 method at the same logical shapes (2x weight bytes, no unpack).
    try:
        qw8, s8 = quant.quantize_int8_np(
            rng.standard_normal((E, K, N), dtype=np.float32) * 0.05, 128)
        qw8 = jnp.asarray(qw8)
        s8 = jnp.asarray(s8, jnp.bfloat16)

        timeit("int8 kernel (2x bytes)",
               make_step("default", qw8, s8, method="int8"), x0, rtt,
               qw8.nbytes + s8.nbytes)
    except Exception as e:  # noqa: BLE001
        print(f"int8 failed: {repr(e)[:200]}")

    # HBM floor: stream the weights once per iteration; scale by a
    # carry-derived factor so XLA can't hoist the reduction.
    @jax.jit
    def floor_step_inner(t, wq, ws):
        k = (t.astype(jnp.int32) & 1) + 1
        return t + (wq * k.astype(jnp.int8)).astype(jnp.float32).sum() \
            * 1e-12 + ws.astype(jnp.float32).sum() * 1e-12
    timeit("HBM floor (carry-dep sum)",
           lambda t: floor_step_inner(t, qw, s),
           jnp.float32(0.0), rtt, wbytes)


if __name__ == "__main__":
    main()
