"""Probe: fused whole-FFN kernel, weight-only vs activation-quant (int8
MXU), at the 8B bench geometry, decode and prefill tiles.

python tools/probe_ffn_a8.py
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

from lvllm_tpu.ops import moe_align, quant
from lvllm_tpu.ops.pallas import quant_gemm

E, H, I = 64, 2048, 768
TOPK = 8
ITERS = 64

_probe = jax.jit(lambda x: x.ravel()[0].astype(jnp.float32))


def measure_rtt(x) -> float:
    float(_probe(x))
    t0 = time.time()
    float(_probe(x))
    return time.time() - t0


def bench(label, T, tile_m, wmethod, act_quant, weights):
    w1t, s1t, w2t, s2t = weights
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.bfloat16)
    topk = jnp.asarray(rng.integers(0, E, (T, TOPK)), jnp.int32)
    d = moe_align.align_tokens(x, topk, E, tile_m)

    @jax.jit
    def run(xa, be, w1t, s1t, w2t, s2t):
        def body(i, xa):
            y = quant_gemm.grouped_quant_ffn_tiled(
                xa, w1t, s1t, w2t, s2t, be, method=wmethod,
                tile_m=tile_m, act_quant=act_quant)
            return jnp.where(y[0, 0].astype(jnp.float32) == 12345.6789,
                             xa + 1, xa).astype(xa.dtype)
        return jax.lax.fori_loop(0, ITERS, body, xa)

    r = run(d.x_aligned, d.block_expert, w1t, s1t, w2t, s2t)
    float(_probe(r))
    rtt = measure_rtt(r)
    t0 = time.time()
    r = run(d.x_aligned, d.block_expert, w1t, s1t, w2t, s2t)
    float(_probe(r))
    ms = (time.time() - t0 - rtt) / ITERS * 1000
    wbytes = (w1t.size + w2t.size) * w1t.dtype.itemsize
    flops = 2 * T * TOPK * (H * 2 * I + I * H)
    print(f"{label:<34} {ms:8.3f} ms  "
          f"({wbytes / ms / 1e6:6.0f} GB/s wt, {flops / ms / 1e9:7.1f} GF/ms->TF/s)",
          flush=True)
    return ms


def main():
    print(f"backend={jax.default_backend()}  E={E} H={H} I={I} top{TOPK}")
    rng = np.random.default_rng(0)
    for wmethod in ("int4", "int8"):
        qfn = (quant.quantize_int4_np if wmethod == "int4"
               else quant.quantize_int8_np)
        w1, s1 = qfn(rng.standard_normal((E, H, 2 * I)).astype(np.float32) * 0.05, 128)
        w2, s2 = qfn(rng.standard_normal((E, I, H)).astype(np.float32) * 0.05, 128)
        w1t, s1t = quant.tile_quant_layout_np(w1, s1)
        w2t, s2t = quant.tile_quant_layout_np(w2, s2)
        weights = (jnp.asarray(w1t), jnp.asarray(s1t, jnp.float32),
                   jnp.asarray(w2t), jnp.asarray(s2t, jnp.float32))
        for (T, tile_m, tag) in ((16, 8, "decode b16"), (2048, 128, "prefill 2k")):
            for aq in (False, True):
                bench(f"{wmethod} {tag} act_quant={aq}", T, tile_m,
                      wmethod, aq, weights)


if __name__ == "__main__":
    main()
