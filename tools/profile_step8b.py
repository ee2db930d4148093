"""Decode-step attribution at the 8B-A3B int4 bench geometry, on-chip.

Times the full single-step fn and isolated components (quantized MoE FFN,
attention op, dense projections, lm_head+sample) to attribute the
hbm_bw_util gap. Weights come up via dummy_device init (no host upload).
Run: python tools/profile_step8b.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 16

_probe = jax.jit(lambda x: jnp.ravel(x)[0].astype(jnp.float32))


def timeit(name, fn, *args, chain=None):
    out = fn(*args)
    float(_probe(out if not isinstance(out, tuple) else out[0]))
    t0 = time.time()
    last = None
    for _ in range(REPS):
        last = fn(*args)
    float(_probe(last if not isinstance(last, tuple) else last[0]))
    ms = (time.time() - t0) / REPS * 1000
    print(f"{name:<44} {ms:8.3f} ms", flush=True)
    return ms


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as bench_mod

    from lvllm_tpu.entrypoints.llm import LLM

    mc = bench_mod._model_config("int4")
    llm = LLM(model_config=mc, load_format="dummy_device",
              max_num_seqs=16, max_num_batched_tokens=2048, block_size=16,
              num_kv_blocks=2048, multi_step_decode=1)
    runner = llm.engine.core.runner
    model = llm.engine.core.model
    params = runner.params
    print("[profile] model up", flush=True)

    R = runner.max_num_reqs
    maxb = runner.max_blocks_per_req
    prompt_len = 128
    dev_args = (
        jnp.ones(R, jnp.int32),
        jnp.full(R, prompt_len, jnp.int32),
        jnp.full(R, prompt_len + 1, jnp.int32),
        jnp.asarray(((np.arange(R * maxb).reshape(R, maxb) % 2000) + 1)
                    .astype(np.int32)),
        jnp.asarray(np.arange(R) + 16, jnp.int32),
        jnp.asarray(np.arange(R)[:, None], jnp.int32),
        jnp.zeros(R, jnp.float32), jnp.zeros(R, jnp.int32),
        jnp.ones(R, jnp.float32), jnp.zeros(R, jnp.float32),
        jnp.zeros(R, jnp.uint32), jnp.zeros(R, jnp.int32))
    qsl = jnp.asarray(np.arange(R + 1), jnp.int32)

    # Full single step (no donation chaining issues: pass kv fresh).
    kv = runner.kv_caches

    def full_step(kv):
        kv, packed, _tk, _h = runner._step_fn(
            params, kv, dev_args[0], dev_args[1], qsl, dev_args[2],
            dev_args[3], dev_args[4], dev_args[5], dev_args[6],
            dev_args[7], dev_args[8], dev_args[9], dev_args[10],
            dev_args[11], greedy_only=True)
        return kv, packed

    kv, p0 = full_step(kv)
    float(_probe(p0))
    t0 = time.time()
    for _ in range(REPS):
        kv, p0 = full_step(kv)
    float(_probe(p0))
    full_ms = (time.time() - t0) / REPS * 1000
    runner.kv_caches = kv
    print(f"{'full decode step (single)':<44} {full_ms:8.3f} ms",
          flush=True)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (R, mc.hidden_size)), jnp.bfloat16)
    SCAN_N = 32

    def scan_time(name, body, weights):
        """Time SCAN_N chained body() iterations in ONE device dispatch —
        immune to per-call host RTT (the isolated-jit numbers were ~2 ms
        of tunnel dispatch each). ``weights`` ride as jit args so the
        remote-compile payload stays small (closures 413 past ~100 MB)."""
        @jax.jit
        def run(x0, weights):
            def it(i, acc):
                y = body(acc, weights)
                return acc + y.reshape(acc.shape[0], -1)[
                    :, :acc.shape[1]].astype(acc.dtype) * 1e-6
            return jax.lax.fori_loop(0, SCAN_N, it, x0)
        out = run(x, weights)
        float(_probe(out))
        t0 = time.time()
        out = run(x, weights)
        float(_probe(out))
        ms = (time.time() - t0) / SCAN_N * 1000
        print(f"{name:<44} {ms:8.3f} ms/iter", flush=True)
        return ms

    # Quantized MoE FFN, one layer.
    moe = params["layers"][0]["moe"]
    from lvllm_tpu.layers.moe import QuantMoEParams, fused_moe_quant
    qp = QuantMoEParams(router=moe["router"], w1_q=moe["w1_q"],
                        w1_scales=moe["w1_scales"], w2_q=moe["w2_q"],
                        w2_scales=moe["w2_scales"], method="int4",
                        group_size=128)
    moe_arrays = {"router": moe["router"], "w1_q": moe["w1_q"],
                  "w1_scales": moe["w1_scales"], "w2_q": moe["w2_q"],
                  "w2_scales": moe["w2_scales"]}

    def moe_body(h, w):
        return fused_moe_quant(
            h, QuantMoEParams(router=w["router"], w1_q=w["w1_q"],
                              w1_scales=w["w1_scales"], w2_q=w["w2_q"],
                              w2_scales=w["w2_scales"], method="int4",
                              group_size=128),
            mc.num_experts_per_tok, True, "softmax")
    m_ms = scan_time("moe ffn int4 (1 layer, scan)", moe_body, moe_arrays)

    # Attention op, one layer (decode shapes), q derived from carry.
    from lvllm_tpu.ops.attention import ragged_paged_attention
    kvc = runner.kv_caches[0]
    Hq, Dh = mc.num_attention_heads, mc.head_dim

    def attn_body(h, kvc):
        q = h[:, :Hq * Dh].reshape(R, Hq, Dh)
        return ragged_paged_attention(q, kvc, dev_args[3], qsl,
                                      dev_args[2], scale=0.088
                                      ).reshape(R, Hq * Dh)
    a_ms = scan_time("attention (1 layer, scan)", attn_body, kvc)

    # Dense projections, one layer.
    ap = params["layers"][0]["self_attn"]

    def dense_body(h, ap):
        qh = h @ ap["q_proj"]["kernel"]
        kh = h @ ap["k_proj"]["kernel"]
        vh = h @ ap["v_proj"]["kernel"]
        cat = jnp.concatenate(
            [kh, vh, jnp.zeros((R, qh.shape[-1] - 2 * kh.shape[-1]),
                               qh.dtype)], -1)
        return (qh + cat) @ ap["o_proj"]["kernel"]
    d_ms = scan_time("qkvo dense (1 layer, scan)", dense_body, ap)

    # Dense gated MLP when present; else the router matmul alone.
    tail_w = {"embed": params["embed"],
              "lm_head": params.get("lm_head"), "norm": params["norm"]}

    def tail_body(h, w):
        ids = jnp.argmax(h[:, :8], -1).astype(jnp.int32)
        e = model.embed_tokens({"embed": w["embed"]}, ids)
        logits = model.compute_logits(
            {**{"embed": w["embed"], "norm": w["norm"]},
             **({"lm_head": w["lm_head"]} if w["lm_head"] is not None
                else {})}, e)
        return jnp.argmax(logits, -1)[:, None].astype(
            jnp.bfloat16) * jnp.ones((R, mc.hidden_size), jnp.bfloat16)
    t_ms = scan_time("embed+logits+argmax (scan)", tail_body, tail_w)

    L = mc.num_hidden_layers
    print(f"\nsum parts: {L}*(moe {m_ms:.3f} + attn {a_ms:.3f} + dense "
          f"{d_ms:.3f}) + tail {t_ms:.3f} = "
          f"{L * (m_ms + a_ms + d_ms) + t_ms:.2f} ms vs full "
          f"{full_ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
