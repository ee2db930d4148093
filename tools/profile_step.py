"""Decode-step component profile on the real chip.

Times isolated jits of each step component at the bench's decode shapes to
attribute device_step_ms (bench.py detail) to attention / MoE / dense /
sampling. Run: python tools/profile_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.registry import build_model
from lvllm_tpu.models.model_base import AttentionMetadata
from lvllm_tpu.ops.attention import ragged_paged_attention
from lvllm_tpu.ops.kv_cache import new_kv_cache, write_kv

REPS = 50


def timeit(name, fn, *args, donate=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = []
    for _ in range(REPS):
        outs.append(fn(*args))
    jax.block_until_ready(outs[-1])
    ms = (time.time() - t0) / REPS * 1000
    print(f"{name:<36} {ms:8.3f} ms")
    return ms


def main():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="bfloat16",
        vocab_size=32768, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=8, num_attention_heads=16, num_key_value_heads=4,
        head_dim=128, num_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=1024, max_position_embeddings=4096,
        max_model_len=2048, eos_token_id=-1)
    model = build_model(mc)
    params = model.init_params(0)
    params = jax.device_put(params)

    T, R = 16, 16
    NB, BS = 2048, 16
    maxb = mc.max_model_len // BS
    kv = [new_kv_cache(NB, BS, 4, 128, jnp.bfloat16) for _ in range(8)]
    md_args = dict(
        input_ids=jnp.asarray(np.arange(T) % mc.vocab_size, jnp.int32),
        positions=jnp.full((T,), 128, jnp.int32),
        qsl=jnp.asarray(np.arange(R + 1).clip(0, T), jnp.int32),
        seq_lens=jnp.full((R,), 129, jnp.int32),
        block_table=jnp.asarray(
            (np.arange(R * maxb).reshape(R, maxb) % 2000) + 1, jnp.int32),
        slot_mapping=jnp.asarray(np.arange(T) + 16, jnp.int32),
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((T, 1024)),
                    jnp.bfloat16)
    q = jnp.asarray(np.random.default_rng(1).standard_normal((T, 16, 128)),
                    jnp.bfloat16)
    k = q[:, :4]
    v = q[:, :4]

    # 1) attention op alone (one layer, decode shapes).
    attn = jax.jit(lambda q, kvc, bt, qsl, sl: ragged_paged_attention(
        q, kvc, bt, qsl, sl, scale=0.088))
    a_ms = timeit("attention (1 layer)", attn, q, kv[0],
                  md_args["block_table"], md_args["qsl"],
                  md_args["seq_lens"])

    # 2) write_kv alone.
    wkv = jax.jit(lambda kvc, k, v, s: write_kv(kvc, k, v, s))
    w_ms = timeit("write_kv (1 layer)", wkv, kv[1], k, v,
                  md_args["slot_mapping"])

    # 3) MoE FFN alone (one layer).
    from lvllm_tpu.layers.moe import MoEParams, fused_moe
    moe = params["layers"][0]["moe"]
    mp = MoEParams(router=moe["router"], w1=moe["w1"], w2=moe["w2"])
    moe_fn = jax.jit(lambda x: fused_moe(x, mp, 2, True, "softmax"))
    m_ms = timeit("moe ffn (1 layer)", moe_fn, x)

    # 4) qkv+o dense projections (1 layer).
    attn_p = params["layers"][0]["self_attn"]
    def dense_fn(x):
        qh = x @ attn_p["q_proj"]["kernel"]
        kh = x @ attn_p["k_proj"]["kernel"]
        vh = x @ attn_p["v_proj"]["kernel"]
        return (qh[:, :2048] + jnp.concatenate([kh, vh], -1).repeat(2, -1)
                ) @ attn_p["o_proj"]["kernel"]
    d_ms = timeit("qkvo dense (1 layer)", jax.jit(dense_fn), x)

    # 5) embed + logits + greedy sample.
    def tail_fn(ids):
        h = model.embed_tokens(params, ids)
        logits = model.compute_logits(params, h)
        return jnp.argmax(logits, -1)
    t_ms = timeit("embed+logits+argmax", jax.jit(tail_fn),
                  md_args["input_ids"])

    # 6) full model forward (no sampling).
    def fwd(params, kv):
        md = AttentionMetadata(query_start_loc=md_args["qsl"],
                               seq_lens=md_args["seq_lens"],
                               block_table=md_args["block_table"],
                               slot_mapping=md_args["slot_mapping"])
        h, kv = model(params, md_args["input_ids"], md_args["positions"],
                      kv, md)
        return h, kv
    fwd_j = jax.jit(fwd)
    h, kv2 = fwd_j(params, kv)
    jax.block_until_ready(h)
    t0 = time.time()
    for _ in range(REPS):
        h, kv2 = fwd_j(params, kv2)
    jax.block_until_ready(h)
    f_ms = (time.time() - t0) / REPS * 1000
    print(f"{'model fwd (8 layers, no sample)':<36} {f_ms:8.3f} ms")

    per_layer = a_ms + w_ms + m_ms + d_ms
    print(f"\nsum(1-layer parts) x 8 = {per_layer * 8:.2f} ms; "
          f"tail = {t_ms:.2f} ms")


if __name__ == "__main__":
    main()
