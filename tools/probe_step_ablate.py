"""Ablation probe: where does the decode step's device time go?

Times the real runner step at bench shapes while varying: KV pool size
(donation/aliasing check), MoE vs dense FFN, and lm_head size.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.entrypoints.llm import LLM
from lvllm_tpu.sampling_params import SamplingParams

REPS = 30


def step_ms(runner, mc, prompt_len=128):
    R = runner.max_num_reqs
    T = 16
    maxb = runner.max_blocks_per_req
    nb = runner.num_kv_blocks
    args = dict(
        input_ids=jnp.asarray(np.arange(T) % mc.vocab_size, jnp.int32),
        positions=jnp.full((T,), prompt_len, jnp.int32),
        qsl=jnp.asarray(np.arange(R + 1).clip(0, T), jnp.int32),
        seq_lens=jnp.full((R,), prompt_len + 1, jnp.int32),
        block_table=jnp.asarray(
            (np.arange(R * maxb).reshape(R, maxb) % (nb - 2)) + 1,
            jnp.int32),
        slot_mapping=jnp.asarray(np.arange(T) + 16, jnp.int32),
        logits_indices=jnp.asarray(
            np.arange(R).clip(0, T - 1)[:, None], jnp.int32),
        temperature=jnp.zeros((R,), jnp.float32),
        top_k=jnp.zeros((R,), jnp.int32),
        top_p=jnp.ones((R,), jnp.float32),
        min_p=jnp.zeros((R,), jnp.float32),
        seeds=jnp.zeros((R,), jnp.uint32),
        steps=jnp.zeros((R,), jnp.int32),
    )
    kv = runner.kv_caches
    kv, s0, _t, _h = runner._step_fn(runner.params, kv, *args.values(),
                                     greedy_only=True)
    s0.block_until_ready()
    t0 = time.time()
    for _ in range(REPS):
        kv, s0, _t, _h = runner._step_fn(runner.params, kv, *args.values(),
                                         greedy_only=True)
    s0.block_until_ready()
    runner.kv_caches = kv
    return (time.time() - t0) / REPS * 1000


def build(nb, vocab=32768, moe=True, layers=8):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="bfloat16",
        vocab_size=vocab, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=layers, num_attention_heads=16,
        num_key_value_heads=4, head_dim=128,
        num_experts=8 if moe else 0, num_experts_per_tok=2,
        moe_intermediate_size=1024, max_position_embeddings=4096,
        max_model_len=2048, eos_token_id=-1)
    llm = LLM(model_config=mc, load_format="dummy", max_num_seqs=16,
              max_num_batched_tokens=2048, block_size=16, num_kv_blocks=nb)
    return llm.engine.core.runner, mc


def main():
    for name, kw in [
        ("baseline nb=2048", dict(nb=2048)),
        ("small kv  nb=256", dict(nb=256)),
        ("dense ffn nb=2048", dict(nb=2048, moe=False)),
        ("vocab 8k  nb=2048", dict(nb=2048, vocab=8192)),
        ("2 layers  nb=2048", dict(nb=2048, layers=2)),
    ]:
        runner, mc = build(**kw)
        ms = step_ms(runner, mc)
        print(f"{name:<20} {ms:7.3f} ms")
        del runner


if __name__ == "__main__":
    main()
