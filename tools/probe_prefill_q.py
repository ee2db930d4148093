"""Prefill step at the 8B bench geometry: int4 vs w4a8 after the glue
rework (align row-gather + combine mul-sum). Mirrors bench.py leg 2b.

python tools/probe_prefill_q.py [int4 w4a8 ...]
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

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.entrypoints.llm import LLM

_probe = jax.jit(lambda x: jnp.ravel(x)[0].astype(jnp.float32))


def run(quant):
    batch, prompt_len = 16, 128
    bs = int(os.environ.get("PROBE_BLOCK_SIZE", "16"))
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="bfloat16",
        vocab_size=151936, hidden_size=2048, intermediate_size=6144,
        num_hidden_layers=int(os.environ.get("PROBE_LAYERS", "24")), num_attention_heads=16,
        num_key_value_heads=4, head_dim=128, num_experts=64,
        num_experts_per_tok=8, moe_intermediate_size=768,
        max_position_embeddings=8192, max_model_len=2048,
        eos_token_id=-1, quantization=quant)
    llm = LLM(model_config=mc, load_format="dummy_device",
              max_num_seqs=batch, max_num_batched_tokens=2048, block_size=bs,
              num_kv_blocks=2048 * 16 // bs, multi_step_decode=1)
    runner = llm.engine.core.runner
    R = runner.max_num_reqs
    maxb = runner.max_blocks_per_req
    Tp = batch * prompt_len
    qsl_p = np.arange(R + 1) * prompt_len
    tok_pos = np.tile(np.arange(prompt_len), batch)
    block_table = ((np.arange(R * maxb).reshape(R, maxb) % (2048 * 16 // bs - 48)) + 1
                   ).astype(np.int32)
    slot_p = (block_table[np.repeat(np.arange(R), prompt_len),
                          tok_pos // bs] * bs + tok_pos % bs)
    rng = np.random.default_rng(0)
    pargs = dict(
        input_ids=jnp.asarray(rng.integers(1, mc.vocab_size, Tp), jnp.int32),
        positions=jnp.asarray(tok_pos, jnp.int32),
        qsl=jnp.asarray(qsl_p, jnp.int32),
        seq_lens=jnp.full((R,), prompt_len, jnp.int32),
        block_table=jnp.asarray(block_table, jnp.int32),
        slot_mapping=jnp.asarray(slot_p, jnp.int32),
        logits_indices=jnp.asarray(
            (qsl_p[1:] - 1).clip(0, Tp - 1)[:, None], jnp.int32),
        temperature=jnp.zeros((R,), jnp.float32),
        top_k=jnp.zeros((R,), jnp.int32),
        top_p=jnp.ones((R,), jnp.float32),
        min_p=jnp.zeros((R,), jnp.float32),
        seeds=jnp.zeros((R,), jnp.uint32),
        steps=jnp.zeros((R,), jnp.int32),
    )
    kv = runner.kv_caches
    kv, s1, _tk, _ = runner._step_fn(runner.params, kv, *pargs.values(),
                                     greedy_only=True)
    float(_probe(s1))
    n = 8
    t0 = time.time()
    for _ in range(n):
        kv, s1, _tk, _ = runner._step_fn(runner.params, kv, *pargs.values(),
                                         greedy_only=True)
    float(_probe(s1))
    ms = (time.time() - t0) / n * 1000
    print(f"{quant:<6} prefill step {ms:8.2f} ms  "
          f"{Tp / ms * 1000:9.0f} tok/s", flush=True)


if __name__ == "__main__":
    for q in (sys.argv[1:] or ["int4", "w4a8"]):
        run(q)
