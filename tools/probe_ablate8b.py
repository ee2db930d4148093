"""Ablation at the 8B-A3B int4 bench geometry: vary layer count, expert
count and vocab to attribute the 18 ms decode step by slope (isolated
component timing over-counts pipeline-drain; see profile_step8b.py).

Run: python tools/probe_ablate8b.py
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

REPS = 24

_probe = jax.jit(lambda x: jnp.ravel(x)[0].astype(jnp.float32))


def build(layers=24, experts=64, vocab=151936, quant="int4"):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="bfloat16",
        vocab_size=vocab, hidden_size=2048, intermediate_size=6144,
        num_hidden_layers=layers, num_attention_heads=16,
        num_key_value_heads=4, head_dim=128, num_experts=experts,
        num_experts_per_tok=8, moe_intermediate_size=768,
        max_position_embeddings=8192, max_model_len=2048,
        eos_token_id=-1, quantization=quant)
    llm = LLM(model_config=mc, load_format="dummy_device",
              max_num_seqs=16, max_num_batched_tokens=2048, block_size=16,
              num_kv_blocks=2048, multi_step_decode=1)
    return llm.engine.core.runner, mc


def step_ms(runner, mc, prompt_len=128):
    R = runner.max_num_reqs
    maxb = runner.max_blocks_per_req
    qsl = jnp.asarray(np.arange(R + 1), jnp.int32)
    a = (jnp.ones(R, jnp.int32), jnp.full(R, prompt_len, jnp.int32),
         jnp.full(R, prompt_len + 1, jnp.int32),
         jnp.asarray(((np.arange(R * maxb).reshape(R, maxb) % 2000) + 1)
                     .astype(np.int32)),
         jnp.asarray(np.arange(R) + 16, jnp.int32),
         jnp.asarray(np.arange(R)[:, None], jnp.int32),
         jnp.zeros(R, jnp.float32), jnp.zeros(R, jnp.int32),
         jnp.ones(R, jnp.float32), jnp.zeros(R, jnp.float32),
         jnp.zeros(R, jnp.uint32), jnp.zeros(R, jnp.int32))
    kv = runner.kv_caches

    def step(kv):
        kv, packed, _t, _h = runner._step_fn(
            runner.params, kv, a[0], a[1], qsl, a[2], a[3], a[4], a[5],
            a[6], a[7], a[8], a[9], a[10], a[11], greedy_only=True)
        return kv, packed

    kv, p = step(kv)
    float(_probe(p))
    t0 = time.time()
    for _ in range(REPS):
        kv, p = step(kv)
    float(_probe(p))
    runner.kv_caches = kv
    return (time.time() - t0) / REPS * 1000


def main():
    results = {}
    for name, kw in [
        ("baseline 24L 64e v152k int4", {}),
        ("12 layers", dict(layers=12)),
        ("32 experts", dict(experts=32)),
        ("vocab 32k", dict(vocab=32768)),
    ]:
        t0 = time.time()
        runner, mc = build(**kw)
        load_s = time.time() - t0
        ms = step_ms(runner, mc)
        results[name] = ms
        print(f"{name:<30} {ms:7.3f} ms   (load {load_s:.0f}s)",
              flush=True)
        del runner

    b = results.get("baseline 24L 64e v152k int4")
    if b and "12 layers" in results:
        per_layer = (b - results["12 layers"]) / 12
        fixed = b - 24 * per_layer
        print(f"\nper-layer {per_layer:.3f} ms; fixed {fixed:.3f} ms",
              flush=True)
    if b and "32 experts" in results:
        print(f"expert-bytes share/layer: "
              f"{(b - results['32 experts']) / 24:.3f} ms", flush=True)
    if b and "vocab 32k" in results:
        print(f"lm_head+embed delta: {b - results['vocab 32k']:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
