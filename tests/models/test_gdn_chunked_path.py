"""Qwen3-Next chunk-parallel GDN path == ragged scan path.

The runner flips AttentionMetadata.single_seq_prefill (static) for
one-segment long-prefill batches; both paths must produce the same
hidden states and recurrent state.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.models.model_base import AttentionMetadata
from lvllm_tpu.models.registry import build_model
from lvllm_tpu.sampling_params import SamplingParams


def _config():
    return ModelConfig(
        model="dummy", architecture="Qwen3NextForCausalLM", dtype="bfloat16",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
        layer_types=("linear_attention", "full_attention"),
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        max_position_embeddings=512, max_model_len=256, eos_token_id=-1)


def test_model_level_paths_agree():
    cfg = _config()
    model = build_model(cfg)
    params = model.init_params(0)
    T, L = 128, 100  # bucket 128, real tokens 100
    caches = [model.make_layer_cache(i, 16, 16, jnp.bfloat16, max_reqs=2)
              for i in range(cfg.num_hidden_layers)]
    ids = jnp.arange(T, dtype=jnp.int32) % cfg.vocab_size
    positions = jnp.where(jnp.arange(T) < L, jnp.arange(T), 0).astype(
        jnp.int32)
    bt = jnp.asarray([[1, 2, 3, 4, 5, 6, 7]], jnp.int32)
    slots = jnp.where(jnp.arange(T) < L,
                      16 + jnp.arange(T), 0).astype(jnp.int32)
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, L], jnp.int32),
        seq_lens=jnp.asarray([L], jnp.int32),
        block_table=bt, slot_mapping=slots,
        row_slots=jnp.asarray([0], jnp.int32))
    md_fast = dataclasses.replace(md, single_seq_prefill=True)

    h_ref, c_ref = model(params, ids, positions,
                         [c.copy() if not isinstance(c, dict)
                          else {k: v.copy() for k, v in c.items()}
                          for c in caches], md)
    h_fast, c_fast = model(params, ids, positions, caches, md_fast)

    np.testing.assert_allclose(
        np.asarray(h_fast[:L], np.float32), np.asarray(h_ref[:L],
                                                       np.float32),
        atol=3e-2, rtol=3e-2)
    # Recurrent + conv state of the GDN layer must agree at slot 0.
    ref_gdn, fast_gdn = c_ref[0], c_fast[0]
    np.testing.assert_allclose(np.asarray(fast_gdn["rec"][0]),
                               np.asarray(ref_gdn["rec"][0]),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(fast_gdn["conv"][0]),
                               np.asarray(ref_gdn["conv"][0]),
                               atol=2e-2, rtol=2e-2)


def test_engine_outputs_invariant_to_prefill_chunking():
    """Long-prompt engine run (single-seq chunked path) == small-chunk run
    (ragged scan path)."""
    prompt = list(np.random.default_rng(0).integers(1, 127, size=100))

    def run(max_batched):
        cfg = EngineConfig(
            model_config=_config(),
            cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=max_batched, max_num_seqs=2,
                max_model_len=256),
        )
        eng = LLMEngine(cfg, load_format="dummy")
        eng.add_request("r0", prompt,
                        SamplingParams(temperature=0.0, max_tokens=8))
        outs, steps = [], 0
        while eng.has_unfinished_requests() and steps < 40:
            outs.extend(o for o in eng.step() if o.finished)
            steps += 1
        return outs[0].outputs[0].token_ids

    fast = run(128)   # whole prompt in one chunk → chunked GDN path
    slow = run(48)    # sub-64 chunks → ragged scan path
    assert fast == slow
