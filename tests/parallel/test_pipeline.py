"""Pipeline parallelism: staged forward == fused single-device forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.model_base import AttentionMetadata
from lvllm_tpu.models.registry import build_model
from lvllm_tpu.ops.kv_cache import new_kv_cache
from lvllm_tpu.parallel.pipeline import (PipelineRunner, partition_layers,
                                         split_microbatches)


def test_partition_layers():
    assert [list(r) for r in partition_layers(6, 2)] == [[0, 1, 2],
                                                         [3, 4, 5]]
    assert [list(r) for r in partition_layers(7, 3)] == [[0, 1, 2], [3, 4],
                                                         [5, 6]]
    assert [len(r) for r in partition_layers(2, 4)] == [1, 1, 0, 0]


def _setup(num_layers=4):
    cfg = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="bfloat16",
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=num_layers, num_attention_heads=2,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
        max_model_len=64, eos_token_id=-1)
    model = build_model(cfg)
    params = model.init_params(0)
    kv = [new_kv_cache(8, 16, 2, 16, jnp.bfloat16)
          for _ in range(num_layers)]
    # 3 ragged requests, 20 real tokens.
    qsl = jnp.asarray([0, 8, 9, 20], jnp.int32)
    seq_lens = jnp.asarray([8, 5, 11], jnp.int32)
    block_table = jnp.asarray([[1, 0], [2, 0], [3, 4]], jnp.int32)
    slots = []
    for r, (start, ctx) in enumerate(zip([0, 8, 9], [8, 1, 11])):
        n = int(qsl[r + 1] - qsl[r])
        base = int(seq_lens[r]) - n
        for i in range(n):
            p = base + i
            slots.append(int(block_table[r, p // 16]) * 16 + p % 16)
    md = AttentionMetadata(
        query_start_loc=qsl, seq_lens=seq_lens, block_table=block_table,
        slot_mapping=jnp.asarray(slots, jnp.int32))
    ids = jnp.arange(20, dtype=jnp.int32) % 64
    positions = jnp.concatenate([
        jnp.arange(8), jnp.asarray([4]), jnp.arange(11)]).astype(jnp.int32)
    return model, params, kv, ids, positions, md


def test_split_microbatches_request_aligned():
    model, params, kv, ids, positions, md = _setup()
    mbs = split_microbatches(md, 20, 2)
    assert len(mbs) == 2
    (s0, m0), (s1, m1) = mbs
    assert (s0.start, s0.stop) == (0, 9)      # requests 0-1
    assert (s1.start, s1.stop) == (9, 20)     # request 2
    assert int(m1.query_start_loc[0]) == 0
    assert m1.block_table.shape[0] == 1


@pytest.mark.parametrize("pp,mbs", [(2, 1), (2, 2), (4, 2), (4, 3)])
def test_pipeline_matches_fused(pp, mbs):
    model, params, kv, ids, positions, md = _setup()
    hidden, kv_ref = model(params, ids, positions,
                           [k.copy() for k in kv], md)
    ref_logits = model.compute_logits(params, hidden)

    devices = jax.devices()[:pp]
    runner = PipelineRunner(model, params, [k.copy() for k in kv],
                            devices, num_microbatches=mbs)
    logits, kv_pp = runner.forward(ids, positions, md)

    np.testing.assert_allclose(np.asarray(logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               atol=2e-2, rtol=2e-2)
    # bf16 low-bit rounding differs between the jitted stages and the
    # eager fused reference (XLA fusion reorders the adds).
    for a, b in zip(kv_pp, kv_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-2, rtol=2e-2)
