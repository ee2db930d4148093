"""EPLB live reshuffle: permuting expert placement mid-serve is a no-op
for outputs (router columns permuted with the weights) and improves the
balance ratio for skewed loads."""

import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def _engine(quant=None):
    cfg = EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3MoeForCausalLM",
            dtype="bfloat16", vocab_size=128, hidden_size=128,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=2, head_dim=64,
            num_experts=8, num_experts_per_tok=2,
            moe_intermediate_size=128,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1, quantization=quant),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
    )
    return LLMEngine(cfg, load_format="dummy")


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7, 6]]
SKEWED = np.asarray([100.0, 1, 1, 1, 50, 1, 1, 1])


def _drive(engine, rebalance_at=None, loads=None, max_tokens=12,
           rounds=1):
    for rid, p in enumerate(PROMPTS):
        engine.add_request(f"r{rid}", p,
                           SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens))
    outs, steps = [], 0
    while engine.has_unfinished_requests() and steps < 60:
        if rebalance_at is not None and steps and \
                steps % rebalance_at == 0 and rounds > 0:
            engine.core.rebalance_experts(loads)
            rounds -= 1
        outs.extend(o for o in engine.step() if o.finished)
        steps += 1
    return {o.request_id: o.outputs[0].token_ids for o in outs}


@pytest.mark.parametrize("quant", [None, "int8"])
def test_rebalance_preserves_outputs(quant):
    base = _drive(_engine(quant))
    got = _drive(_engine(quant), rebalance_at=3, loads=SKEWED)
    assert got == base


def test_double_rebalance_composes():
    """Two successive rebalances (different loads) still produce baseline
    outputs — the relative permutation composition is correct."""
    eng = _engine()
    base = _drive(_engine())
    for rid, p in enumerate(PROMPTS):
        eng.add_request(f"r{rid}", p,
                        SamplingParams(temperature=0.0, max_tokens=12))
    outs, steps = [], 0
    while eng.has_unfinished_requests() and steps < 60:
        if steps == 2:
            eng.core.rebalance_experts(SKEWED)
        if steps == 5:
            eng.core.rebalance_experts(SKEWED[::-1].copy())
        outs.extend(o for o in eng.step() if o.finished)
        steps += 1
    got = {o.request_id: o.outputs[0].token_ids for o in outs}
    assert got == base


def test_balance_improves_for_skew():
    eng = _engine()
    report = eng.core.rebalance_experts(SKEWED)
    # ep=1: trivially balanced; verify the report shape then check math
    # directly at ep=4 via the algorithm.
    assert set(report) == {0, 1}
    from lvllm_tpu.parallel.eplb import (EplbConfig, balance_ratio,
                                         rebalance_experts)
    cfg = EplbConfig(8, 8, 4)
    # Two hot experts adjacent: identity puts both on rank 0; LPT splits.
    loads = np.asarray([100.0, 90, 1, 1, 1, 1, 1, 1])
    naive = balance_ratio(loads, np.arange(8), 4)
    packed = balance_ratio(loads, rebalance_experts(loads, cfg), 4)
    assert packed > naive


def test_async_rebalance_preserves_outputs():
    """schedule_rebalance applies one layer per step across steps; outputs
    stay identical (reference: eplb/async_worker.py overlapped shuffle)."""
    base = _drive(_engine())
    eng = _engine()
    for rid, p in enumerate(PROMPTS):
        eng.add_request(f"r{rid}", p,
                        SamplingParams(temperature=0.0, max_tokens=12))
    outs, steps = [], 0
    scheduled = False
    while eng.has_unfinished_requests() and steps < 60:
        if steps == 3 and not scheduled:
            n = eng.core.schedule_rebalance(SKEWED, layers_per_step=1)
            assert n == 2                    # one permutation per MoE layer
            scheduled = True
        outs.extend(o for o in eng.step() if o.finished)
        steps += 1
    assert not eng.core._eplb_pending       # fully drained
    assert len(eng.core._eplb_report) == 2
    got = {o.request_id: o.outputs[0].token_ids for o in outs}
    assert got == base
