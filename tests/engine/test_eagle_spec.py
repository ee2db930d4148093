"""EAGLE speculative decoding.

Same losslessness strategy as the reference's EAGLE tests
(tests/v1/spec_decode: exact-match verification keeps greedy outputs
identical regardless of head quality) — a random-weight EAGLE head must
never change outputs, only acceptance/steps.
"""

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def _model_config(tie=False):
    return ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="bfloat16",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, max_model_len=128,
        eos_token_id=-1, tie_word_embeddings=tie)


def _engine(spec=None, tie=False):
    cfg = EngineConfig(
        model_config=_model_config(tie),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
        speculative_config=spec or SpeculativeConfig(),
    )
    return LLMEngine(cfg, load_format="dummy")


def _run(engine, prompts, max_tokens=16):
    for rid, p in enumerate(prompts):
        engine.add_request(f"r{rid}", p,
                           SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens))
    outs, steps = [], 0
    while engine.has_unfinished_requests() and steps < 200:
        outs.extend(o for o in engine.step() if o.finished)
        steps += 1
    return {o.request_id: o.outputs[0].token_ids for o in outs}, steps


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7], list(range(10, 30))]


def test_eagle_lossless_vs_baseline():
    base, _ = _run(_engine(), PROMPTS)
    spec = SpeculativeConfig(method="eagle", num_speculative_tokens=3)
    got, _ = _run(_engine(spec), PROMPTS)
    assert got == base


def test_eagle_tied_embeddings():
    base, _ = _run(_engine(tie=True), PROMPTS, max_tokens=8)
    spec = SpeculativeConfig(method="eagle", num_speculative_tokens=2)
    got, _ = _run(_engine(spec, tie=True), PROMPTS, max_tokens=8)
    assert got == base


def test_eagle3_lossless_vs_baseline():
    base, _ = _run(_engine(), PROMPTS)
    spec = SpeculativeConfig(method="eagle3", num_speculative_tokens=3)
    got, _ = _run(_engine(spec), PROMPTS)
    assert got == base


def test_eagle3_uses_multi_level_features():
    spec = SpeculativeConfig(method="eagle3", num_speculative_tokens=2)
    eng = _engine(spec)
    prop = eng.core.runner.eagle_proposer
    assert prop.mode == "eagle3"
    assert len(prop.aux_layers) >= 1
    assert "fc3" in prop.params
    _run(eng, PROMPTS, max_tokens=6)  # must execute the fused path


def test_eagle_state_freed_on_finish():
    spec = SpeculativeConfig(method="eagle", num_speculative_tokens=2)
    eng = _engine(spec)
    _run(eng, PROMPTS, max_tokens=4)
    proposer = eng.core.runner.eagle_proposer
    assert proposer._reqs == {}
    assert len(proposer._free_blocks) == 511


def test_eagle_proposes_drafts():
    """The head must actually produce drafts (spec_token_ids flow)."""
    spec = SpeculativeConfig(method="eagle", num_speculative_tokens=3)
    eng = _engine(spec)
    eng.add_request("r0", [1, 2, 3, 4, 5],
                    SamplingParams(temperature=0.0, max_tokens=8))
    saw_drafts = False
    steps = 0
    while eng.has_unfinished_requests() and steps < 50:
        eng.step()
        sched = eng.core.scheduler
        for req in sched.running:
            if req.spec_token_ids:
                saw_drafts = True
        steps += 1
    assert saw_drafts


def test_draft_arch_autodetect(tmp_path):
    """SpeculativeConfig(method='auto', draft_model=<eagle checkpoint>)
    resolves the proposer from the checkpoint's architecture name
    (reference: _SPECULATIVE_DECODING_MODELS registry entries)."""
    import json

    from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig, SpeculativeConfig)
    from lvllm_tpu.engine.llm_engine import LLMEngine
    from lvllm_tpu.models.registry import get_model_class
    from lvllm_tpu.spec_decode.draft_archs import (DRAFT_ARCH_METHOD,
                                                   DraftHeadModel)

    for arch in DRAFT_ARCH_METHOD:
        assert get_model_class(arch) is DraftHeadModel
    (tmp_path / "config.json").write_text(json.dumps(
        {"architectures": ["Eagle3LlamaForCausalLM"]}))
    import numpy as np
    from safetensors.numpy import save_file
    save_file({"norm.weight": np.ones((64,), np.float32)},
              str(tmp_path / "model.safetensors"))
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, max_model_len=64, eos_token_id=-1)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=16),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2, max_model_len=64),
        speculative_config=SpeculativeConfig(
            method="auto", draft_model=str(tmp_path),
            num_speculative_tokens=2))
    eng = LLMEngine(cfg, load_format="dummy")
    assert cfg.speculative_config.method == "eagle3"
    assert eng.core.runner.eagle_proposer is not None
