"""End-to-end engine tests with a dummy-weight tiny model.

Strategy mirrors the reference's load_format="dummy" engine tests
(SURVEY.md §4: tests avoid real checkpoints with dummy weights).
"""

import numpy as np
import pytest

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.entrypoints.llm import LLM
from lvllm_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def tiny_llm():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        max_position_embeddings=512, max_model_len=256, eos_token_id=-1)
    return LLM(model_config=mc, load_format="dummy", max_num_seqs=8,
               max_num_batched_tokens=128, block_size=16, num_kv_blocks=128)


def test_greedy_generate(tiny_llm):
    outs = tiny_llm.generate([[1, 2, 3, 4, 5]],
                             SamplingParams(temperature=0.0, max_tokens=8))
    assert len(outs) == 1
    out = outs[0]
    assert out.finished
    assert out.outputs[0].finish_reason == "length"
    assert len(out.outputs[0].token_ids) == 8
    assert all(0 <= t < 128 for t in out.outputs[0].token_ids)


def test_greedy_deterministic(tiny_llm):
    p = list(range(1, 20))
    a = tiny_llm.generate([p], SamplingParams(temperature=0.0, max_tokens=6))
    b = tiny_llm.generate([p], SamplingParams(temperature=0.0, max_tokens=6))
    assert a[0].outputs[0].token_ids == b[0].outputs[0].token_ids


def test_batch_generate_matches_single(tiny_llm):
    """Batch-invariance: running prompts together must equal running them
    alone (reference: tests/v1/determinism/test_online_batch_invariance)."""
    prompts = [[i + 1 for i in range(j + 4)] for j in range(5)]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    together = tiny_llm.generate(prompts, sp)
    alone = [tiny_llm.generate([p], sp)[0] for p in prompts]
    for t, a in zip(together, alone):
        assert t.outputs[0].token_ids == a.outputs[0].token_ids


def test_seeded_sampling_reproducible(tiny_llm):
    p = [5, 6, 7, 8]
    sp = SamplingParams(temperature=1.0, top_p=0.9, seed=42, max_tokens=6)
    a = tiny_llm.generate([p], sp)
    b = tiny_llm.generate([p], sp)
    assert a[0].outputs[0].token_ids == b[0].outputs[0].token_ids


def test_stop_token(tiny_llm):
    # Find greedy continuation, then use its 3rd token as a stop token.
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    ref = tiny_llm.generate([[9, 8, 7]], sp)[0].outputs[0].token_ids
    stop_tok = ref[2]
    sp2 = SamplingParams(temperature=0.0, max_tokens=8,
                         stop_token_ids=[stop_tok])
    out = tiny_llm.generate([[9, 8, 7]], sp2)[0]
    assert out.outputs[0].finish_reason == "stop"
    assert out.outputs[0].token_ids[-1] == stop_tok
    assert len(out.outputs[0].token_ids) == 3


def test_chunked_prefill_long_prompt(tiny_llm):
    # Prompt longer than max_num_batched_tokens forces chunking.
    p = [(i * 7) % 128 for i in range(200)]
    out = tiny_llm.generate([p], SamplingParams(temperature=0.0,
                                                max_tokens=4))[0]
    assert len(out.outputs[0].token_ids) == 4


def test_many_concurrent_requests(tiny_llm):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 128, size=rng.integers(4, 40)).tolist()
               for _ in range(20)]
    outs = tiny_llm.generate(prompts,
                             SamplingParams(temperature=0.0, max_tokens=5))
    assert len(outs) == 20
    assert all(o.finished for o in outs)
    stats = tiny_llm.get_stats()
    assert stats["num_running"] == 0
    assert stats["kv_cache_usage"] == 0.0


def test_logprobs_returned(tiny_llm):
    out = tiny_llm.generate(
        [[1, 2, 3]], SamplingParams(temperature=0.0, max_tokens=3,
                                    logprobs=1))[0]
    assert out.outputs[0].cumulative_logprob is not None
    assert out.outputs[0].cumulative_logprob <= 0.0


def test_n_greater_than_one(tiny_llm):
    sp = SamplingParams(temperature=0.8, seed=5, n=3, max_tokens=6)
    outs = tiny_llm.generate([[3, 1, 4, 1, 5]], sp)
    assert len(outs) == 1
    comps = outs[0].outputs
    assert len(comps) == 3
    assert [c.index for c in comps] == [0, 1, 2]
    assert all(len(c.token_ids) == 6 for c in comps)
    # Distinct seeds → (very likely) distinct continuations.
    assert len({tuple(c.token_ids) for c in comps}) >= 2
    # Reproducible.
    outs2 = tiny_llm.generate([[3, 1, 4, 1, 5]], sp)
    assert [c.token_ids for c in outs2[0].outputs] == \
        [c.token_ids for c in comps]


def test_reload_weights(tmp_path):
    """RLHF-style weight swap changes outputs; swapping back restores them
    (reference: update_weights/reload_weights)."""
    import torch, transformers
    cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
        use_sliding_window=False)
    torch.manual_seed(0)
    m1 = transformers.AutoModelForCausalLM.from_config(cfg)
    d1 = tmp_path / "m1"
    m1.save_pretrained(d1, safe_serialization=True)
    torch.manual_seed(123)
    m2 = transformers.AutoModelForCausalLM.from_config(cfg)
    d2 = tmp_path / "m2"
    m2.save_pretrained(d2, safe_serialization=True)

    llm = LLM(model=str(d1), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=64)
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    a = llm.generate([[1, 2, 3]], sp)[0].outputs[0].token_ids
    llm.engine.core.reload_weights(str(d2))
    b = llm.generate([[1, 2, 3]], sp)[0].outputs[0].token_ids
    assert a != b
    llm.engine.core.reload_weights(str(d1))
    c = llm.generate([[1, 2, 3]], sp)[0].outputs[0].token_ids
    assert c == a


def test_topk_logprobs_returned(tiny_llm):
    out = tiny_llm.generate(
        [[1, 2, 3]], SamplingParams(temperature=0.0, max_tokens=3,
                                    logprobs=4))[0]
    lps = out.outputs[0].logprobs
    assert lps is not None and len(lps) == 3
    for step_dict, tok in zip(lps, out.outputs[0].token_ids):
        assert len(step_dict) == 4
        # Greedy token is the argmax → present and maximal in the top-k.
        assert tok in step_dict
        assert step_dict[tok] == max(step_dict.values())


def test_beam_search(tiny_llm):
    beams = tiny_llm.beam_search([1, 2, 3, 4], beam_width=3, max_tokens=5)
    assert len(beams) == 3
    # Sorted by cumulative logprob.
    lps = [b["cum_logprob"] for b in beams]
    assert lps == sorted(lps, reverse=True)
    assert all(len(b["token_ids"]) == 5 for b in beams if not b["finished"])
    # The top beam must score at least as well as greedy decoding's path.
    greedy = tiny_llm.generate(
        [[1, 2, 3, 4]], SamplingParams(temperature=0.0, max_tokens=5,
                                       logprobs=1))[0]
    greedy_lp = greedy.outputs[0].cumulative_logprob
    assert beams[0]["cum_logprob"] >= greedy_lp - 1e-4


def test_engine_drain(tiny_llm):
    eng = tiny_llm.engine
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    eng.add_request("d0", [1, 2, 3], sp)
    eng.step()  # start running
    assert eng.core.drain(timeout_s=60)
    assert not eng.core.scheduler.running
    # Waiting work stays queued until resume.
    eng.add_request("d1", [4, 5], sp)
    out = eng.core.scheduler.schedule()
    assert out.is_empty()
    eng.core.resume()
    # Finish it so the module-scoped fixture stays clean.
    while eng.has_unfinished_requests():
        eng.step()
