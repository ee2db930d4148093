"""MiniMax-Text-01 / M1 (lightning-attention hybrid MoE) parity vs HF
transformers MiniMaxForCausalLM + lightning op oracle tests
(reference: vllm models/minimax_text_01.py, layers/mamba/linear_attn.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def _cfg():
    return transformers.MiniMaxConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"])


def test_minimax_logits_parity(tmp_path):
    torch.manual_seed(0)
    hf = transformers.MiniMaxForCausalLM(_cfg()).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    toks = [3, 17, 99, 4, 25, 77, 12, 8]
    with torch.no_grad():
        ref = hf(torch.tensor([toks])).logits[0].float().numpy()

    from tests.models.test_hf_parity import our_logits
    ours = our_logits(str(tmp_path), toks)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_minimax_engine_decode_matches_hf_greedy(tmp_path):
    """Engine-loop greedy decode (prefill + stepwise lightning state
    updates through the paged scheduler) matches HF generate."""
    torch.manual_seed(1)
    hf = transformers.MiniMaxForCausalLM(_cfg()).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    prompt = [5, 9, 33, 60]
    n = 8
    with torch.no_grad():
        want = hf.generate(torch.tensor([prompt]), max_new_tokens=n,
                           do_sample=False).tolist()[0][len(prompt):]

    from lvllm_tpu.config import (CacheConfig, EngineConfig,
                                  SchedulerConfig)
    from lvllm_tpu.engine.llm_engine import LLMEngine
    from lvllm_tpu.model_loader.hf_config import load_model_config
    from lvllm_tpu.sampling_params import SamplingParams

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.layer_types is not None and \
        mc.layer_types[0] == "linear_attention"
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2, max_model_len=64),
    )
    eng = LLMEngine(cfg, load_format="safetensors")
    eng.add_request("m", prompt, SamplingParams(temperature=0.0,
                                                max_tokens=n))
    got = None
    steps = 0
    while eng.has_unfinished_requests() and steps < 40:
        for o in eng.step():
            if o.finished:
                got = o.outputs[0].token_ids
        steps += 1
    assert got == want, (got, want)


def test_lightning_op_decode_matches_scan():
    """lightning_decode (parallel batch) == one lightning_ragged step."""
    from lvllm_tpu.ops.lightning import (build_slopes, lightning_decode,
                                         lightning_ragged)

    rng = np.random.default_rng(0)
    T, H, D = 3, 4, 8
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    slope = jnp.asarray(build_slopes(H))
    st = jnp.asarray(rng.standard_normal((T + 1, H, D, D)), jnp.float32)
    slots = jnp.asarray([0, 1, 2], jnp.int32)
    reset = jnp.asarray([False, True, False])
    o1, s1 = lightning_ragged(q, k, v, slope, st, slots, reset)
    o2, s2 = lightning_decode(q, k, v, slope, st, slots, reset)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)
