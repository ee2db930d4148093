"""Penalty sampling tests (repetition / presence / frequency)."""

import numpy as np
import jax.numpy as jnp

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.entrypoints.llm import LLM
from lvllm_tpu.sampling_params import SamplingParams
from lvllm_tpu.ops.sampling import apply_penalties_from_history


def make_llm():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=3)
    return LLM(model_config=mc, load_format="dummy", max_num_seqs=4,
               max_num_batched_tokens=128, num_kv_blocks=64)


def test_apply_penalties_from_history_op():
    logits = jnp.zeros((2, 8), jnp.float32)
    # row 0: prompt [1, 2], output [2, 3]; row 1: nothing.
    token_mat = jnp.asarray([[1, 2, 2, 3], [0, 0, 0, 0]], jnp.int32)
    out = apply_penalties_from_history(
        logits, token_mat,
        num_prompt=jnp.asarray([2, 0]),
        num_tokens=jnp.asarray([4, 0]),
        repetition_penalty=jnp.asarray([2.0, 2.0]),
        presence_penalty=jnp.asarray([0.5, 0.5]),
        frequency_penalty=jnp.asarray([0.25, 0.25]))
    out = np.asarray(out)
    # Token 2 appears in prompt+output(1x): logit 0 → rep(no-op on 0) -
    # freq*1 - presence*1 = -0.75
    assert np.isclose(out[0, 2], -0.75)
    # Token 3 output-only once → -0.75; token 1 prompt-only → 0 (presence
    # applies only to output tokens in the reference semantics).
    assert np.isclose(out[0, 3], -0.75)
    assert np.isclose(out[0, 1], 0.0)
    # Row 1 untouched.
    assert (out[1] == 0).all()


def test_repetition_penalty_reduces_repeats():
    llm = make_llm()
    p = [7, 7, 7, 7]
    base = llm.generate([p], SamplingParams(
        temperature=0.0, max_tokens=12))[0].outputs[0].token_ids
    pen = llm.generate([p], SamplingParams(
        temperature=0.0, max_tokens=12,
        repetition_penalty=1.8, frequency_penalty=1.0))[0].outputs[0].token_ids

    def repeats(seq):
        return len(seq) - len(set(seq))
    assert repeats(pen) <= repeats(base)
    # Penalized generation must diverge from base once a repeat would occur.
    assert pen != base or repeats(base) == 0


def test_penalty_and_plain_requests_coexist():
    llm = make_llm()
    sp_plain = SamplingParams(temperature=0.0, max_tokens=5)
    sp_pen = SamplingParams(temperature=0.0, max_tokens=5,
                            presence_penalty=1.0)
    outs = llm.generate([[1, 2, 3], [1, 2, 3]], [sp_plain, sp_pen])
    assert all(o.finished for o in outs)
    ref = llm.generate([[1, 2, 3]], sp_plain)[0]
    # The plain request is unaffected by its penalized batchmate.
    assert outs[0].outputs[0].token_ids == ref.outputs[0].token_ids
