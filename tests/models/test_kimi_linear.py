"""KimiLinear / KDA structural + op-level tests (reference:
vllm models/kimi_linear.py, layers/kda.py, fla/ops fused_recurrent
IS_KDA=True; no HF class in this image)."""

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.entrypoints.llm import LLM
from lvllm_tpu.sampling_params import SamplingParams


def test_kda_decode_matches_ragged():
    from lvllm_tpu.ops.kda import kda_decode, kda_ragged
    rng = np.random.default_rng(2)
    T, S, H, D = 5, 6, 3, 8
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k = rng.standard_normal((T, H, D)).astype(np.float32)
    v = rng.standard_normal((T, H, D)).astype(np.float32) * 0.5
    g = -np.abs(rng.standard_normal((T, H, D))).astype(np.float32) * 0.3
    b = rng.uniform(0.1, 0.9, (T, H)).astype(np.float32)
    st = rng.standard_normal((S, H, D, D)).astype(np.float32) * 0.3
    slots = jnp.asarray([0, 2, 4, 5, 5], jnp.int32)
    reset = jnp.asarray([True, False, False, False, False])
    args = tuple(map(jnp.asarray, (q, k, v, g, b, st)))
    ro, rs = kda_ragged(*args, slots, reset)
    go, gs = kda_decode(*args, slots, reset)
    act = np.asarray(slots) != 5
    np.testing.assert_allclose(np.asarray(go)[act], np.asarray(ro)[act],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs)[:5], np.asarray(rs)[:5],
                               atol=1e-5, rtol=1e-5)


def test_kda_reduces_to_gdn_for_uniform_gate():
    """With a per-channel gate that is constant across channels, KDA ==
    the scalar-gated delta rule (the defining relationship)."""
    from lvllm_tpu.ops.gdn import gated_delta_rule_ragged
    from lvllm_tpu.ops.kda import kda_ragged
    rng = np.random.default_rng(5)
    T, S, H, D = 7, 3, 2, 8
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k = rng.standard_normal((T, H, D)).astype(np.float32)
    v = rng.standard_normal((T, H, D)).astype(np.float32) * 0.5
    g_scalar = -np.abs(rng.standard_normal((T, H))).astype(np.float32)
    b = rng.uniform(0.1, 0.9, (T, H)).astype(np.float32)
    st = np.zeros((S, H, D, D), np.float32)
    slots = jnp.zeros(T, jnp.int32)
    reset = jnp.zeros(T, bool)
    ref_o, ref_s = gated_delta_rule_ragged(
        *map(jnp.asarray, (q, k, v, g_scalar, b, st)), slots, reset)
    g_vec = np.broadcast_to(g_scalar[..., None], (T, H, D)).copy()
    got_o, got_s = kda_ragged(
        *map(jnp.asarray, (q, k, v, g_vec, b, st)), slots, reset)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               atol=1e-5, rtol=1e-5)


def _kimi_config():
    return ModelConfig(
        model="dummy", architecture="KimiLinearForCausalLM",
        dtype="float32", vocab_size=256, hidden_size=64,
        intermediate_size=96, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=4,
        layer_types=("linear_attention", "linear_attention",
                     "linear_attention", "full_attention"),
        linear_num_key_heads=2, linear_num_value_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        attention_type="mla", q_lora_rank=None, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        mlp_only_layers=(0,), router_scoring_fn="sigmoid",
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=9)


def _gen(h=1):
    llm = LLM(model_config=_kimi_config(), load_format="dummy",
              max_num_seqs=4, max_num_batched_tokens=128, block_size=8,
              num_kv_blocks=64, multi_step_decode=h)
    return [o.outputs[0].token_ids for o in llm.generate(
        [[1, 2, 3, 4, 5], [9] * 20],
        SamplingParams(temperature=0.0, max_tokens=9))]


def test_kimi_linear_engine_generates():
    out = _gen()
    assert all(len(t) == 9 for t in out)


def test_kimi_linear_multi_step_identical():
    assert _gen(4) == _gen(1)
