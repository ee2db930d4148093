"""Multi-LoRA serving tests (reference: tests/lora).

The key invariants: zero-weight adapters are identity; a real adapter
changes outputs for exactly its requests; adapter/plain requests batch
together without cross-talk; adapters can be removed and slots reused.
"""

import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, LoRAConfig,
                              ModelConfig, SchedulerConfig)
from lvllm_tpu.core.request import Request
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.lora.manager import LoRARequest
from lvllm_tpu.sampling_params import SamplingParams


def build_engine(lora=True):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=21)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128),
        lora_config=LoRAConfig(enabled=lora, max_loras=2, max_lora_rank=8),
    )
    return LLMEngine(cfg, load_format="dummy")


def make_adapter(lora_id, scale=1.0, rank=4, h=64, qout=64, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((rank, h)) * scale).astype(np.float32)
    B = (rng.standard_normal((qout, rank)) * scale).astype(np.float32)
    return LoRARequest(lora_name=f"ad{lora_id}", lora_int_id=lora_id,
                       weights={"q_proj": (A, B)}, alpha=8.0, rank=rank)


def run(engine, reqs):
    outs = {}
    for rid, prompt, sp, lora_id in reqs:
        r = Request(rid, prompt, sp,
                    eos_token_id=engine.config.model_config.eos_token_id,
                    lora_int_id=lora_id)
        engine.core.add_request(r)
        engine.output_processor.add_request(r)
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o
    return outs


def test_null_adapter_is_identity():
    base_eng = build_engine(lora=False)
    lora_eng = build_engine(lora=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    p = [1, 2, 3, 4]
    base = run(base_eng, [("r0", p, sp, None)])["r0"].outputs[0].token_ids
    # LoRA enabled but request has no adapter → identical.
    same = run(lora_eng, [("r0", p, sp, None)])["r0"].outputs[0].token_ids
    assert base == same


def test_adapter_changes_output_only_for_its_request():
    eng = build_engine()
    eng.core.add_lora(make_adapter(1, scale=0.8, seed=3))
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    p = [5, 6, 7, 8, 9]
    outs = run(eng, [("plain", p, sp, None), ("tuned", p, sp, 1)])
    plain = outs["plain"].outputs[0].token_ids
    tuned = outs["tuned"].outputs[0].token_ids
    assert plain != tuned  # adapter took effect

    # Plain request unchanged vs a no-LoRA engine.
    ref = run(build_engine(), [("r", p, sp, None)])["r"].outputs[0].token_ids
    assert plain == ref


def test_two_adapters_differ():
    eng = build_engine()
    eng.core.add_lora(make_adapter(1, scale=0.8, seed=3))
    eng.core.add_lora(make_adapter(2, scale=0.8, seed=7))
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    p = [9, 8, 7]
    outs = run(eng, [("a", p, sp, 1), ("b", p, sp, 2)])
    assert outs["a"].outputs[0].token_ids != outs["b"].outputs[0].token_ids


def test_remove_and_reuse_slot():
    eng = build_engine()
    s1 = eng.core.add_lora(make_adapter(1))
    s2 = eng.core.add_lora(make_adapter(2))
    with pytest.raises(RuntimeError):
        eng.core.add_lora(make_adapter(3))  # capacity 2
    assert eng.core.remove_lora(1)
    s3 = eng.core.add_lora(make_adapter(3))
    assert s3 == s1  # slot reused
    assert set(eng.core.list_loras()) == {2, 3}


def test_lora_request_without_serving_enabled_rejected():
    eng = build_engine(lora=False)
    r = Request("x", [1, 2], SamplingParams(), lora_int_id=1)
    with pytest.raises(ValueError):
        eng.core.add_request(r)


def make_adapter_multi(lora_id, rank=4, h=64, inter=128, vocab=128,
                       seed=0, scale=0.5):
    """Adapter touching attention + MLP + embedding + lm_head."""
    rng = np.random.default_rng(seed)

    def ab(din, dout):
        return ((rng.standard_normal((rank, din)) * scale).astype(
                    np.float32),
                (rng.standard_normal((dout, rank)) * scale).astype(
                    np.float32))

    return LoRARequest(
        lora_name=f"multi{lora_id}", lora_int_id=lora_id,
        weights={
            "q_proj": ab(h, h),
            "gate_up": ab(h, 2 * inter),
            "down": ab(inter, h),
            "embed_tokens": ab(vocab, h),
            "lm_head": ab(h, vocab),
        }, alpha=float(rank), rank=rank)


def test_mlp_embed_lmhead_targets_take_effect():
    """Each new target family changes outputs for its request only."""
    for target in ("gate_up", "down", "embed_tokens", "lm_head"):
        eng = build_engine()
        full = make_adapter_multi(1, seed=7)
        full.weights = {target: full.weights[target]}
        eng.core.add_lora(full)
        sp = SamplingParams(temperature=0.0, max_tokens=6)
        p = [5, 6, 7, 8, 9]
        outs = run(eng, [("plain", p, sp, None), ("tuned", p, sp, 1)])
        assert outs["plain"].outputs[0].token_ids != \
            outs["tuned"].outputs[0].token_ids, target

        base_eng = build_engine(lora=False)
        base = run(base_eng, [("b", p, sp, None)])["b"].outputs[0].token_ids
        assert outs["plain"].outputs[0].token_ids == base, target


def test_per_layer_adapter_keys():
    """Layer-scoped keys ('0.q_proj') adapt only that layer — outputs
    differ from a broadcast adapter with the same weights."""
    rng = np.random.default_rng(9)
    A = (rng.standard_normal((4, 64)) * 0.8).astype(np.float32)
    B = (rng.standard_normal((64, 4)) * 0.8).astype(np.float32)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    p = [3, 1, 4, 1, 5]

    eng_one = build_engine()
    eng_one.core.add_lora(LoRARequest("l0", 1,
                                      weights={"0.q_proj": (A, B)},
                                      alpha=4.0, rank=4))
    one = run(eng_one, [("t", p, sp, 1)])["t"].outputs[0].token_ids

    eng_all = build_engine()
    eng_all.core.add_lora(LoRARequest("all", 1,
                                      weights={"q_proj": (A, B)},
                                      alpha=4.0, rank=4))
    both = run(eng_all, [("t", p, sp, 1)])["t"].outputs[0].token_ids
    assert one != both


def test_load_peft_adapter_dir(tmp_path):
    """PEFT checkpoint directory loads through the server-path API, with
    gate/up fusion; logits match manually merged base+BA weights."""
    import json
    import jax.numpy as jnp
    from safetensors.numpy import save_file
    from lvllm_tpu.lora.manager import load_peft_adapter

    rng = np.random.default_rng(11)
    r, h, inter = 4, 64, 128
    tensors = {}
    prefix = "base_model.model.model.layers.{}.{}"
    for layer in range(2):
        for mod, din, dout in (("self_attn.q_proj", h, h),
                               ("self_attn.o_proj", h, h),
                               ("mlp.gate_proj", h, inter),
                               ("mlp.up_proj", h, inter),
                               ("mlp.down_proj", inter, h)):
            tensors[prefix.format(layer, mod) + ".lora_A.weight"] = \
                (rng.standard_normal((r, din)) * 0.3).astype(np.float32)
            tensors[prefix.format(layer, mod) + ".lora_B.weight"] = \
                (rng.standard_normal((dout, r)) * 0.3).astype(np.float32)
    save_file(tensors, str(tmp_path / "adapter_model.safetensors"))
    (tmp_path / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": 8,
                    "target_modules": ["q_proj", "o_proj", "gate_proj",
                                       "up_proj", "down_proj"]}))

    req = load_peft_adapter(str(tmp_path), 1)
    assert "0.q_proj" in req.weights and "1.down" in req.weights
    assert "0.gate_up" in req.weights          # fused
    A, B = req.weights["0.gate_up"]
    assert A.shape == (2 * r, h) and B.shape == (2 * inter, 2 * r)

    eng = build_engine()
    eng.core.add_lora(req)
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    p = [2, 4, 6, 8]
    outs = run(eng, [("plain", p, sp, None), ("peft", p, sp, 1)])
    assert outs["plain"].outputs[0].token_ids != \
        outs["peft"].outputs[0].token_ids

    # Numeric check: merged-weight engine == adapter engine (greedy).
    scale = 8 / r
    merged = build_engine(lora=False)
    params = merged.core.runner.params
    for layer in range(2):
        for mod, tgt in (("self_attn.q_proj", ("self_attn", "q_proj")),
                         ("self_attn.o_proj", ("self_attn", "o_proj")),
                         ("mlp.down_proj", ("mlp", "down"))):
            A = tensors[prefix.format(layer, mod) + ".lora_A.weight"]
            B = tensors[prefix.format(layer, mod) + ".lora_B.weight"]
            node = params["layers"][layer][tgt[0]][tgt[1]]
            node["kernel"] = node["kernel"] + jnp.asarray(
                (B @ A).T * scale, node["kernel"].dtype)
        Ag = tensors[prefix.format(layer, "mlp.gate_proj") +
                     ".lora_A.weight"]
        Bg = tensors[prefix.format(layer, "mlp.gate_proj") +
                     ".lora_B.weight"]
        Au = tensors[prefix.format(layer, "mlp.up_proj") +
                     ".lora_A.weight"]
        Bu = tensors[prefix.format(layer, "mlp.up_proj") +
                     ".lora_B.weight"]
        delta = np.concatenate([Bg @ Ag, Bu @ Au], axis=0)   # [2I, H]
        node = params["layers"][layer]["mlp"]["gate_up"]
        node["kernel"] = node["kernel"] + jnp.asarray(
            delta.T * scale, node["kernel"].dtype)
    want = run(merged, [("m", p, sp, None)])["m"].outputs[0].token_ids
    assert outs["peft"].outputs[0].token_ids == want
