"""Qwen3-VL / Qwen3-VL-MoE parity vs transformers.

Golden tests: tiny random HF checkpoints → our loader → logits compared
with image inputs, deepstack per-level feature injection, and the
interleaved M-RoPE layout (reference:
vllm/model_executor/models/qwen3_vl.py:534,1532; HF modeling_qwen3_vl
apply_interleaved_mrope:299, fast_pos_embed_interpolate:642).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG = 51
VST = 52
VID = 53


def _vision_cfg():
    return dict(depth=3, hidden_size=32, num_heads=2, intermediate_size=64,
                out_hidden_size=48, patch_size=14, temporal_patch_size=2,
                spatial_merge_size=2, in_channels=3,
                num_position_embeddings=16,
                deepstack_visual_indexes=[0, 1],
                hidden_act="gelu_pytorch_tanh")


def _text_kwargs():
    return dict(vocab_size=64, hidden_size=48, intermediate_size=96,
                num_hidden_layers=3, num_attention_heads=4,
                num_key_value_heads=2, head_dim=12,
                max_position_embeddings=256, rope_theta=10000.0,
                tie_word_embeddings=False,
                rope_scaling={"rope_type": "default",
                              "mrope_section": [2, 2, 2],
                              "mrope_interleaved": True})


def _hf_qwen3vl(tmp_path):
    cfg = transformers.Qwen3VLConfig(
        vision_config=_vision_cfg(),
        text_config=_text_kwargs(),
        image_token_id=IMG, video_token_id=VID,
        vision_start_token_id=VST)
    torch.manual_seed(0)
    model = transformers.Qwen3VLForConditionalGeneration(cfg).eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def _hf_qwen3vl_moe(tmp_path):
    text = {**_text_kwargs(), "num_experts": 4, "num_experts_per_tok": 2,
            "moe_intermediate_size": 32, "decoder_sparse_step": 1,
            "mlp_only_layers": []}
    cfg = transformers.Qwen3VLMoeConfig(
        vision_config=_vision_cfg(), text_config=text,
        image_token_id=IMG, video_token_id=VID,
        vision_start_token_id=VST)
    torch.manual_seed(1)
    model = transformers.Qwen3VLMoeForConditionalGeneration(cfg).eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def _image_inputs(rng, grid=(1, 4, 4)):
    t, h, w = grid
    flat = rng.standard_normal((t * h * w, 3 * 2 * 14 * 14)).astype(
        np.float32)
    return flat, np.asarray([[t, h, w]], np.int64)


def _lsm(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _prompt(n_img_tokens):
    return [1, 2, VST] + [IMG] * n_img_tokens + [3, 4, 5]


def _run_ours(tmp_path, ids, pix, grids):
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    mm_data = {"pixel_values": pix, "image_grid_thw": grids}
    feats = model.encode_mm(params, mm_data)    # [N, (1+levels)*H]
    T = len(ids)
    H = mc.hidden_size
    levels = model.num_deepstack
    assert feats.shape[1] == (1 + levels) * H
    mm_mask = np.asarray([t == IMG for t in ids])
    assert mm_mask.sum() == feats.shape[0]
    mm_embeds = np.zeros((T, H), np.float32)
    mm_embeds[mm_mask] = feats[:, :H]
    mm_deep = np.zeros((levels, T, H), np.float32)
    for lv in range(levels):
        mm_deep[lv, mm_mask] = feats[:, (1 + lv) * H:(2 + lv) * H]
    pos3, delta = model.mm_positions(np.asarray(ids), mm_data)

    caches = [model.make_layer_cache(i, 8, 32, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(32 + jnp.arange(T)).astype(jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(pos3), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask),
                      mm_deepstack=jnp.asarray(mm_deep))
    ours = np.asarray(model.compute_logits(params, hidden))
    return mc, model, pos3, delta, ours


def _hf_logits(hf, ids, pix, grids):
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pix),
                 image_grid_thw=torch.tensor(grids),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    return ref[0].float().numpy()


def test_qwen3_vl_vision_tower_matches_hf(tmp_path):
    hf = _hf_qwen3vl(tmp_path)
    rng = np.random.default_rng(2)
    pix, grids = _image_inputs(rng, (1, 6, 4))
    with torch.no_grad():
        main, deep = hf.model.visual(torch.tensor(pix),
                                     grid_thw=torch.tensor(grids))
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = model.encode_mm(params, {"pixel_values": pix,
                                    "image_grid_thw": grids})
    H = main.shape[-1]
    np.testing.assert_allclose(ours[:, :H], main.float().numpy(),
                               rtol=3e-3, atol=3e-3)
    for lv, d in enumerate(deep):
        np.testing.assert_allclose(ours[:, (1 + lv) * H:(2 + lv) * H],
                                   d.float().numpy(), rtol=3e-3, atol=3e-3)


def test_qwen3_vl_logits_parity(tmp_path):
    hf = _hf_qwen3vl(tmp_path)
    rng = np.random.default_rng(0)
    pix, grids = _image_inputs(rng, (1, 4, 4))
    ids = _prompt(4)

    ref = _hf_logits(hf, ids, pix, grids)
    mc, model, pos3, delta, ours = _run_ours(tmp_path, ids, pix, grids)
    assert mc.mrope_section == (2, 2, 2) and mc.mrope_interleaved

    hf_pos, hf_delta = hf.model.get_rope_index(
        torch.tensor([ids]), torch.tensor(grids), None,
        torch.ones(1, len(ids), dtype=torch.long))
    np.testing.assert_array_equal(pos3, hf_pos[:, 0].numpy())
    assert delta == int(hf_delta[0])

    np.testing.assert_allclose(_lsm(ours), _lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))


def test_qwen3_vl_moe_logits_parity(tmp_path):
    hf = _hf_qwen3vl_moe(tmp_path)
    rng = np.random.default_rng(1)
    pix, grids = _image_inputs(rng, (1, 4, 4))
    ids = _prompt(4)

    ref = _hf_logits(hf, ids, pix, grids)
    mc, model, pos3, delta, ours = _run_ours(tmp_path, ids, pix, grids)
    assert mc.num_experts == 4
    np.testing.assert_allclose(_lsm(ours), _lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))


def test_qwen3_vl_engine_generates(tmp_path):
    """End-to-end engine decode with an image: deepstack splice through
    prefill, interleaved-mrope decode positions, plus a text-only request
    on the same model."""
    _hf_qwen3vl(tmp_path)
    from lvllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from lvllm_tpu.engine.llm_engine import LLMEngine
    from lvllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(4)
    pix, grids = _image_inputs(rng, (1, 4, 4))
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4,
                                         max_model_len=128))
    eng = LLMEngine(cfg, load_format="safetensors")
    eng.add_request("vl0", _prompt(4),
                    SamplingParams(temperature=0.0, max_tokens=8),
                    mm_data={"pixel_values": pix,
                             "image_grid_thw": grids})
    eng.add_request("txt0", [1, 2, 3, 4],
                    SamplingParams(temperature=0.0, max_tokens=4))
    finals = {}
    steps = 0
    while eng.has_unfinished_requests() and steps < 60:
        for o in eng.step():
            if o.finished:
                finals[o.request_id] = o
        steps += 1
    assert len(finals["vl0"].outputs[0].token_ids) == 8
    assert len(finals["txt0"].outputs[0].token_ids) == 4
