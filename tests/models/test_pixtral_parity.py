"""Pixtral-in-LLaVA parity vs transformers (PixtralVisionModel tower:
RMS norms, bias-free projections, 2D rope, gated MLP; reference
models/pixtral.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG = 50


def _build(tmp_path):
    vision = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, head_dim=16, patch_size=16, image_size=64,
        hidden_act="silu", rope_theta=10000.0)
    text = transformers.MistralConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=256, pad_token_id=0,
        tie_word_embeddings=False)
    cfg = transformers.LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=IMG,
        vision_feature_layer=-1, vision_feature_select_strategy="full",
        projector_hidden_act="gelu")
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    return hf


def test_pixtral_tower_matches_hf(tmp_path):
    hf = _build(tmp_path)
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.vision_tower(
            torch.tensor(pix),
            image_sizes=torch.tensor([[64, 64]])).last_hidden_state
    ref = ref[0].float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    assert model.is_pixtral
    from lvllm_tpu.models.vision import pixtral_vision_encode
    ours = np.asarray(pixtral_vision_encode(
        params["vision"], jnp.asarray(pix), 16, 2, hidden_act="silu"))[0]
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


def test_pixtral_llava_logits_parity(tmp_path):
    hf = _build(tmp_path)
    rng = np.random.default_rng(2)
    pix = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ids = [1, 2] + [IMG] * 16 + [3, 4]        # 4x4 grid -> 16 tokens

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pix),
                 image_sizes=torch.tensor([[64, 64]]),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    feats = np.asarray(model.encode_images(params, jnp.asarray(pix)),
                       np.float32).reshape(-1, mc.hidden_size)
    T = len(ids)
    mm_mask = np.asarray([t == IMG for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = feats
    caches = [model.make_layer_cache(i, 8, 32, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(32 + jnp.arange(T)).astype(jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.arange(T), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))


def test_pixtral_mistral_native_format(tmp_path):
    """PixtralForConditionalGeneration with mistral-native consolidated
    naming (reference pixtral.py:294-480: vision_encoder.* with wq/wk/wv/
    wo + w1/w3/w2, vision_language_adapter.w_in/w_out, mistral text
    layers.N.attention.wq...): logits must match the HF llava-pixtral
    oracle built from the same weights."""
    import json
    import re as _re
    from safetensors.torch import load_file, save_file

    hf = _build(tmp_path)
    t = load_file(str(tmp_path / "model.safetensors"))
    out = {}
    vis_ren = [("attention.q_proj.", "attention.wq."),
               ("attention.k_proj.", "attention.wk."),
               ("attention.v_proj.", "attention.wv."),
               ("attention.o_proj.", "attention.wo."),
               ("feed_forward.gate_proj.", "feed_forward.w1."),
               ("feed_forward.up_proj.", "feed_forward.w3."),
               ("feed_forward.down_proj.", "feed_forward.w2.")]
    txt_ren = [("self_attn.q_proj.", "attention.wq."),
               ("self_attn.k_proj.", "attention.wk."),
               ("self_attn.v_proj.", "attention.wv."),
               ("self_attn.o_proj.", "attention.wo."),
               ("mlp.gate_proj.", "feed_forward.w1."),
               ("mlp.up_proj.", "feed_forward.w3."),
               ("mlp.down_proj.", "feed_forward.w2."),
               ("input_layernorm.", "attention_norm."),
               ("post_attention_layernorm.", "ffn_norm.")]
    for name, w in t.items():
        name = name.removeprefix("model.")
        if name.startswith("vision_tower."):
            rest = name.removeprefix("vision_tower.")
            for a, b in vis_ren:
                rest = rest.replace(a, b)
            out["vision_encoder." + rest] = w
        elif m := _re.match(r"multi_modal_projector\.linear_([12])\.(.+)",
                            name):
            which = "w_in" if m.group(1) == "1" else "w_out"
            out[f"vision_language_adapter.{which}.{m.group(2)}"] = w
        elif m := _re.match(r"language_model\.layers\.(\d+)\.(.+)", name):
            rest = m.group(2)
            for a, b in txt_ren:
                rest = rest.replace(a, b)
            out[f"layers.{m.group(1)}.{rest}"] = w
        elif name == "language_model.embed_tokens.weight":
            out["tok_embeddings.weight"] = w
        elif name == "language_model.norm.weight":
            out["norm.weight"] = w
        elif name == "lm_head.weight":
            out["output.weight"] = w
        else:
            out[name] = w
    ck = tmp_path / "native"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["PixtralForConditionalGeneration"],
        "image_token_index": IMG,
        "vision_config": {
            "model_type": "pixtral", "hidden_size": 32,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2, "head_dim": 16, "patch_size": 16,
            "image_size": 64, "hidden_act": "silu",
            "rope_theta": 10000.0, "vision_feature_layer": -1},
        "text_config": {
            "model_type": "mistral", "vocab_size": 64, "hidden_size": 48,
            "intermediate_size": 96, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 12, "max_position_embeddings": 256,
            "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
            "tie_word_embeddings": False}}))
    rng = np.random.default_rng(4)
    pix = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    # 64/16 = 4x4 = 16 image tokens.
    ids = [IMG] * 16 + [2, 5, 9, 11]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pix),
                 image_sizes=torch.tensor([[64, 64]]),
                 attention_mask=torch.ones(1, len(ids), dtype=torch.long),
                 ).logits[0].float().numpy()
    mc = load_model_config(str(ck), max_model_len=128, dtype="float32")
    assert mc.architecture == "PixtralForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    feats = np.asarray(model.encode_images(params, jnp.asarray(pix)),
                       np.float32).reshape(-1, mc.hidden_size)
    T = len(ids)
    mm_mask = np.asarray([tk == IMG for tk in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = feats
    caches = [model.make_layer_cache(i, 8, 32, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(32 + jnp.arange(T)).astype(jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.arange(T), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=6e-3, atol=6e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
