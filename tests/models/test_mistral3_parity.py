"""Mistral3 (Mistral Small 3.1 VLM) parity vs transformers: Pixtral tower
+ RMSNorm + patch merger + GELU projector + Mistral decoder."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 10


def test_mistral3_logits_parity(tmp_path):
    vc = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
        head_dim=16, rope_theta=10000.0)
    tc = transformers.MistralConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.Mistral3Config(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        spatial_merge_size=2, multimodal_projector_bias=False,
        vision_feature_layer=-1, projector_hidden_act="gelu")
    torch.manual_seed(0)
    hf = transformers.Mistral3ForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    # 4x4 patches merged 2x2 -> 4 image tokens.
    ids = [1, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 5, 9, 11]
    T = len(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 image_sizes=torch.tensor([[56, 56]]),
                 attention_mask=torch.ones(1, T, dtype=torch.long)
                 ).logits[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Mistral3ForConditionalGeneration"
    assert mc.image_token_id == IMG_TOK
    model, params = load_model(mc, "safetensors")
    assert model.num_image_tokens == 4

    feats = model.encode_images(params, jnp.asarray(pixels))
    mm_mask = np.asarray([t == IMG_TOK for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = np.asarray(feats[0], np.float32)

    caches = [model.make_layer_cache(i, 8, 16, jnp.float32, 2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(16 + jnp.arange(T)).astype(jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.arange(T, dtype=jnp.int32), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden), np.float32)
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)


def test_lightonocr_prefix_remap(tmp_path):
    """LightOnOCR = Mistral3 under model.vision_encoder./
    model.vision_projection. prefixes (reference lightonocr.py:134):
    renamed checkpoint must produce identical image features."""
    import json
    from safetensors.torch import load_file, save_file
    vc = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
        head_dim=16, rope_theta=10000.0)
    tc = transformers.MistralConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.Mistral3Config(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        spatial_merge_size=2, multimodal_projector_bias=False,
        vision_feature_layer=-1, projector_hidden_act="gelu")
    torch.manual_seed(7)
    hf = transformers.Mistral3ForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    rng = np.random.default_rng(3)
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)

    from lvllm_tpu.model_loader.hf_config import load_model_config
    from lvllm_tpu.model_loader.loader import load_model
    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    m1, p1 = load_model(mc, "safetensors")
    want = np.asarray(m1.encode_images(p1, jnp.asarray(pixels)))

    t = load_file(str(tmp_path / "model.safetensors"))
    out = {}
    for name, w in t.items():
        name = name.removeprefix("model.")
        if name.startswith("vision_tower."):
            out["model.vision_encoder." +
                name.removeprefix("vision_tower.")] = w
        elif name.startswith("multi_modal_projector."):
            out["model.vision_projection." +
                name.removeprefix("multi_modal_projector.")] = w
        elif name.startswith("language_model."):
            out["model.language_model." +
                name.removeprefix("language_model.")] = w
        else:
            out[name] = w
    ck = tmp_path / "lighton"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["LightOnOCRForConditionalGeneration"]
    (ck / "config.json").write_text(json.dumps(d))
    mc2 = load_model_config(str(ck), max_model_len=64, dtype="float32")
    assert mc2.architecture == "LightOnOCRForConditionalGeneration"
    m2, p2 = load_model(mc2, "safetensors")
    got = np.asarray(m2.encode_images(p2, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
