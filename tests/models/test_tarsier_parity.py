"""Tarsier / Tarsier2 parity.

Tarsier: llava tower + split tokens — oracle composes HF llava
get_image_features + embedding rows exactly as the reference's
_add_tarsier_split_tokens. Tarsier2: a Qwen2-VL checkpoint re-keyed
with the ``vision_tower.`` prefix and a tarsier2 config — logits must
match the plain Qwen2-VL oracle.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 63


def test_tarsier_split_tokens(tmp_path):
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14)
    tc = transformers.LlamaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128)
    cfg = transformers.LlavaConfig(vision_config=vc, text_config=tc,
                                   image_token_index=IMG_TOK)
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    # Re-badge the checkpoint as Tarsier with split-token ids.
    with open(os.path.join(str(tmp_path), "config.json")) as f:
        raw = json.load(f)
    raw["architectures"] = ["TarsierForConditionalGeneration"]
    raw["image_newline_idx"] = 60
    raw["image_new_idx"] = 61
    with open(os.path.join(str(tmp_path), "config.json"), "w") as f:
        json.dump(raw, f)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        feats = hf.get_image_features(torch.tensor(pixels))
        if not torch.is_tensor(feats):
            feats = feats[0] if isinstance(feats, (list, tuple)) else \
                feats
        emb = hf.get_input_embeddings().weight
        g = 2
        grid = feats.reshape(1, g, g, -1)
        newline = emb[60].expand(1, g, 1, emb.shape[-1])
        ref = torch.cat([grid, newline], dim=2).reshape(1, g * (g + 1),
                                                        -1)
        ref = torch.cat([ref, emb[61].expand(1, 1, emb.shape[-1])],
                        dim=1)[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "TarsierForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    assert model.num_image_tokens == 4 + 2 + 1
    ours = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours[0], ref, rtol=2e-3, atol=2e-3)


def test_tarsier2_matches_qwen2vl(tmp_path):
    cfg = transformers.Qwen2VLConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=32, num_heads=2,
            in_chans=3, mlp_ratio=2, patch_size=14, spatial_merge_size=2,
            temporal_patch_size=2, spatial_patch_size=14),
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=IMG_TOK, video_token_id=62,
        vision_start_token_id=61)
    torch.manual_seed(0)
    hf = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    # Re-key as a Tarsier2 checkpoint: tower under vision_tower.,
    # tarsier2 model_type/arch.
    from safetensors import safe_open
    from safetensors.numpy import save_file
    path = os.path.join(str(tmp_path), "model.safetensors")
    f = safe_open(path, "np")
    tensors = {}
    for k in f.keys():
        nk = "vision_tower." + k.removeprefix("visual.") \
            if k.startswith("visual.") else k
        tensors[nk] = f.get_tensor(k)
    del f
    save_file(tensors, path)
    with open(os.path.join(str(tmp_path), "config.json")) as fh:
        raw = json.load(fh)
    raw["architectures"] = ["Tarsier2ForConditionalGeneration"]
    raw["model_type"] = "tarsier2"
    with open(os.path.join(str(tmp_path), "config.json"), "w") as fh:
        json.dump(raw, fh)

    ids = [1, 5, 9, 11, 30, 2]
    T = len(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 attention_mask=torch.ones(1, T,
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Tarsier2ForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    caches = [model.make_layer_cache(i, 8, 16, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(16 + jnp.arange(T)).astype(jnp.int32))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (3, T))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32), pos, caches,
                      md)
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
