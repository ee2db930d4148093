"""Phi-4-multimodal parity vs transformers Phi4MultimodalForCausalLM:
vision hd-transform features, conformer audio features, and full logits
with both modalities spliced."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 60
AUD_TOK = 61


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("phi4mm")
    c = transformers.models.phi4_multimodal.configuration_phi4_multimodal
    vc = c.Phi4MultimodalVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=56, patch_size=14,
        crop_size=56, image_token_id=IMG_TOK)
    ac = c.Phi4MultimodalAudioConfig(
        hidden_size=32, intermediate_size=48, num_blocks=2,
        num_attention_heads=2, input_size=80, nemo_conv_channels=16,
        nemo_final_size=10, bias_max_distance=50,
        ext_pw_out_channel=32, depthwise_separable_out_channel=32,
        audio_token_id=AUD_TOK)
    cfg = c.Phi4MultimodalConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        vision_config=vc.to_dict(), audio_config=ac.to_dict())
    torch.manual_seed(0)
    model = transformers.Phi4MultimodalForCausalLM(cfg)
    # HF's vision/audio attentions carry is_causal=True; under the
    # default sdpa backend a FULL patch mask silently turns the vision
    # tower causal (mask=None + is_causal → sdpa causal path). The
    # original model and the reference implementation are non-causal —
    # pin the oracle to eager attention.
    model.set_attn_implementation("eager")
    model.eval()
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


def _mm_inputs():
    rng = np.random.default_rng(0)
    # Global + one sub crop at 56x56 (4x4 patches -> bfs 2).
    pixels = rng.standard_normal((1, 2, 3, 56, 56)).astype(np.float32)
    sizes = np.asarray([[56, 56]], np.int64)
    mask = np.ones((1, 2, 4, 4), np.float32)
    audio = rng.standard_normal((1, 64, 80)).astype(np.float32)
    return pixels, sizes, mask, audio


def test_phi4mm_full_logits_parity(ckpt):
    model_dir, hf = ckpt
    pixels, sizes, mask, audio = _mm_inputs()
    n_img = 13   # sub 2*(2+1) + global separator + global 2*(2+1)
    n_aud = 8    # 64 frames / time_reduction 8
    ids = [1] + [IMG_TOK] * n_img + [5] + [AUD_TOK] * n_aud + [9, 11]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 image_pixel_values=torch.tensor(pixels),
                 image_sizes=torch.tensor(sizes),
                 image_attention_mask=torch.tensor(mask),
                 audio_input_features=torch.tensor(audio),
                 audio_embed_sizes=torch.tensor([n_aud]),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(model_dir), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Phi4MultimodalForCausalLM"
    assert mc.image_token_id == IMG_TOK
    model, params = load_model(mc, "safetensors")

    T = len(ids)
    feats = model.encode_mm(params, {
        "image_pixel_values": pixels, "image_sizes": sizes,
        "image_attention_mask": mask, "audio_input_features": audio,
        "audio_embed_sizes": [n_aud], "_input_ids": np.asarray(ids)})
    assert feats.shape == (n_img + n_aud, mc.hidden_size)
    mm_mask = np.isin(np.asarray(ids), [IMG_TOK, AUD_TOK])
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
                      jnp.arange(T, dtype=jnp.int32), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))


def test_phi4mm_image_features_match_hf(ckpt):
    model_dir, hf = ckpt
    pixels, sizes, mask, _ = _mm_inputs()
    n_img = 13
    ids = [1] + [IMG_TOK] * n_img + [5]
    with torch.no_grad():
        emb = hf.model.embed_tokens(torch.tensor([ids]))
        ref = hf.model.embed_tokens_extend.image_embed(
            torch.tensor([ids]), emb,
            image_pixel_values=torch.tensor(pixels),
            image_sizes=torch.tensor(sizes),
            image_attention_mask=torch.tensor(mask))
    ref = ref[0].float().numpy()[1:1 + n_img]
    mc = load_model_config(str(model_dir), max_model_len=64,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = model._image_rows(params, {
        "image_pixel_values": pixels, "image_sizes": sizes,
        "image_attention_mask": mask})
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_phi4mm_audio_features_match_hf(ckpt):
    model_dir, hf = ckpt
    _, _, _, audio = _mm_inputs()
    n_aud = 8
    ids = [1] + [AUD_TOK] * n_aud + [5]
    with torch.no_grad():
        emb = hf.model.embed_tokens(torch.tensor([ids]))
        ref = hf.model.embed_tokens_extend.audio_embed(
            torch.tensor([ids]), emb,
            audio_input_features=torch.tensor(audio),
            audio_embed_sizes=torch.tensor([n_aud]),
            audio_projection_mode="speech")
    ref = ref[0].float().numpy()[1:1 + n_aud]
    mc = load_model_config(str(model_dir), max_model_len=64,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = model._audio_rows(params, {
        "audio_input_features": audio, "audio_embed_sizes": [n_aud]},
        vision_mode=False)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
