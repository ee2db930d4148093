"""Qwen2.5-Omni thinker parity vs transformers: windowed audio tower
features, TMRoPE positions, and full logits with audio+image spliced."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

AUD_TOK, IMG_TOK, VID_TOK = 50, 51, 52
AUD_BOS, AUD_EOS, VIS_BOS, VIS_EOS = 53, 54, 55, 56


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("omni")
    c = transformers.models.qwen2_5_omni.configuration_qwen2_5_omni
    ac = c.Qwen2_5OmniAudioEncoderConfig(
        d_model=32, encoder_attention_heads=2, encoder_layers=2,
        encoder_ffn_dim=64, num_mel_bins=12, max_source_positions=64,
        n_window=8, output_dim=48)
    vc = c.Qwen2_5OmniVisionEncoderConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        window_size=28, fullatt_block_indexes=[1], out_hidden_size=48,
        in_channels=3)
    tc = c.Qwen2_5OmniTextConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rope_scaling={"rope_type": "default",
                      "mrope_section": [2, 2, 2]})
    cfg = c.Qwen2_5OmniThinkerConfig(
        audio_config=ac.to_dict(), vision_config=vc.to_dict(),
        text_config=tc.to_dict(), audio_token_index=AUD_TOK,
        image_token_index=IMG_TOK, video_token_index=VID_TOK,
        audio_start_token_index=AUD_BOS, audio_end_token_index=AUD_EOS,
        vision_start_token_id=VIS_BOS, vision_end_token_id=VIS_EOS,
        position_id_per_seconds=25, seconds_per_chunk=2)
    cfg.vision_start_token_id = VIS_BOS
    cfg.audio_start_token_id = AUD_BOS
    torch.manual_seed(0)
    model = transformers.Qwen2_5OmniThinkerForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


def _audio():
    rng = np.random.default_rng(0)
    # 37 mel frames: 3 window chunks of 16 + tail 5; after cnn 19;
    # after pool 9 tokens.
    feats = rng.standard_normal((1, 12, 40)).astype(np.float32)
    fam = np.zeros((1, 40), np.int64)
    fam[0, :37] = 1
    return feats, fam


def _image():
    rng = np.random.default_rng(1)
    # one 28x28 image -> grid (1, 2, 2) -> 1 merged token
    grid = np.asarray([[1, 2, 2]], np.int64)
    pix = rng.standard_normal((4, 3 * 2 * 14 * 14)).astype(np.float32)
    return pix, grid


def test_omni_audio_features(ckpt):
    d, hf = ckpt
    feats, fam = _audio()
    with torch.no_grad():
        ref = hf.get_audio_features(
            torch.tensor(feats),
            feature_attention_mask=torch.tensor(fam))
    ref = ref.float().numpy()
    mc = load_model_config(d, max_model_len=64, dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = model._audio_rows(params, {
        "input_features": feats, "feature_attention_mask": fam})
    np.testing.assert_allclose(ours, ref.reshape(ours.shape),
                               rtol=2e-3, atol=2e-3)


def test_omni_full_logits(ckpt):
    d, hf = ckpt
    feats, fam = _audio()
    pix, grid = _image()
    n_aud, n_img = 9, 1
    ids = [1, 5, AUD_BOS] + [AUD_TOK] * n_aud + [AUD_EOS, 7, VIS_BOS] \
        + [IMG_TOK] * n_img + [VIS_EOS, 9, 11]
    T = len(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 input_features=torch.tensor(feats),
                 feature_attention_mask=torch.tensor(fam),
                 pixel_values=torch.tensor(pix),
                 image_grid_thw=torch.tensor(grid),
                 attention_mask=torch.ones(1, T,
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(d, max_model_len=64, dtype="float32")
    assert mc.architecture == \
        "Qwen2_5OmniThinkerForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    mm_data = {"input_features": feats, "feature_attention_mask": fam,
               "pixel_values": pix, "image_grid_thw": grid,
               "_input_ids": np.asarray(ids)}
    rows = model.encode_mm(params, mm_data)
    assert rows.shape[0] == n_aud + n_img
    pos3, delta = model.mm_positions(ids, mm_data)
    assert pos3.shape == (3, T)

    mm_mask = np.isin(np.asarray(ids), [AUD_TOK, IMG_TOK])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = rows
    caches = [model.make_layer_cache(i, 8, 32, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(32 + jnp.arange(T)).astype(jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(pos3, jnp.int32), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
