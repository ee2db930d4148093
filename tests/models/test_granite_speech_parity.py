"""GraniteSpeech parity vs transformers
GraniteSpeechForConditionalGeneration: conformer encoder + Q-Former
window projector features and full logits with audio spliced."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

AUD_TOK = 63


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("granite_speech")
    c = transformers.models.granite_speech.configuration_granite_speech
    ec = c.GraniteSpeechEncoderConfig(
        input_dim=24, num_layers=2, hidden_dim=32, feedforward_mult=2,
        num_heads=2, dim_head=16, output_dim=10, context_size=8,
        max_pos_emb=16, conv_kernel_size=3, conv_expansion_factor=2)
    pc = transformers.Blip2QFormerConfig(
        hidden_size=32, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, cross_attention_frequency=1,
        encoder_hidden_size=32)
    tc = transformers.GraniteConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        logits_scaling=2.0, embedding_multiplier=1.5,
        residual_multiplier=0.5, attention_multiplier=0.08,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    cfg = c.GraniteSpeechConfig(
        encoder_config=ec.to_dict(), text_config=tc.to_dict(),
        projector_config=pc.to_dict(), downsample_rate=4, window_size=8,
        audio_token_index=AUD_TOK)
    torch.manual_seed(0)
    model = transformers.GraniteSpeechForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


def _audio():
    rng = np.random.default_rng(0)
    # 19 frames: exercises the attention remainder block (context 8)
    # and projector window padding (window 8 -> 3 blocks).
    return rng.standard_normal((1, 19, 24)).astype(np.float32)


def test_granite_speech_audio_features(ckpt):
    d, hf = ckpt
    feats = _audio()
    with torch.no_grad():
        ref = hf.get_audio_features(torch.tensor(feats))
    ref = ref[0].float().numpy()
    mc = load_model_config(d, max_model_len=64, dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = model.encode_mm(params, {"input_features": feats})
    np.testing.assert_allclose(ours, ref.reshape(ours.shape),
                               rtol=2e-3, atol=2e-3)


def test_granite_speech_full_logits(ckpt):
    d, hf = ckpt
    feats = _audio()
    n_aud = 6   # 3 blocks x (window 8 / downsample 4) queries
    ids = [1, 5] + [AUD_TOK] * n_aud + [9, 11]
    T = len(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 input_features=torch.tensor(feats),
                 attention_mask=torch.ones(1, T,
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(d, max_model_len=64, dtype="float32")
    assert mc.architecture == "GraniteSpeechForConditionalGeneration"
    assert mc.image_token_id == AUD_TOK
    model, params = load_model(mc, "safetensors")
    rows = model.encode_mm(params, {"input_features": feats})
    assert rows.shape[0] == n_aud
    mm_mask = np.asarray(ids) == AUD_TOK
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = rows

    caches = [model.make_layer_cache(i, 8, 16, jnp.float32, max_reqs=2)
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
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
