"""Gemma 3n multimodal parity: USM conformer audio tower + modality
embedders vs the standalone HF modules (the Conditional wrapper itself
is not constructible without timm's MobileNetV5 vision tower — the
oracle composes Gemma3nAudioEncoder + Gemma3nMultimodalEmbedder +
Gemma3nForCausalLM exactly as HF Gemma3nModel.forward does)."""

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

VIS_OFF, AUD_OFF = 60, 68
IMG_TOK, AUD_TOK = 61, 69
N_SOFT = 6


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("gemma3n_mm")
    c = transformers.models.gemma3n.configuration_gemma3n
    m = transformers.models.gemma3n.modeling_gemma3n
    tc = c.Gemma3nTextConfig(
        vocab_size=76, vocab_size_per_layer_input=48, hidden_size=32,
        hidden_size_per_layer_input=8, intermediate_size=[48] * 4,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, altup_num_inputs=4,
        laurel_rank=4, num_kv_shared_layers=2,
        activation_sparsity_pattern=[0.95, 0.0, 0.0, 0.0],
        layer_types=["sliding_attention", "full_attention"] * 2,
        sliding_window=8, max_position_embeddings=128,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        pad_token_id=0)
    ac = c.Gemma3nAudioConfig(
        hidden_size=32, input_feat_size=12, conf_num_hidden_layers=2,
        conf_num_attention_heads=2, conf_attention_chunk_size=4,
        conf_attention_context_left=3, conf_attention_context_right=1,
        conf_conv_kernel_size=3, conf_reduction_factor=2,
        sscp_conv_channel_size=(8, 4), vocab_offset=AUD_OFF,
        vocab_size=8)
    vcfg = c.Gemma3nVisionConfig(hidden_size=16, vocab_offset=VIS_OFF,
                                 vocab_size=8)
    torch.manual_seed(0)
    text = transformers.Gemma3nForCausalLM(tc).eval()
    tower = m.Gemma3nAudioEncoder(ac).eval()
    embed_audio = m.Gemma3nMultimodalEmbedder(ac, tc).eval()
    embed_vision = m.Gemma3nMultimodalEmbedder(vcfg, tc).eval()

    sd = {}
    for k, w in text.state_dict().items():
        if k == "lm_head.weight":
            continue
        sd["model.language_model." + k.removeprefix("model.")] = \
            w.contiguous()
    for mod, pref in ((tower, "model.audio_tower."),
                      (embed_audio, "model.embed_audio."),
                      (embed_vision, "model.embed_vision.")):
        for k, w in mod.state_dict().items():
            sd[pref + k] = w.contiguous()
    from safetensors.torch import save_file
    save_file(sd, os.path.join(str(d), "model.safetensors"))
    cfg = {"architectures": ["Gemma3nForConditionalGeneration"],
           "model_type": "gemma3n",
           "text_config": tc.to_dict(), "audio_config": ac.to_dict(),
           "vision_config": vcfg.to_dict(),
           "audio_token_id": AUD_TOK, "image_token_id": IMG_TOK,
           "audio_soft_tokens_per_image": N_SOFT,
           "boi_token_id": 58, "boa_token_id": 59}
    with open(os.path.join(str(d), "config.json"), "w") as f:
        json.dump(cfg, f, default=str)
    return str(d), text, tower, embed_audio, embed_vision


def _mel():
    rng = np.random.default_rng(0)
    return rng.standard_normal((1, 32, 12)).astype(np.float32) * 0.5


def test_gemma3n_audio_soft_tokens_match_hf(ckpt):
    d, text, tower, embed_audio, _ = ckpt
    mel = _mel()
    with torch.no_grad():
        enc, out_mask = tower(torch.tensor(mel),
                              torch.zeros(1, 32, dtype=torch.bool))
        soft = embed_audio(inputs_embeds=enc)
        pad = embed_audio(
            input_ids=torch.tensor([[AUD_OFF + 7]]))
        soft = torch.where(out_mask.unsqueeze(-1), pad, soft)
        extra = N_SOFT - soft.shape[1]
        if extra > 0:
            soft = torch.cat(
                [soft, pad.expand(1, extra, soft.shape[-1])], dim=1)
    ref = soft[0].float().numpy()

    mc = load_model_config(d, max_model_len=64, dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = model.encode_mm(params, {"input_features": mel})
    np.testing.assert_allclose(ours, ref.reshape(ours.shape),
                               rtol=2e-3, atol=2e-3)


def test_gemma3n_mm_full_logits(ckpt):
    d, text, tower, embed_audio, embed_vision = ckpt
    mel = _mel()
    # text + hard vision tokens + audio placeholders + text tail
    ids = [1, 5, VIS_OFF + 2, VIS_OFF + 3] + [AUD_TOK] * N_SOFT + [9, 11]
    T = len(ids)
    ids_t = torch.tensor([ids])
    with torch.no_grad():
        embeds = text.model.embed_tokens(ids_t)
        vis_mask = (ids_t >= VIS_OFF) & (ids_t < AUD_OFF)
        aud_mask = ids_t >= AUD_OFF
        vis_ids = torch.where(vis_mask, ids_t, VIS_OFF + 7)
        embeds = torch.where(vis_mask.unsqueeze(-1),
                             embed_vision(input_ids=vis_ids), embeds)
        aud_ids = torch.where(aud_mask, ids_t, AUD_OFF + 7)
        embeds = torch.where(aud_mask.unsqueeze(-1),
                             embed_audio(input_ids=aud_ids), embeds)
        enc, out_mask = tower(torch.tensor(mel),
                              torch.zeros(1, 32, dtype=torch.bool))
        soft = embed_audio(inputs_embeds=enc)
        pad = embed_audio(input_ids=torch.tensor([[AUD_OFF + 7]]))
        soft = torch.where(out_mask.unsqueeze(-1), pad, soft)
        extra = N_SOFT - soft.shape[1]
        if extra > 0:
            soft = torch.cat(
                [soft, pad.expand(1, extra, soft.shape[-1])], dim=1)
        placeholder = ids_t == AUD_TOK
        embeds = embeds.masked_scatter(
            placeholder.unsqueeze(-1), soft.to(embeds.dtype))
        masked_ids = torch.where(ids_t < 48, ids_t,
                                 torch.zeros_like(ids_t))
        pl = text.model.get_per_layer_inputs(masked_ids)
        out = text.model(inputs_embeds=embeds, per_layer_inputs=pl,
                         attention_mask=torch.ones(1, T,
                                                   dtype=torch.long))
        logits = text.lm_head(out.last_hidden_state)
        cap = text.config.final_logit_softcapping
        if cap:
            logits = torch.tanh(logits / cap) * cap
    ref = logits[0].float().numpy()

    mc = load_model_config(d, max_model_len=64, dtype="float32")
    assert mc.architecture == "Gemma3nForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    feats = model.encode_mm(params, {"input_features": mel})
    mm_mask = np.asarray(ids) == AUD_TOK
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = feats

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
