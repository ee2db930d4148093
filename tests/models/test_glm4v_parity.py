"""GLM-4.1V (Glm4vForConditionalGeneration) parity vs transformers.

Covers the full stack: EVA-style tower (bicubic pos-embed interpolation,
per-frame attention, spatial-merge downsample, gated merger), Glm4 text
layer (sandwich norms, interleaved partial M-RoPE), and the engine merge.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.glm4v import bicubic_pos_embed_taps  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 500   # must be < the tiny test vocab


def test_bicubic_taps_match_torch_grid_sample():
    """The 16-tap plan reproduces F.grid_sample bicubic/border exactly,
    including a non-integer resize (4x4 table sampled on a 6x5 grid)."""
    rng = np.random.default_rng(0)
    orig = 4
    table = rng.standard_normal((orig * orig, 8)).astype(np.float32)
    th, tw = 6, 5
    hc = np.repeat(np.arange(th), tw).astype(np.float32)
    wc = np.tile(np.arange(tw), th).astype(np.float32)
    L = th * tw
    idx, wgt = bicubic_pos_embed_taps(orig, np.full(L, float(th)),
                                      np.full(L, float(tw)), hc, wc)
    ours = (table[idx] * wgt[:, :, None]).sum(axis=1)

    t2d = torch.tensor(table).view(orig, orig, 8).permute(2, 0, 1)[None]
    norm_w = torch.tensor(((wc + 0.5) / tw) * 2 - 1)
    norm_h = torch.tensor(((hc + 0.5) / th) * 2 - 1)
    grid = torch.stack((norm_w, norm_h), dim=-1)[None, :, None, :]
    ref = torch.nn.functional.grid_sample(
        t2d, grid.float(), mode="bicubic", align_corners=False,
        padding_mode="border")[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def _hf_model(tmp_path):
    cfg = transformers.Glm4vConfig(
        text_config=dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2,
            rope_scaling={"type": "default", "mrope_section": [2, 3, 3]},
            max_position_embeddings=128),
        vision_config=dict(
            hidden_size=32, out_hidden_size=64, intermediate_size=48,
            depth=2, num_heads=4, image_size=28, patch_size=14,
            spatial_merge_size=2, temporal_patch_size=2),
        image_token_id=IMG_TOK)
    torch.manual_seed(0)
    model = transformers.Glm4vForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def _patches(rng, t, h, w, ps=14, tps=2):
    """HF-processor-layout patches [t*h*w, C*tps*ps*ps] in merged order."""
    return rng.standard_normal((t * h * w, 3 * tps * ps * ps)).astype(
        np.float32)


def test_glm4v_image_features_match_hf(tmp_path):
    hf = _hf_model(tmp_path)
    rng = np.random.default_rng(1)
    grids = np.array([[1, 2, 2]], np.int64)
    pix = _patches(rng, 1, 2, 2)
    with torch.no_grad():
        ref = hf.model.visual(torch.tensor(pix),
                              torch.tensor(grids)).float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.architecture == "Glm4vForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    ours = model.encode_mm(params, {"pixel_values": pix,
                                    "image_grid_thw": grids})
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


def test_glm4v_logits_parity(tmp_path):
    hf = _hf_model(tmp_path)
    rng = np.random.default_rng(0)
    grids = np.array([[1, 2, 2]], np.int64)
    pix = _patches(rng, 1, 2, 2)
    # 2x2 patches merge 2x2 -> 1 image token.
    ids = [3, IMG_TOK, 7, 11, 13, 17]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pix),
                 image_grid_thw=torch.tensor(grids),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.image_token_id == IMG_TOK
    assert mc.mrope_section == (2, 3, 3)
    model, params = load_model(mc, "safetensors")
    mm = {"pixel_values": pix, "image_grid_thw": grids}
    feats = model.encode_mm(params, mm)
    pos3, delta = model.mm_positions(np.asarray(ids), mm)
    T = len(ids)
    mm_mask = np.asarray([t == IMG_TOK for t in ids])
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
                      jnp.asarray(pos3), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=8e-3, atol=8e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))


def test_glm4v_moe_logits_parity(tmp_path):
    """GLM-4.5V (Glm4vMoe): Glm4Moe text (sigmoid router, shared experts,
    first-k dense) + the shared tower, standard partial M-RoPE."""
    cfg = transformers.Glm4vMoeConfig(
        text_config=dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, n_routed_experts=8,
            num_experts_per_tok=2, moe_intermediate_size=32,
            n_shared_experts=1, first_k_dense_replace=1,
            # partial_rotary 0.5 of head_dim 16 → rot 8; sections sum 4.
            rope_scaling={"type": "default", "mrope_section": [1, 1, 2]},
            max_position_embeddings=128),
        vision_config=dict(
            hidden_size=32, out_hidden_size=64, intermediate_size=48,
            depth=2, num_heads=4, image_size=28, patch_size=14,
            spatial_merge_size=2, temporal_patch_size=2),
        image_token_id=IMG_TOK)
    torch.manual_seed(0)
    hf = transformers.Glm4vMoeForConditionalGeneration(cfg)
    hf.eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    grids = np.array([[1, 2, 2]], np.int64)
    pix = _patches(rng, 1, 2, 2)
    ids = [3, IMG_TOK, 7, 11, 13, 17]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pix),
                 image_grid_thw=torch.tensor(grids),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.architecture == "Glm4vMoeForConditionalGeneration"
    assert not mc.rope_interleaved          # standard rope for the MoE text
    model, params = load_model(mc, "safetensors")
    mm = {"pixel_values": pix, "image_grid_thw": grids}
    feats = model.encode_mm(params, mm)
    pos3, _ = model.mm_positions(np.asarray(ids), mm)
    T = len(ids)
    mm_mask = np.asarray([t == IMG_TOK for t in ids])
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
                      jnp.asarray(pos3), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=8e-3, atol=8e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
