"""ColPali / ColQwen3 vision late interaction.

ColPali has a direct transformers oracle (ColPaliForRetrieval): document
image + text through the full loader must reproduce HF's normalized
per-token embeddings. ColQwen3 is exercised structurally (projection +
M-RoPE positions + feature splice) on a dummy Qwen3-VL backbone.
Reference: vllm models/colpali.py, models/colqwen3.py:120-197.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.config import ModelConfig  # noqa: E402
from lvllm_tpu.engine.pooling import PoolingRunner  # noqa: E402
from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.registry import build_model  # noqa: E402

IMG_TOK = 61


def test_colpali_parity_vs_hf(tmp_path):
    vc = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=48)
    tc = transformers.GemmaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=128, rope_theta=10000.0)
    vlm = transformers.PaliGemmaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        projection_dim=48)
    cfg = transformers.ColPaliConfig(vlm_config=vlm, embedding_dim=24)
    torch.manual_seed(2)
    hf = transformers.ColPaliForRetrieval(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ids = [IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 2, 5, 9, 11]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 attention_mask=torch.ones(1, len(ids), dtype=torch.long),
                 ).embeddings[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "ColPaliForRetrieval"
    assert mc.colbert_dim == 24
    model, params = load_model(mc, "safetensors")
    runner = PoolingRunner(model, params, block_size=16, max_tokens=256)
    mats = runner.embed_token_level(
        [ids], [{"pixel_values": pixels}])
    np.testing.assert_allclose(mats[0], ref, rtol=3e-3, atol=3e-3)

    # Text-only query path.
    q = [2, 5, 9]
    with torch.no_grad():
        refq = hf(input_ids=torch.tensor([q]),
                  attention_mask=torch.ones(1, 3, dtype=torch.long),
                  ).embeddings[0].float().numpy()
    matq = runner.embed_token_level([q])
    np.testing.assert_allclose(matq[0], refq, rtol=3e-3, atol=3e-3)


def test_colqwen3_structural():
    mc = ModelConfig(
        model="dummy", architecture="ColQwen3", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=0, colbert_dim=24, image_token_id=IMG_TOK,
        vision_start_token_id=60, mrope_section=(2, 3, 3),
        max_position_embeddings=256, max_model_len=128,
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "depth": 2, "num_heads": 2, "patch_size": 14,
                       "spatial_merge_size": 2, "temporal_patch_size": 1,
                       "out_hidden_size": 64,
                       "deepstack_visual_indexes": []})
    model = build_model(mc)
    params = model.init_params(0)
    rngk = np.random.default_rng(3)
    params["colbert"]["kernel"] = jnp.asarray(
        rngk.standard_normal((64, 24)) * 0.1, jnp.float32)
    runner = PoolingRunner(model, params, block_size=16, max_tokens=256)
    pix = np.random.default_rng(1).standard_normal(
        (4, 3 * 1 * 14 * 14)).astype(np.float32)
    mm = {"pixel_values": pix,
          "image_grid_thw": np.asarray([[1, 2, 2]], np.int64)}
    ids = [1, 60, IMG_TOK, 5, 9]
    mats = runner.embed_token_level([ids, [1, 2, 3]], [mm, None])
    assert mats[0].shape == (5, 24) and mats[1].shape == (3, 24)
    assert all(np.isfinite(m).all() for m in mats)
    norms = np.linalg.norm(mats[0], axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    # The spliced image feature must influence its row's embedding.
    mm2 = {"pixel_values": pix + 1.0,
           "image_grid_thw": np.asarray([[1, 2, 2]], np.int64)}
    mats2 = runner.embed_token_level([ids], [mm2])
    assert np.abs(mats2[0][2] - mats[0][2]).max() > 1e-4


def test_bee_widened_projector_and_opencua_alias():
    """Bee projector = pre-LN + 4x-wide GELU MLP (reference bee.py:111);
    OpenCUA registers onto the Qwen2.5-VL implementation."""
    from lvllm_tpu.models.llava_onevision import BeeModel
    from lvllm_tpu.models.registry import get_model_class
    from lvllm_tpu.models.qwen2_vl import Qwen2VLModel
    assert get_model_class("OpenCUAForConditionalGeneration") \
        is Qwen2VLModel

    mc = ModelConfig(
        model="dummy", architecture="BeeForConditionalGeneration",
        dtype="float32", vocab_size=64, hidden_size=48,
        intermediate_size=96, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, num_experts=0, qk_norm=False,
        image_token_id=61, max_position_embeddings=128, max_model_len=64,
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 1, "num_attention_heads": 2,
                       "image_size": 28, "patch_size": 14})
    model = BeeModel(mc)
    params = model.init_params(0)
    pj = params["vision"]["projector"]
    assert pj["linear_1"]["kernel"].shape == (32, 4 * 48)
    assert pj["linear_2"]["kernel"].shape == (4 * 48, 48)
    assert "pre_norm" in pj
    rng = np.random.default_rng(5)
    pj["pre_norm"]["weight"] = jnp.asarray(
        rng.random(32).astype(np.float32) + 0.5)
    pj["pre_norm"]["bias"] = jnp.asarray(
        rng.standard_normal(32).astype(np.float32) * 0.1)
    feats = rng.standard_normal((3, 32)).astype(np.float32)
    from lvllm_tpu.models.vision import project_image_features
    got = np.asarray(project_image_features(pj, jnp.asarray(feats)))
    x = torch.tensor(feats)
    x = torch.nn.functional.layer_norm(
        x, (32,), torch.tensor(np.asarray(pj["pre_norm"]["weight"])),
        torch.tensor(np.asarray(pj["pre_norm"]["bias"])), eps=1e-6)
    x = torch.nn.functional.gelu(
        x @ torch.tensor(np.asarray(pj["linear_1"]["kernel"])) +
        torch.tensor(np.asarray(pj["linear_1"]["bias"])))
    want = (x @ torch.tensor(np.asarray(pj["linear_2"]["kernel"])) +
            torch.tensor(np.asarray(pj["linear_2"]["bias"]))).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
