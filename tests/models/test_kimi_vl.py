"""Kimi-VL structural tests (trust-remote-code family, no transformers
oracle in this image): MoonViT 2D-rope/merge math self-checks + engine
generation. Reference spec: vllm models/moonvit.py Rope2DPosEmb:218,
patch_merger:504; kimi_vl.py KimiVLMultiModalProjector:94."""

import numpy as np
import pytest

import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.models.kimi_vl import (KimiVLModel, _apply_rope_2d,
                                      moonvit_rope_cos_sin)
from lvllm_tpu.sampling_params import SamplingParams

IMG = 61


def _mc():
    return ModelConfig(
        model="dummy", architecture="KimiVLForConditionalGeneration",
        dtype="float32", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=32, max_position_embeddings=256,
        max_model_len=128, eos_token_id=-1, image_token_id=IMG, seed=3,
        attention_type="mla", q_lora_rank=None, kv_lora_rank=16,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
        router_scoring_fn="sigmoid", partial_rotary_factor=8 / 32,
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "image_size": 56, "patch_size": 14,
                       "init_pos_emb_height": 4, "init_pos_emb_width": 4,
                       "merge_kernel_size": [2, 2]})


def test_moonvit_rope_interleaves_axes():
    cos, sin = moonvit_rope_cos_sin(16, 3, 5)
    assert cos.shape == (15, 8)
    # Even pair indices rotate with x (column), odd with y (row):
    # same row, different column -> even-pair angles change, odd stay.
    np.testing.assert_allclose(cos[0][1::2], cos[2][1::2])  # row 0
    assert not np.allclose(cos[0][0::2], cos[2][0::2])
    # Same column, different row -> odd change, even stay.
    np.testing.assert_allclose(cos[1][0::2], cos[1 + 5][0::2])
    assert not np.allclose(cos[1][1::2], cos[1 + 5][1::2])
    # Rotation preserves norm.
    rng = np.random.default_rng(0)
    x = rng.standard_normal((15, 2, 16)).astype(np.float32)
    y = np.asarray(_apply_rope_2d(jnp.asarray(x), jnp.asarray(cos),
                                  jnp.asarray(sin)))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_kimi_vl_encode_geometry():
    model = KimiVLModel(_mc())
    params = model.init_params(0)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    out = np.asarray(model.encode_images(params, jnp.asarray(pix)))
    # 4x4 patches merged 2x2 -> 4 tokens of text width.
    assert out.shape == (1, 4, 64)
    assert model.num_image_tokens == 4
    assert np.all(np.isfinite(out))
    # Position interpolation path: larger grid than the learnable table.
    pix2 = rng.standard_normal((1, 3, 56 * 2, 56 * 2)).astype(np.float32)
    model.image_size = 112
    out2 = np.asarray(model.encode_images(params, jnp.asarray(pix2)))
    assert out2.shape == (1, 16, 64)


def test_kimi_vl_engine_generates():
    cfg = EngineConfig(
        model_config=_mc(),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2,
                                         max_model_len=128))
    eng = LLMEngine(cfg, load_format="dummy")
    rng = np.random.default_rng(1)
    ids = [1] + [IMG] * 4 + [5, 9]
    eng.add_request("k0", ids, SamplingParams(temperature=0.0,
                                              max_tokens=6),
                    mm_data={"pixel_values":
                             rng.standard_normal((1, 3, 56, 56))
                             .astype(np.float32)})
    outs, steps = {}, 0
    while eng.has_unfinished_requests() and steps < 60:
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
    assert len(outs["k0"].outputs[0].token_ids) == 6
