"""Molmo structural tests (trust-remote family, no transformers oracle):
vision pipeline geometry + pooling invariants + engine generation.
Reference spec: vllm models/molmo.py (encode_image:729, forward:747,
hf_to_vllm_mapper:1313)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.models.molmo import MolmoModel
from lvllm_tpu.sampling_params import SamplingParams

IMG = 62


def _mc():
    return ModelConfig(
        model="dummy", architecture="MolmoForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        image_token_id=IMG, seed=4,
        vision_config={"image_emb_dim": 32, "image_num_heads": 2,
                       "image_num_layers": 3, "image_mlp_dim": 64,
                       "image_default_input_size": (56, 56),
                       "image_patch_size": 14,
                       "vit_layers": (-1, -2)})


def test_molmo_vision_geometry():
    model = MolmoModel(_mc())
    params = model.init_params(0)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    out = np.asarray(model.encode_images(params, jnp.asarray(pix)))
    # 4x4 patches pooled 2x2 -> 4 tokens of text width.
    assert out.shape == (2, 4, 64)
    assert model.num_image_tokens == 4
    assert np.all(np.isfinite(out))
    # Per-image independence.
    out_b0 = np.asarray(model.encode_images(params, jnp.asarray(pix[:1])))
    np.testing.assert_allclose(out[0], out_b0[0], rtol=1e-4, atol=1e-5)
    # Pooling groups are spatially local: permuting two DISTANT patch
    # groups permutes the corresponding output tokens. Swap the top-left
    # and bottom-right 28x28 quadrants (each one pooled group).
    pix2 = pix.copy()
    pix2[:, :, :28, :28], pix2[:, :, 28:, 28:] = \
        pix[:, :, 28:, 28:], pix[:, :, :28, :28].copy()
    out2 = np.asarray(model.encode_images(params, jnp.asarray(pix2)))
    # Token order is raster over pooled groups: [TL, TR, BL, BR].
    np.testing.assert_allclose(out2[:, 0], out[:, 3], rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(out2[:, 3], out[:, 0], rtol=2e-3,
                               atol=2e-3)


def test_molmo_engine_generates():
    cfg = EngineConfig(
        model_config=_mc(),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2,
                                         max_model_len=128))
    eng = LLMEngine(cfg, load_format="dummy")
    rng = np.random.default_rng(1)
    ids = [1] + [IMG] * 4 + [5, 9]
    eng.add_request("mo", ids, SamplingParams(temperature=0.0,
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
    assert len(outs["mo"].outputs[0].token_ids) == 6
