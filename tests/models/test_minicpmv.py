"""MiniCPM-V structural tests (the HF implementation is remote-code only,
so no transformers oracle exists in this image): resampler math
self-checks + engine-level generation with the image splice.

Reference spec: vllm models/minicpmv.py Resampler2_5.forward:198 +
layers/resampler.py BaseResampler:156."""

import numpy as np
import pytest

import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.models.minicpmv import MiniCPMVModel, sincos_2d_pos_embed
from lvllm_tpu.sampling_params import SamplingParams

IMG = 60


def _mc():
    return ModelConfig(
        model="dummy", architecture="MiniCPMV", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        image_token_id=IMG, seed=2,
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "image_size": 28, "patch_size": 14,
                       "query_num": 4})


def test_sincos_pos_embed_properties():
    pe = sincos_2d_pos_embed(64, 5, 7)
    assert pe.shape == (5, 7, 64)
    # Row embedding constant along w in the first half; col along h in
    # the second half (concat [emb_h | emb_w]).
    assert np.allclose(pe[:, 0, :32], pe[:, 3, :32])
    assert np.allclose(pe[0, :, 32:], pe[3, :, 32:])
    # Position 0 -> sin 0, cos 1 pattern.
    assert np.allclose(pe[0, 0, :16], 0.0, atol=1e-7)
    assert np.allclose(pe[0, 0, 16:32], 1.0, atol=1e-7)


def test_resampler_output_geometry_and_attention_law():
    model = MiniCPMVModel(_mc())
    params = model.init_params(0)
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    out = np.asarray(model.encode_images(params, jnp.asarray(pix)))
    assert out.shape == (2, 4, 64)          # query_num x hidden
    assert np.all(np.isfinite(out))
    # Scaling all key/value features identically shifts outputs smoothly
    # (cross-attention mixes values): different inputs -> different out.
    out2 = np.asarray(model.encode_images(params, jnp.asarray(pix * 2)))
    assert not np.allclose(out, out2)
    # Per-image independence: batch entry 0 unaffected by entry 1.
    out_b0 = np.asarray(model.encode_images(params,
                                            jnp.asarray(pix[:1])))
    np.testing.assert_allclose(out[0], out_b0[0], rtol=1e-4, atol=1e-5)


def test_minicpmv_engine_generates():
    cfg = EngineConfig(
        model_config=_mc(),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2,
                                         max_model_len=128))
    eng = LLMEngine(cfg, load_format="dummy")
    rng = np.random.default_rng(1)
    ids = [1] + [IMG] * 4 + [5, 9]
    eng.add_request("m0", ids, SamplingParams(temperature=0.0,
                                              max_tokens=6),
                    mm_data={"pixel_values":
                             rng.standard_normal((1, 3, 28, 28))
                             .astype(np.float32)})
    outs, steps = {}, 0
    while eng.has_unfinished_requests() and steps < 60:
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
    assert len(outs["m0"].outputs[0].token_ids) == 6


def test_minicpmo_alias_registers():
    from lvllm_tpu.models.registry import get_model_class
    assert get_model_class("MiniCPMO") is MiniCPMVModel
