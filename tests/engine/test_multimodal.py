"""Multimodal engine end-to-end: greedy generations match HF generate,
including chunked prefill across the image-token span."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from lvllm_tpu.config import (CacheConfig, EngineConfig,  # noqa: E402
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine  # noqa: E402
from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.sampling_params import SamplingParams  # noqa: E402

IMG_TOK = 63


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("llava")
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14)
    tc = transformers.LlamaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.LlavaConfig(vision_config=vc, text_config=tc,
                                   image_token_index=IMG_TOK)
    torch.manual_seed(0)
    model = transformers.LlavaForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d), model


def _engine(model_dir, max_batched=64):
    mc = load_model_config(model_dir, max_model_len=96, dtype="float32")
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=max_batched,
                                         max_num_seqs=2, max_model_len=96),
    )
    return LLMEngine(cfg, load_format="safetensors")


def _generate(engine, ids, pixels, n=6):
    engine.add_request("m0", ids,
                       SamplingParams(temperature=0.0, max_tokens=n),
                       mm_data={"pixel_values": pixels})
    outs, steps = [], 0
    while engine.has_unfinished_requests() and steps < 40:
        outs.extend(o for o in engine.step() if o.finished)
        steps += 1
    return outs[0].outputs[0].token_ids


def test_engine_matches_hf_generate(ckpt):
    model_dir, hf = ckpt
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ids = [1, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 5, 9, 11, 30, 31]

    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixels),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=6, do_sample=False)
    ref_new = ref[0, len(ids):].tolist()

    got = _generate(_engine(model_dir), ids, pixels)
    assert got == ref_new


def test_chunked_prefill_across_image_span(ckpt):
    """Prefill chunk boundary inside the image-token run still splices the
    right features (feature index derived from prompt position)."""
    model_dir, hf = ckpt
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ids = [2, 3] + [IMG_TOK] * 4 + list(range(4, 20))
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixels),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=5, do_sample=False)
    ref_new = ref[0, len(ids):].tolist()
    # Budget 16 splits the 22-token prompt mid-span (chunk 1 covers
    # tokens 0..15, cutting after two image tokens at pos 2..5? no —
    # chunk 1 = 16 tokens includes the whole span; use 4 to force a cut).
    got = _generate(_engine(model_dir, max_batched=4), ids, pixels, n=5)
    assert got == ref_new


def test_image_changes_output(ckpt):
    model_dir, _ = ckpt
    rng = np.random.default_rng(2)
    ids = [1, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 5]
    a = _generate(_engine(model_dir),
                  ids, rng.standard_normal((1, 3, 28, 28)).astype(
                      np.float32) * 3)
    b = _generate(_engine(model_dir),
                  ids, rng.standard_normal((1, 3, 28, 28)).astype(
                      np.float32) * -3)
    assert a != b


def test_placeholder_mismatch_rejected(ckpt):
    model_dir, _ = ckpt
    eng = _engine(model_dir)
    pixels = np.zeros((1, 3, 28, 28), np.float32)
    eng.add_request("bad", [1, IMG_TOK, 5],  # 1 placeholder vs 4 features
                    SamplingParams(temperature=0.0, max_tokens=2),
                    mm_data={"pixel_values": pixels})
    with pytest.raises(ValueError, match="placeholder"):
        eng.step()


def test_processor_cache_and_encoder_cache(ckpt):
    """Identical images across requests hit the processor cache
    (reference: multimodal processor cache); features free once the
    placeholder span is computed (encoder-cache manager)."""
    model_dir, _hf = ckpt
    engine = _engine(model_dir)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    n_img = 4  # (28/14)^2 patches
    ids = [1, 2] + [IMG_TOK] * n_img + [3, 4, 5]
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    engine.add_request("a", ids, sp, mm_data={"pixel_values": pixels})
    engine.add_request("b", list(ids), sp,
                       mm_data={"pixel_values": pixels.copy()})
    steps = 0
    while engine.has_unfinished_requests() and steps < 40:
        engine.step()
        steps += 1
    st = engine.core.runner.mm_stats
    assert st["processor_cache_misses"] == 1   # encoded once
    assert st["processor_cache_hits"] == 1     # second request reused
    assert st["encoder_cache_freed"] == 2      # both freed after prefill
    assert not engine.core.runner._mm_feats


def test_scheduler_encoder_budget(ckpt):
    """max_encoder_tokens_per_step defers multimodal admissions: two
    4-placeholder requests with a budget of 4 admit on different steps
    (reference: encoder budget, v1/core/sched/scheduler.py:1114)."""
    model_dir, _hf = ckpt
    mc = load_model_config(model_dir, max_model_len=96, dtype="float32")
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(
            max_num_batched_tokens=64, max_num_seqs=2, max_model_len=96,
            max_encoder_tokens_per_step=4),
    )
    engine = LLMEngine(cfg, load_format="safetensors")
    rng = np.random.default_rng(1)
    sp = SamplingParams(temperature=0.0, max_tokens=2)
    ids = [1, 2] + [IMG_TOK] * 4 + [3]
    for r in range(2):
        pix = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
        engine.add_request(f"e{r}", list(ids), sp,
                           mm_data={"pixel_values": pix})
    # First schedule: only one request admitted (budget 4 of 8 needed).
    so = engine.core.scheduler.schedule()
    assert len(so.scheduled_new_reqs) == 1
    out = engine.core.runner.execute_model(so)
    engine.core.scheduler.update_from_output(so, out)
    so2 = engine.core.scheduler.schedule()
    assert any(nr.req_id == "e1" for nr in so2.scheduled_new_reqs)
