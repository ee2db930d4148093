"""/v1/audio/transcriptions endpoint over a tiny Whisper checkpoint
(reference: entrypoints/openai/serving_transcription.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
aiohttp_test = pytest.importorskip("aiohttp.test_utils")
import transformers  # noqa: E402

from lvllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig  # noqa: E402
from lvllm_tpu.engine.async_llm import AsyncLLM  # noqa: E402
from lvllm_tpu.entrypoints.openai_server import OpenAIServer  # noqa: E402
from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402


class IdTokenizer:
    eos_token_id = 2

    def encode(self, text, add_special_tokens=False):
        return [int(x) for x in text.split()]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(t) for t in ids)


@pytest.fixture()
def whisper_dir(tmp_path):
    cfg = transformers.WhisperConfig(
        vocab_size=128, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=16,
        max_source_positions=32, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None)
    torch.manual_seed(0)
    m = transformers.WhisperForConditionalGeneration(cfg)
    m.eval()
    m.save_pretrained(str(tmp_path), safe_serialization=True)
    return str(tmp_path)


def test_transcription_endpoint(whisper_dir):
    import asyncio
    asyncio.run(_run_transcription(whisper_dir))


async def _run_transcription(whisper_dir):
    mc = load_model_config(whisper_dir, max_model_len=64, dtype="float32")
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2, max_model_len=64))
    llm = AsyncLLM(cfg, load_format="safetensors", tokenizer=IdTokenizer())
    srv = OpenAIServer(llm, tool_parser=None, enable_reasoning=False)
    client = aiohttp_test.TestClient(aiohttp_test.TestServer(srv.app))
    await client.start_server()
    try:
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((1, 16, 64)).astype(np.float32)
        r = await client.post("/v1/audio/transcriptions", json={
            "input_features": feats.tolist(),
            "prompt_ids": [3, 7],
            "max_tokens": 6})
        assert r.status == 200, await r.text()
        body = await r.json()
        assert len(body["token_ids"]) >= 1
        assert body["text"]
        # Determinism: same audio → same transcription.
        r2 = await client.post("/v1/audio/transcriptions", json={
            "input_features": feats.tolist(),
            "prompt_ids": [3, 7],
            "max_tokens": 6})
        assert (await r2.json())["token_ids"] == body["token_ids"]
    finally:
        await client.close()
