"""EngineCoreProc / EngineCoreClient: engine core behind ZMQ in its own
process."""

import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.core_proc import EngineCoreClient
from lvllm_tpu.sampling_params import SamplingParams

pytest.importorskip("zmq")


def _config():
    return EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM",
            dtype="bfloat16", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=2, head_dim=32,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
    )


def test_remote_core_end_to_end(tmp_path):
    client = EngineCoreClient(
        _config(), load_format="dummy",
        addr_prefix=f"ipc://{tmp_path}/core", force_cpu=True)
    try:
        client.add_request("a", [1, 2, 3],
                           SamplingParams(temperature=0.0, max_tokens=6))
        client.add_request("b", [7, 8, 9, 10],
                           SamplingParams(temperature=0.0, max_tokens=6))
        outs = client.collect_finished(2, timeout_s=180)
        got = {o.request_id: o.outputs[0].token_ids for o in outs}
        assert set(got) == {"a", "b"}
        assert all(len(t) == 6 for t in got.values())
        stats = client.get_stats(timeout_s=60)
        assert "num_finished" in stats or isinstance(stats, dict)
    finally:
        client.shutdown()
    assert not client.proc.is_alive()
