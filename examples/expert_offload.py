"""HBM + host-RAM expert tiering — the LVLLM fork's defining capability,
TPU-native (reference README 'GPU and NUMA Dual Parallelism'): cold MoE
layers' expert weights live in host RAM and stream to HBM one layer ahead
of compute.

    JAX_PLATFORMS=cpu python examples/expert_offload.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              OffloadConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def main() -> None:
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=128,
        max_position_embeddings=512, max_model_len=256, eos_token_id=-1)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=128),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=256,
                                         max_num_seqs=8, max_model_len=256),
        offload_config=OffloadConfig(
            enabled=True,
            hbm_resident_moe_layers="0-1",  # layers 2-3 stream from host
            prefetch_window=1),
    )
    eng = LLMEngine(cfg, load_format="dummy")
    eng.add_request("r0", [1, 2, 3, 4, 5],
                    SamplingParams(temperature=0.0, max_tokens=8))
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                print("tokens:", out.outputs[0].token_ids)
    store = eng.core.runner.expert_store
    print(f"host tier: {store.host_bytes() / 1e6:.1f} MB, "
          f"streamed layers: {eng.core.runner.streamed_moe_layers}")


if __name__ == "__main__":
    main()
