"""Speculative decoding (reference: examples/offline_inference/spec_decode.py):
ngram / draft-model / EAGLE / EAGLE-3 proposers; greedy outputs are
lossless regardless of head quality.

    JAX_PLATFORMS=cpu python examples/spec_decode.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from lvllm_tpu.config import ModelConfig, SpeculativeConfig
from lvllm_tpu.entrypoints.llm import LLM
from lvllm_tpu.sampling_params import SamplingParams


def _mc():
    return ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, max_model_len=128,
        eos_token_id=-1)


def main() -> None:
    prompts = [[1, 2, 3, 4, 5] * 4]
    sp = SamplingParams(temperature=0.0, max_tokens=24)

    base = LLM(model_config=_mc(), load_format="dummy") \
        .generate(prompts, sp)[0].outputs[0].token_ids

    for method in ("ngram", "eagle", "eagle3"):
        spec = SpeculativeConfig(method=method, num_speculative_tokens=3)
        llm = LLM(model_config=_mc(), load_format="dummy",
                  speculative_config=spec)
        got = llm.generate(prompts, sp)[0].outputs[0].token_ids
        assert got == base, method
        print(f"{method}: lossless OK ({got[:8]}...)")


if __name__ == "__main__":
    main()
