"""Offline inference with the LLM API (reference:
examples/offline_inference/basic.py).

Runs on CPU with dummy weights out of the box:
    JAX_PLATFORMS=cpu python examples/offline_inference.py
Point ``model=`` at a HF checkpoint directory to serve real weights.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from lvllm_tpu.entrypoints.llm import LLM
from lvllm_tpu.sampling_params import SamplingParams


def main() -> None:
    llm = LLM(model="dummy", multi_step_decode=8)
    prompts = [[1, 2, 3, 4, 5], list(range(10, 40))]
    params = SamplingParams(temperature=0.8, top_p=0.95, seed=0,
                            max_tokens=32)
    for out in llm.generate(prompts, params):
        print(f"{out.request_id}: {out.outputs[0].token_ids[:10]}...")


if __name__ == "__main__":
    main()
