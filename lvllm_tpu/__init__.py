"""lvllm_tpu — a TPU-native LLM serving framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
guqiong96/Lvllm (vLLM v1 + CPU/NUMA hybrid MoE fork): continuous batching,
paged prefix-cached KV, ragged paged attention, quantized MoE expert kernels,
TP/EP/DP parallelism over device meshes, and an HBM + host-RAM tiered expert
store replacing the reference's GPU+NUMA dual parallelism.
"""

__version__ = "0.1.0"

from lvllm_tpu.sampling_params import SamplingParams
from lvllm_tpu.outputs import CompletionOutput, RequestOutput

__all__ = [
    "SamplingParams",
    "CompletionOutput",
    "RequestOutput",
    "__version__",
]
