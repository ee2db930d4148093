"""lvllm_tpu — a TPU-native LLM serving framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
guqiong96/Lvllm (vLLM v1 + CPU/NUMA hybrid MoE fork): continuous batching,
paged prefix-cached KV, ragged paged attention, quantized MoE expert kernels,
TP/EP/DP parallelism over device meshes, and an HBM + host-RAM tiered expert
store replacing the reference's GPU+NUMA dual parallelism.
"""

__version__ = "0.1.0"

import os as _os


def enable_compile_cache() -> None:
    """Persistent XLA executable cache (reference analog:
    vllm compilation cache / CUDA-graph capture reuse). On remote-compile
    transports (axon tunnel) this turns 20-60 s per-bucket compiles into
    sub-second disk hits across processes. Keyed per backend: XLA:CPU AOT
    results embed the *compiling* machine's ISA features, so mixing
    entries from the remote-compile service with local CPU runs risks
    SIGILL. Called lazily (engine init / bench) once the backend is
    known. Opt out: LVLLM_COMPILE_CACHE=0 / override dir:
    LVLLM_COMPILE_CACHE_DIR."""
    if _os.environ.get("LVLLM_COMPILE_CACHE", "1") in ("0", "false"):
        return
    try:
        import jax
        # Default inside the repo so round-driver runs on this machine hit
        # executables warmed by dev runs.
        base = _os.environ.get(
            "LVLLM_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        cache_dir = _os.path.join(base, jax.default_backend())
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


from lvllm_tpu.sampling_params import SamplingParams
from lvllm_tpu.outputs import CompletionOutput, RequestOutput

__all__ = [
    "SamplingParams",
    "CompletionOutput",
    "RequestOutput",
    "__version__",
]
