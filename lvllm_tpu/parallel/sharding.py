"""Sharding specs for model params, KV caches and batch arrays.

TPU-native counterpart of the reference's parallel layers
(``layers/linear.py`` ColumnParallelLinear/RowParallelLinear,
``VocabParallelEmbedding``, FusedMoE expert mapping
``fused_moe/layer.py:84``): instead of per-layer manual collectives, each
parameter gets a PartitionSpec; XLA's SPMD partitioner derives the
all-reduces the reference issues by hand.

Conventions (axes from parallel/mesh.py):
- q/k/v projections: output dim on "model" (column-parallel)
- o_proj / mlp down: input dim on "model" (row-parallel → all-reduce)
- mlp gate_up: output dim on "model"
- MoE w1/w2: expert dim on "expert", intermediate on "model"
- embedding / lm_head: vocab on "model"
- KV cache: kv-head dim on "model" (falls back to replicated when the
  head count doesn't divide)
"""

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.parallel.mesh import AXIS_EXPERT, AXIS_MODEL
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _divides(n: int, mesh: Mesh, axis: str) -> bool:
    return n % mesh.shape[axis] == 0


def param_specs(config: ModelConfig, mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec pytree matching Qwen3Model's params layout."""
    c = config
    tp_ok = lambda n: _divides(n, mesh, AXIS_MODEL)  # noqa: E731
    ep_ok = c.is_moe and _divides(c.num_experts, mesh, AXIS_EXPERT)

    vocab = P(AXIS_MODEL, None) if tp_ok(c.vocab_size) else P()
    specs: Dict[str, Any] = {
        "embed": {"weight": vocab},
        "norm": {"weight": P()},
        "layers": [],
    }
    if not c.tie_word_embeddings:
        specs["lm_head"] = {
            "kernel": P(None, AXIS_MODEL) if tp_ok(c.vocab_size) else P()}

    heads_ok = tp_ok(c.num_attention_heads) and tp_ok(c.num_key_value_heads)
    for i in range(c.num_hidden_layers):
        layer: Dict[str, Any] = {
            "input_layernorm": {"weight": P()},
            "post_attention_layernorm": {"weight": P()},
            "self_attn": {
                "q_proj": {"kernel": P(None, AXIS_MODEL) if heads_ok else P()},
                "k_proj": {"kernel": P(None, AXIS_MODEL) if heads_ok else P()},
                "v_proj": {"kernel": P(None, AXIS_MODEL) if heads_ok else P()},
                "o_proj": {"kernel": P(AXIS_MODEL, None) if heads_ok else P()},
            },
        }
        if c.qk_norm:
            layer["self_attn"]["q_norm"] = {"weight": P()}
            layer["self_attn"]["k_norm"] = {"weight": P()}
        if c.is_moe_layer(i):
            e_ax = AXIS_EXPERT if ep_ok else None
            i_ax = AXIS_MODEL if _divides(2 * c.moe_intermediate_size,
                                          mesh, AXIS_MODEL) else None
            layer["moe"] = {
                "router": P(),
                "w1": P(e_ax, None, i_ax),
                "w2": P(e_ax, i_ax, None),
            }
        else:
            i_ax = AXIS_MODEL if _divides(2 * c.intermediate_size, mesh,
                                          AXIS_MODEL) else None
            layer["mlp"] = {
                "gate_up": {"kernel": P(None, i_ax)},
                "down": {"kernel": P(i_ax, None)},
            }
        specs["layers"].append(layer)
    return specs


def kv_cache_spec(config: ModelConfig, mesh: Mesh) -> P:
    """[2, NB, BS, Hkv, D]: shard kv heads over the model axis."""
    if _divides(config.num_kv_heads, mesh, AXIS_MODEL):
        return P(None, None, None, AXIS_MODEL, None)
    return P()


def shard_params(params, config: ModelConfig, mesh: Mesh):
    """Place a params pytree onto the mesh per param_specs."""
    specs = param_specs(config, mesh)
    def place(p, s):
        return jax.device_put(p, NamedSharding(mesh, s))
    return jax.tree.map(place, params, specs)
