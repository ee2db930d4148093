"""Sharding specs for model params, KV caches and batch arrays.

TPU-native counterpart of the reference's parallel layers
(``layers/linear.py`` ColumnParallelLinear/RowParallelLinear,
``VocabParallelEmbedding``, FusedMoE expert mapping
``fused_moe/layer.py:84``): instead of per-layer manual collectives, each
parameter gets a PartitionSpec derived from its *path* in the params tree;
XLA's SPMD partitioner derives the all-reduces the reference issues by hand.

Conventions (axes from parallel/mesh.py):
- q/k/v projections: output dim on "model" (column-parallel)
- o_proj / mlp down: input dim on "model" (row-parallel → all-reduce)
- mlp gate_up: output dim on "model"
- MoE w1/w2 (and their quantized w*_q / w*_scales forms): expert dim on
  "expert", intermediate dim on "model"
- embedding / lm_head: vocab on "model"
- KV cache: kv-head dim on "model" (replicated when it doesn't divide)
"""

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, SequenceKey, tree_map_with_path

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.parallel.mesh import AXIS_DATA, AXIS_EXPERT, AXIS_MODEL
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if isinstance(k, DictKey):
            names.append(str(k.key))
        elif isinstance(k, SequenceKey):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return tuple(names)


def spec_for_param(path_names: Tuple[str, ...], ndim: int,
                   shape, mesh: Mesh, config: ModelConfig) -> P:
    """PartitionSpec for one parameter, by its tree path."""
    tp = mesh.shape[AXIS_MODEL]
    ep = mesh.shape[AXIS_EXPERT]
    name = path_names[-2] if len(path_names) >= 2 else ""
    leaf = path_names[-1]
    joined = "/".join(path_names)

    def div(n, m):
        return n % m == 0

    # MoE expert tensors: [E, K(/2), N] (+ scales [E, K/G, N]).
    if "moe" in path_names and leaf in (
            "w1", "w2", "w1_q", "w2_q", "w1_scales", "w2_scales"):
        dp = mesh.shape.get(AXIS_DATA, 1)
        if ep > 1 and dp > 1 and div(shape[0], dp * ep):
            # EP spanning DP ranks (reference DP+EP topology): experts
            # partitioned over the joint (data, expert) group.
            return P((AXIS_DATA, AXIS_EXPERT), None, None)
        if ep > 1 and div(shape[0], ep):
            # EP path: the shard_map dispatch (expert_parallel.py) expects
            # expert-axis-only sharding — intermediate dims stay whole.
            return P(AXIS_EXPERT, None, None)
        # Pure-TP fallback: shard the intermediate dim; scales follow.
        # Tiled quant layout [E, N/tn, rows, tn] (quant_gemm tiled
        # repack): replicate under pure TP — the Pallas grouped GEMM runs
        # single-shard inside GSPMD (see CLAUDE.md), and EP is the
        # production sharding for quantized experts.
        if len(shape) == 4:
            return P(None, None, None, None)
        if leaf.startswith("w1"):
            n_ax = AXIS_MODEL if div(shape[-1], tp) else None
            return P(None, None, n_ax)
        k_ax = AXIS_MODEL if div(shape[1], tp) else None
        return P(None, k_ax, None)
    if "moe" in path_names and leaf == "router":
        return P()
    if "moe" in path_names and leaf in ("shared_w1", "shared_w2"):
        if leaf == "shared_w1" and div(shape[-1], tp):
            return P(None, AXIS_MODEL)
        if leaf == "shared_w2" and div(shape[0], tp):
            return P(AXIS_MODEL, None)
        return P()

    if leaf in ("bias", "scale"):
        # Column-parallel biases / per-output-channel w8a8 scales shard
        # with the output dim; row-parallel (o_proj/down) ones apply
        # after the all-reduce → replicated.
        if name in ("q_proj", "k_proj", "v_proj", "gate_up") and \
                div(shape[0], tp):
            return P(AXIS_MODEL)
        if leaf == "scale" and name == "lm_head" and div(shape[0], tp):
            return P(AXIS_MODEL)
        return P()
    if name in ("q_proj", "k_proj", "v_proj"):
        return P(None, AXIS_MODEL) if div(shape[-1], tp) else P()
    if name == "o_proj":
        return P(AXIS_MODEL, None) if div(shape[0], tp) else P()
    if name == "gate_up":
        return P(None, AXIS_MODEL) if div(shape[-1], tp) else P()
    if name == "down":
        return P(AXIS_MODEL, None) if div(shape[0], tp) else P()
    if path_names[0] == "embed":
        return P(AXIS_MODEL, None) if div(shape[0], tp) else P()
    if path_names[0] == "lm_head":
        return P(None, AXIS_MODEL) if div(shape[-1], tp) else P()
    return P()  # norms, biases, everything small: replicated


def param_specs(params, config: ModelConfig, mesh: Mesh):
    """PartitionSpec pytree mirroring an actual params tree."""
    def spec(path, leaf):
        return spec_for_param(_path_names(path), leaf.ndim, leaf.shape,
                              mesh, config)
    return tree_map_with_path(spec, params)


def kv_cache_spec(config: ModelConfig, mesh: Mesh, dcp: int = 1) -> P:
    """[2, NB, BS, Hkv, D]: shard kv heads over the model axis. Under DCP
    the cache gains a leading [CP] shard dim on the context axis."""
    from lvllm_tpu.parallel.mesh import AXIS_CONTEXT
    head_ax = (AXIS_MODEL
               if config.num_kv_heads % mesh.shape[AXIS_MODEL] == 0
               else None)
    if dcp > 1:
        return P(AXIS_CONTEXT, None, None, None, head_ax, None)
    if head_ax is None:
        return P()
    return P(None, None, None, head_ax, None)


def shard_params(params, config: ModelConfig, mesh: Mesh):
    """Place a params pytree onto the mesh per param_specs."""
    def place(path, p):
        s = spec_for_param(_path_names(path), p.ndim, p.shape, mesh, config)
        return jax.device_put(p, NamedSharding(mesh, s))
    return tree_map_with_path(place, params)