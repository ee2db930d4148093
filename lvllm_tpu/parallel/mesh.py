"""Device mesh construction.

TPU-native replacement for the reference's process-group world
(``distributed/parallel_state.py:1218-1283`` — _TP/_EP/_DP group setup):
instead of NCCL process groups, one ``jax.sharding.Mesh`` with named axes;
XLA inserts the collectives. Axis semantics:

- ``data``    — DP: replicated params, split batch (engine-level replicas
               across slices use separate processes like the reference's
               DPEngineCoreProc; this axis covers in-slice DP).
- ``expert``  — EP: MoE expert weights sharded along num_experts.
- ``model``   — TP: attention heads / FFN intermediate sharded.
- ``context`` — DCP: paged KV of one sequence interleaved across shards
               (reference's decode context parallel, _DCP group
               ``parallel_state.py:1283``); innermost so the LSE-merge
               all-gather rides adjacent ICI links.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from lvllm_tpu.config import ParallelConfig
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

AXIS_DATA = "data"
AXIS_EXPERT = "expert"
AXIS_MODEL = "model"
AXIS_CONTEXT = "context"


def make_mesh(parallel_config: Optional[ParallelConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    pc = parallel_config or ParallelConfig()
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    tp = pc.tensor_parallel_size
    ep = pc.expert_parallel_size
    dp = pc.data_parallel_size
    cp = (getattr(pc, "decode_context_parallel_size", 1) *
          getattr(pc, "prefill_context_parallel_size", 1))
    # Fill unspecified axes to cover all devices.
    if tp * ep * dp * cp < n and dp == 1 and ep == 1 and tp == 1 and cp == 1:
        tp = n
    assert tp * ep * dp * cp <= n, \
        f"mesh {dp}x{ep}x{tp}x{cp} needs more than {n} devices"
    used = dp * ep * tp * cp
    dev_array = np.asarray(devices[:used]).reshape(dp, ep, tp, cp)
    mesh = Mesh(dev_array,
                (AXIS_DATA, AXIS_EXPERT, AXIS_MODEL, AXIS_CONTEXT))
    logger.info("mesh: data=%d expert=%d model=%d context=%d over %d devices",
                dp, ep, tp, cp, used)
    return mesh
