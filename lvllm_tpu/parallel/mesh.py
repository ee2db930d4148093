"""Device mesh construction.

TPU-native replacement for the reference's process-group world
(``distributed/parallel_state.py:1218-1283`` — _TP/_EP/_DP group setup):
instead of NCCL process groups, one ``jax.sharding.Mesh`` with named axes;
XLA inserts the collectives. Axis semantics:

- ``data``   — DP: replicated params, split batch (engine-level replicas
               across slices use separate processes like the reference's
               DPEngineCoreProc; this axis covers in-slice DP).
- ``expert`` — EP: MoE expert weights sharded along num_experts.
- ``model``  — TP: attention heads / FFN intermediate sharded.
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


def make_mesh(parallel_config: Optional[ParallelConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    pc = parallel_config or ParallelConfig()
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    tp = pc.tensor_parallel_size
    ep = pc.expert_parallel_size
    dp = pc.data_parallel_size
    # Fill unspecified axes to cover all devices.
    if tp * ep * dp < n and dp == 1 and ep == 1 and tp == 1:
        tp = n
    assert tp * ep * dp <= n, \
        f"mesh {dp}x{ep}x{tp} needs more than {n} devices"
    used = dp * ep * tp
    dev_array = np.asarray(devices[:used]).reshape(dp, ep, tp)
    mesh = Mesh(dev_array, (AXIS_DATA, AXIS_EXPERT, AXIS_MODEL))
    logger.info("mesh: data=%d expert=%d model=%d over %d devices",
                dp, ep, tp, used)
    return mesh
