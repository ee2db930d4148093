"""PCP — prefill context parallelism.

Counterpart of the reference's prefill-context-parallel group
(``prefill_context_parallel_size``, ``parallel_state.py:1277``,
``v1/worker/cp_utils.py``): a long prompt's query sequence is split into
contiguous chunks across the PCP ranks; every rank computes the KV for its
own chunk, the chunks are all-gathered over ICI, and each rank runs causal
attention for its queries against the full gathered prefix. Combined with
DCP (``ops/context_parallel.py``) this is the long-context scaling story —
no ring attention needed (SURVEY.md §5.7).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lvllm_tpu.parallel.mesh import AXIS_MODEL


def pcp_prefill_attention(
    q: jax.Array,  # [T, Hq, D] — sequence-sharded over the model axis
    k: jax.Array,  # [T, Hkv, D] — same sharding
    v: jax.Array,  # [T, Hkv, D]
    mesh,
    scale: float,
) -> jax.Array:
    """Causal attention for one long prefill, queries sharded by sequence
    chunk. Returns [T, Hq, D] with the same sharding as q."""
    p = mesh.shape[AXIS_MODEL]
    T = q.shape[0]
    assert T % p == 0, (T, p)
    chunk = T // p

    def shard_fn(q_c, k_c, v_c):
        Hq, D = q_c.shape[1], q_c.shape[2]
        Hkv = k_c.shape[1]
        G = Hq // Hkv
        rank = jax.lax.axis_index(AXIS_MODEL)
        # Gather the full KV prefix (rank-ordered == sequence-ordered).
        k_full = jax.lax.all_gather(k_c, AXIS_MODEL).reshape(T, Hkv, D)
        v_full = jax.lax.all_gather(v_c, AXIS_MODEL).reshape(T, Hkv, D)

        qf = q_c.reshape(chunk, Hkv, G, D).astype(jnp.float32)
        kf = k_full.astype(jnp.float32)
        scores = jnp.einsum("thgd,chd->thgc", qf, kf) * scale
        # Causal mask at global positions: query i sits at rank*chunk + i.
        q_pos = rank * chunk + jnp.arange(chunk)
        mask = jnp.arange(T)[None, :] <= q_pos[:, None]   # [chunk, T]
        scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("thgc,chd->thgd", probs,
                         v_full.astype(jnp.float32))
        return out.reshape(chunk, Hq, D).astype(q_c.dtype)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS_MODEL), P(AXIS_MODEL), P(AXIS_MODEL)),
        out_specs=P(AXIS_MODEL),
        check_vma=False,
    )(q, k, v)
