"""Pipeline parallelism (PP) — layer-staged execution with microbatches.

TPU-native counterpart of the reference's PP executor path
(``vllm/config/parallel.py pipeline_parallel_size``, ray/mp executor stage
workers exchanging IntermediateTensors): contiguous layer ranges become
*stages*, each jitted separately with its parameters and KV-cache slice
resident on that stage's device(s). Microbatches (request-aligned splits
of the ragged batch) flow through stages; JAX's async dispatch overlaps
stage s of microbatch m with stage s+1 of microbatch m-1 — the classic
1F pipeline — without an explicit scheduler thread. Inter-stage
activations move with ``jax.device_put`` (ICI/DCN transfers).

Intended for DCN-scale deployments where a model exceeds one slice; TP/EP
shard *within* a stage via the usual mesh axes (stage devices can be
sub-meshes — v1 wires single-device stages).
"""

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.models.model_base import AttentionMetadata


def partition_layers(num_layers: int, num_stages: int) -> List[range]:
    """Balanced contiguous layer ranges (earlier stages get the remainder,
    matching the reference's even partitioning)."""
    base, rem = divmod(num_layers, num_stages)
    out, start = [], 0
    for s in range(num_stages):
        n = base + (1 if s < rem else 0)
        out.append(range(start, start + n))
        start += n
    return out


def split_microbatches(md: AttentionMetadata, num_tokens: int,
                      num_microbatches: int
                      ) -> List[Tuple[slice, AttentionMetadata]]:
    """Split a ragged batch into request-aligned microbatches.

    Returns (token_slice, sub_metadata) per microbatch; empty microbatches
    are dropped. Host-side (numpy) — called outside jit.
    """
    qsl = np.asarray(md.query_start_loc)
    R = len(qsl) - 1
    groups = partition_layers(R, num_microbatches)  # reuse: balanced ranges
    out = []
    for g in groups:
        if len(g) == 0:
            continue
        r0, r1 = g.start, g.stop
        t0, t1 = int(qsl[r0]), int(qsl[r1])
        if t1 == t0:
            continue
        sub_md = AttentionMetadata(
            query_start_loc=jnp.asarray(qsl[r0:r1 + 1] - t0, jnp.int32),
            seq_lens=md.seq_lens[r0:r1],
            block_table=md.block_table[r0:r1],
            slot_mapping=md.slot_mapping[t0:t1],
        )
        out.append((slice(t0, t1), sub_md))
    return out


class PipelineRunner:
    """Stage-partitioned forward over explicit devices.

    Parameters/KV of stage s live on ``devices[s]``; ``forward`` runs all
    microbatches through all stages and returns (logits [T, V], updated
    kv_caches) with layout identical to the fused single-device path.
    """

    def __init__(self, model, params, kv_caches, devices: Sequence,
                 num_microbatches: int = 2):
        self.model = model
        self.devices = list(devices)
        S = len(self.devices)
        self.stages = partition_layers(model.config.num_hidden_layers, S)
        self.num_microbatches = num_microbatches

        # Place each stage's params + cache slice on its device.
        def put(tree, dev):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, dev), tree)

        self.stage_params = []
        self.kv_caches = list(kv_caches)
        for s, rng in enumerate(self.stages):
            sp = {"layers": [params["layers"][i] for i in rng]}
            if s == 0:
                sp["embed"] = params["embed"]
            if s == S - 1:
                sp["norm"] = params["norm"]
                if "lm_head" in params:
                    sp["lm_head"] = params["lm_head"]
                if model.config.tie_word_embeddings:
                    sp["embed"] = params["embed"]
            self.stage_params.append(put(sp, self.devices[s]))
            for i in rng:
                self.kv_caches[i] = jax.device_put(self.kv_caches[i],
                                                   self.devices[s])

        model_ref = self.model

        def make_stage(s: int, rng: range):
            first, last = s == 0, s == S - 1

            def stage_fn(sp, kvs, x, residual, input_ids, positions, qsl,
                         seq_lens, block_table, slot_mapping):
                md = AttentionMetadata(
                    query_start_loc=qsl, seq_lens=seq_lens,
                    block_table=block_table, slot_mapping=slot_mapping)
                if first:
                    x = model_ref.embed_tokens(sp, input_ids, positions)
                    residual = jnp.zeros_like(x)
                new_kvs = []
                for j, i in enumerate(rng):
                    x, residual, kv = model_ref.apply_layer(
                        sp["layers"][j], x, residual, positions, kvs[j],
                        md, i)
                    new_kvs.append(kv)
                if last:
                    hidden = model_ref.finalize_hidden(sp, x, residual)
                    logits = model_ref.compute_logits(sp, hidden)
                    return logits, residual, new_kvs
                return x, residual, new_kvs

            return jax.jit(stage_fn, donate_argnums=(1,))

        self.stage_fns = [make_stage(s, rng)
                          for s, rng in enumerate(self.stages)]

    def forward(self, input_ids: jax.Array, positions: jax.Array,
                md: AttentionMetadata) -> Tuple[jax.Array, List[jax.Array]]:
        T = input_ids.shape[0]
        mbs = split_microbatches(md, T, self.num_microbatches)
        S = len(self.stages)
        # Per-stage rolling KV slice (microbatches chain through donation).
        stage_kv = [[self.kv_caches[i] for i in rng] for rng in self.stages]

        # Dispatch every (stage, microbatch) cell; the device runtimes
        # overlap stage s of mb m with stage s-1 of mb m+1.
        logits_parts: List[Optional[jax.Array]] = []
        acts = []
        for tok_slice, sub_md in mbs:
            ids_m = input_ids[tok_slice]
            pos_m = positions[tok_slice]
            x = residual = jnp.zeros((0,), jnp.bfloat16)  # unused at stage 0
            acts.append((ids_m, pos_m, sub_md, x, residual))

        for s in range(S):
            dev = self.devices[s]
            next_acts = []
            for m, (ids_m, pos_m, sub_md, x, residual) in enumerate(acts):
                args = jax.device_put(
                    (x, residual, ids_m, pos_m, sub_md.query_start_loc,
                     sub_md.seq_lens, sub_md.block_table,
                     sub_md.slot_mapping), dev)
                out, residual, stage_kv[s] = self.stage_fns[s](
                    self.stage_params[s], stage_kv[s], *args)
                next_acts.append((ids_m, pos_m, sub_md, out, residual))
            acts = next_acts
        logits_parts = [a[3] for a in acts]

        for s, rng in enumerate(self.stages):
            for j, i in enumerate(rng):
                self.kv_caches[i] = stage_kv[s][j]
        return jnp.concatenate(logits_parts, axis=0), list(self.kv_caches)
