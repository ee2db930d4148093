"""Model runner: per-step input prep + the jitted forward/sample step.

Counterpart of the reference's ``vllm/v1/worker/gpu_model_runner.py`` (the
hot path: ``_prepare_inputs:1776``, ``_model_forward:3500``, CUDA-graph
dispatch ``:3553``, ``sample_tokens:4140``) — reshaped TPU-first:

- CUDA-graph capture sizes become *token-bucket padding*: every step is
  padded to a bucketed [T] so XLA compiles one executable per bucket and
  replays it (SchedulerConfig.token_buckets).
- The whole step (embed → N layers → logits → sample) is ONE jitted
  function; KV caches are donated so updates are in-place in HBM.
- Sampling runs for all request slots every step; the host discards slots
  still mid-prefill (mirrors the reference's logits_indices approach).
"""

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import EngineConfig
from lvllm_tpu.core.sched_output import ModelRunnerOutput, SchedulerOutput
from lvllm_tpu.logger import init_logger
from lvllm_tpu.models.model_base import AttentionMetadata
from lvllm_tpu.ops.kv_cache import new_kv_cache
from lvllm_tpu.ops.sampling import (SamplingTensors,
                                    apply_penalties_from_history,
                                    compute_logprobs, rejection_sample,
                                    sample)
from lvllm_tpu.worker.input_batch import InputBatch

logger = init_logger(__name__)


from dataclasses import dataclass, field  # noqa: E402


@dataclass
class StepHandle:
    """An in-flight (dispatched, not host-synced) step (reference:
    AsyncGPUModelRunnerOutput, gpu_model_runner.py:227)."""

    sampled: object            # device [R, S1]
    logprobs: object           # device [R, S1]
    row_req_ids: List[Optional[str]]
    row_drafts: List[List[int]]
    row_samples: List[bool]
    S1: int
    async_mode: bool
    seq_lens: np.ndarray
    # Optional [R, S1, K] top-k logprob values/ids (device).
    topk_logprobs: object = None
    topk_ids: object = None
    # EAGLE: full-step hidden states [T, H] (device) + per-row chunk
    # coordinates so the proposer can slice features inside jit.
    hidden: object = None
    row_starts: List[int] = field(default_factory=list)
    row_t0s: List[int] = field(default_factory=list)
    row_propose: List[bool] = field(default_factory=list)
    # Multi-candidate speculation: per-row chain index (-1 single-chain)
    # and rid -> row-group for winner selection in finalize.
    row_chain: List[int] = field(default_factory=list)
    chain_groups: Dict[str, List[int]] = field(default_factory=dict)


class ModelRunner:

    def __init__(self, config: EngineConfig, model, params,
                 num_kv_blocks: int, mesh=None):
        self.config = config
        self.model = model
        self.params = params
        self.mesh = mesh
        mc = config.model_config
        sc = config.scheduler_config
        cc = config.cache_config

        self.block_size = cc.block_size
        # DCP: KV pages interleaved over the mesh's "context" axis — one
        # pool block covers block_size tokens on each of the dcp shards.
        self.dcp = max(1, config.parallel_config.decode_context_parallel_size)
        if self.dcp > 1:
            from lvllm_tpu.parallel.mesh import AXIS_CONTEXT
            assert mesh is not None and \
                mesh.shape.get(AXIS_CONTEXT, 1) == self.dcp, \
                "DCP needs a mesh with a matching 'context' axis"
            assert getattr(model, "dcp_compatible", False), \
                f"{type(model).__name__} does not support DCP"
            assert not config.offload_config.enabled, \
                "DCP + expert offload staging TBD"
        # PCP: long-prefill query chunks sharded over the "context" axis
        # (reference: prefill_context_parallel_size, config/parallel.py:115).
        self.pcp = max(1, config.parallel_config.prefill_context_parallel_size)
        if self.pcp > 1:
            from lvllm_tpu.parallel.mesh import AXIS_CONTEXT
            assert mesh is not None and \
                mesh.shape.get(AXIS_CONTEXT, 1) == self.pcp * self.dcp, \
                "PCP needs a mesh 'context' axis of size pcp*dcp"
            assert self.dcp == 1, "PCP + DCP combination TBD"
            assert (mc.sliding_window is None and not mc.attention_sinks
                    and mc.attn_logit_softcap is None and not mc.alibi
                    and mc.attention_type != "mla"
                    and mc.layer_types is None
                    and mc.mrope_section is None), \
                "PCP v1 supports standard full-attention models only"
        self.max_blocks_per_req = -(-mc.max_model_len //
                                    (cc.block_size * self.dcp))
        self.max_num_reqs = sc.max_num_seqs
        self.num_kv_blocks = num_kv_blocks

        spec = config.speculative_config
        self.num_spec = spec.num_speculative_tokens if spec.enabled else 0

        self.input_batch = InputBatch(
            max_num_reqs=self.max_num_reqs,
            max_model_len=mc.max_model_len,
            max_blocks_per_req=self.max_blocks_per_req,
            vocab_size=mc.vocab_size,
        )

        kv_dtype = self._kv_dtype()
        self.kv_caches = self._make_caches(kv_dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from lvllm_tpu.parallel.sharding import kv_cache_spec
            spec = kv_cache_spec(mc, mesh, dcp=self.dcp)
            sharding = NamedSharding(mesh, spec)
            self.kv_caches = [
                jax.device_put(kv, sharding) if not isinstance(kv, dict)
                else kv
                for kv in self.kv_caches]
        self.step_counter = 0
        self._host_params = None
        # Async scheduling state: previous dispatch's rows + device tokens.
        self._prev_rows: Dict[str, int] = {}
        self._prev_sampled = None
        # Retained per-request state for preemption resume.
        self._sampling_params_cache: Dict[str, object] = {}
        self._prompt_len_cache: Dict[str, int] = {}

        # One jitted step function; recompiles per (T_bucket,) shape.
        self._step_fn = jax.jit(
            self._step, donate_argnums=(1,),
            static_argnames=("greedy_only", "want_topk_logprobs",
                             "single_seq_prefill", "want_hidden",
                             "aux_layers", "pcp_prefill", "decode_mode"))
        # Multi-step decode: H iterations in one lax.scan (the TPU analog
        # of capturing N decode steps in one CUDA graph).
        self._multi_step_fn = jax.jit(
            self._multi_step, donate_argnums=(1,),
            static_argnames=("horizon", "greedy_only"))

        # Set by EngineCore when LoRA serving is enabled.
        self.lora_manager = None
        # rid → [k, V] proposal distributions for sampled drafts
        # (stochastic drafting; consumed by rejection_sample's draft_q).
        self.draft_q_store: Dict[str, np.ndarray] = {}
        # Set by EngineCore for EAGLE spec decoding (the proposer consumes
        # the target's hidden states, so it lives runner-side — reference:
        # propose_draft_token_ids in gpu_model_runner.py:4506).
        self.eagle_proposer = None

        # Multimodal (LLaVA-family): per-request projected image features
        # + placeholder positions (reference: mm input mapper + merge).
        self._mm_feats: Dict[str, np.ndarray] = {}
        self._mm_positions: Dict[str, np.ndarray] = {}
        # Processor cache (reference: vllm/multimodal processor cache):
        # identical images across requests reuse encoded features, keyed
        # by a content hash of the pixel data. Bounded LRU.
        self._mm_processor_cache: Dict[str, np.ndarray] = {}
        self._mm_cache_order: List[str] = []
        # Raw mm inputs kept host-side so a preempted request can
        # re-encode after the encoder cache freed its features.
        self._mm_raw: Dict[str, dict] = {}
        self.MM_PROCESSOR_CACHE_SIZE = 32
        self.mm_stats = {"processor_cache_hits": 0,
                         "processor_cache_misses": 0,
                         "encoder_cache_freed": 0}
        # Encoder-decoder (Whisper): per-request cross-attention K/V pool
        # [L, 2, P+1, S, H, Dh] (last slot = zeros for audio-less rows),
        # written once at admit, read by every decode step.
        self.is_enc_dec = getattr(self.model, "is_encoder_decoder", False)
        self._cross_pool = None
        if self.is_enc_dec:
            self._encode_audio_fn = jax.jit(self.model.encode_audio)
            self._cross_kv_fn = jax.jit(self.model.compute_cross_kv)
            self._cross_set_fn = jax.jit(
                lambda p, c, s: p.at[:, :, s].set(c.astype(p.dtype)))
        self._encode_images_fn = None
        if not self.is_enc_dec and getattr(self.model, "is_multimodal",
                                           False):
            if getattr(self.model, "mm_dynamic", False):
                # Variable-grid towers (Qwen2-VL) manage their own jit
                # cache per grid shape; flag doubles as dispatch marker.
                self._encode_images_fn = self.model.encode_mm
            else:
                self._encode_images_fn = jax.jit(self.model.encode_images)
        # M-RoPE (Qwen2-VL family): per-request [3, L] prompt positions +
        # decode delta (reference: mrope_positions/mrope_position_delta in
        # gpu_model_runner.py:2489).
        self.uses_mrope = getattr(self.model, "uses_mrope", False)
        self._mrope_pos: Dict[str, np.ndarray] = {}
        self._mrope_delta: Dict[str, int] = {}

        # HBM + host-RAM expert tiering (SURVEY.md §2.11 equivalent).
        self.expert_store = None
        if config.offload_config.enabled and mc.is_moe:
            self._init_offload()

        # Pipeline parallelism: layer-staged execution across devices
        # (reference: pipeline_parallel_size consumed by EngineCore's
        # step_with_batch_queue, v1/engine/core.py:443; stage-edge
        # send/recv of IntermediateTensors, models/utils.py:620).
        self.pp = config.parallel_config.pipeline_parallel_size
        if self.pp > 1:
            assert mesh is None, \
                "PP v1 uses per-stage devices; in-stage TP/EP meshes TBD"
            assert self.expert_store is None and self.dcp == 1 and \
                self.num_spec == 0 and mc.layer_types is None, \
                "PP excludes offload staging / DCP / spec decode / hybrid"
            self._init_pipeline()

    def reshard(self, mesh) -> None:
        """Re-place KV caches for a new mesh and drop the step compile
        cache (elastic EP; see EngineCore.scale_expert_parallel)."""
        from jax.sharding import NamedSharding
        from lvllm_tpu.parallel.sharding import kv_cache_spec

        self.mesh = mesh
        spec = kv_cache_spec(self.config.model_config, mesh, dcp=self.dcp)
        sharding = NamedSharding(mesh, spec)
        self.kv_caches = [
            jax.device_put(kv, sharding) if not isinstance(kv, dict) else kv
            for kv in self.kv_caches]
        self._step_fn = jax.jit(
            self._step, donate_argnums=(1,),
            static_argnames=("greedy_only", "want_topk_logprobs",
                             "single_seq_prefill", "want_hidden",
                             "aux_layers", "pcp_prefill", "decode_mode"))

    def _make_caches(self, kv_dtype):
        mc = self.config.model_config
        cc = self.config.cache_config
        if self.dcp > 1:
            # [CP, 2, NB, BS, Hkv, D] — leading shard dim on the context
            # axis; each shard stores the pages it owns by interleave.
            shape = (self.dcp, 2, self.num_kv_blocks, cc.block_size,
                     mc.kv_cache_heads, mc.kv_cache_dim)
            return [jnp.zeros(shape, kv_dtype)
                    for _ in range(mc.num_hidden_layers)]
        return [
            self.model.make_layer_cache(i, self.num_kv_blocks,
                                        cc.block_size, kv_dtype,
                                        self.max_num_reqs)
            for i in range(mc.num_hidden_layers)
        ]

    def _kv_dtype(self):
        """KV cache storage dtype (reference: kv_cache_dtype config —
        auto/bf16/fp8; fp8 halves KV footprint, attention upcasts)."""
        cc = self.config.cache_config
        mc = self.config.model_config
        if cc.kv_cache_dtype == "fp8":
            return jnp.float8_e4m3fn
        if cc.kv_cache_dtype == "int4":
            return "int4"   # Int4KVSpec layout (ops/kv_cache_int4.py)
        if cc.kv_cache_dtype == "bfloat16":
            return jnp.bfloat16
        return jnp.bfloat16 if mc.dtype == "bfloat16" else jnp.float32

    # ---- sleep / wake (reference: gpu_worker.py:157-204 + CuMemAllocator) --

    def sleep(self, level: int = 1) -> None:
        """Release device memory: KV cache always; weights offloaded to host
        (level 1) or discarded (level 2 — reload needed on wake)."""
        self.kv_caches = None
        if level >= 2:
            self._host_params = None
            self.params = None
        else:
            self._host_params = jax.tree.map(lambda a: np.asarray(a),
                                             self.params)
            self.params = None
        logger.info("runner asleep (level %d)", level)

    def wake_up(self, params=None) -> None:
        if params is not None:
            self.params = params
        elif self._host_params is not None:
            self.params = jax.tree.map(jnp.asarray, self._host_params)
            self._host_params = None
        assert self.params is not None, "level-2 sleep requires params"
        mc = self.config.model_config
        cc = self.config.cache_config
        self.kv_caches = self._make_caches(self._kv_dtype())
        logger.info("runner awake")

    @property
    def is_sleeping(self) -> bool:
        return self.kv_caches is None

    # ---- sharded state save/load (reference: gpu_worker.py:919) -----------

    def save_state(self, path: str) -> None:
        """Persist params as a flat npz for fast reload."""
        import os
        os.makedirs(path, exist_ok=True)
        flat = {}
        def add(p, leaf):
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                           for k in p)
            flat[key] = np.asarray(leaf)
        jax.tree_util.tree_map_with_path(add, self.params)
        np.savez(os.path.join(path, "model_state.npz"), **flat)
        logger.info("saved %d tensors to %s", len(flat), path)

    # ---- offload / staged execution ---------------------------------------

    def _init_offload(self) -> None:
        """Move streamed layers' expert weights into the tiered store and
        build the per-layer jitted stages."""
        from lvllm_tpu.offload.expert_store import TieredExpertStore

        mc = self.config.model_config
        self.expert_store = TieredExpertStore(self.config.offload_config)
        self.moe_layers = [i for i in range(mc.num_hidden_layers)
                           if mc.is_moe_layer(i)]
        expert_keys = ("w1", "w2", "w1_q", "w1_scales", "w2_q", "w2_scales")
        for i in self.moe_layers:
            moe = self.params["layers"][i].get("moe")
            if moe is None:
                continue
            subtree = {k: moe.pop(k) for k in expert_keys if k in moe}
            self.expert_store.register_layer(i, subtree)
        self.streamed_moe_layers = [
            i for i in self.moe_layers
            if not self.expert_store.is_resident(i)]
        logger.info(
            "expert tiering: %d resident / %d streamed MoE layers, "
            "host tier %.1f MB",
            len(self.moe_layers) - len(self.streamed_moe_layers),
            len(self.streamed_moe_layers),
            self.expert_store.host_bytes() / 1e6)

        # Dispatch plan: contiguous non-streamed layers run as one jitted
        # group (one dispatch), each streamed layer is its own dispatch so
        # its freshly-uploaded weights bind per call. Over a remote
        # transport every dispatch costs ~2 ms, so grouping matters.
        streamed_set = set(self.streamed_moe_layers)
        self._offload_plan = []
        run: List[int] = []
        for i in range(mc.num_hidden_layers):
            if i in streamed_set:
                if run:
                    self._offload_plan.append(("resident", tuple(run)))
                    run = []
                self._offload_plan.append(("streamed", (i,)))
            else:
                run.append(i)
        if run:
            self._offload_plan.append(("resident", tuple(run)))

        self._embed_fn = jax.jit(self.model.embed_tokens)

        def group_fn(lps, x, res, pos, kvs, md):
            new_kvs = []
            for lp, kv in zip(lps, kvs):
                x, res, kv = self.model.apply_layer(lp, x, res, pos, kv,
                                                    md, 0)
                new_kvs.append(kv)
            return x, res, new_kvs

        self._group_fn = jax.jit(group_fn, donate_argnums=(4,))
        self._tail_fn = jax.jit(self._tail)
        # Decode-carry advance for staged multi-step: next tokens from the
        # last sample, positions/seq_lens/steps +1, and the new slot map.
        BS = self.block_size

        def adv_fn(sampled, pos, sl, stp, bt):
            tok = sampled[:, -1].astype(jnp.int32)
            pos, sl, stp = pos + 1, sl + 1, stp + 1
            rows = jnp.arange(pos.shape[0], dtype=jnp.int32)
            slot = bt[rows, pos // BS] * BS + pos % BS
            return tok, pos, sl, stp, slot

        self._offload_adv_fn = jax.jit(adv_fn)
        self._offload_scan_decision = None

    def _tail(self, params, x, residual, logits_indices, temperature, top_k,
              top_p, min_p, seeds, steps, penalty_args=None,
              grammar_mask=None, draft_mat=None, draft_q=None):
        hidden = self.model.finalize_hidden(params, x, residual)
        out = self._sample_from_hidden(
            params, hidden, logits_indices, temperature, top_k, top_p,
            min_p, seeds, steps, penalty_args, grammar_mask,
            draft_mat=draft_mat, draft_q=draft_q)
        return out[0], out[1]

    def _execute_staged(self, input_ids, positions, qsl, seq_lens,
                        block_table, slot_mapping, logits_indices,
                        temperature, top_k, top_p, min_p, seeds, steps,
                        penalty_args=None, grammar_mask=None,
                        draft_mat=None, draft_q=None, row_slots=None,
                        decode_mode=False):
        """Layer-by-layer dispatch with host→HBM expert streaming overlapped
        via JAX async dispatch (the fork's prefetch-window decode path,
        SURVEY.md §2.11.6, rebuilt without CUDA streams)."""
        import jax.numpy as jnp  # local alias for clarity

        store = self.expert_store
        if self._offload_use_scan():
            # Whole streamed set fits transiently: bind every streamed
            # layer's weights as ARGUMENTS to one fused step — a single
            # dispatch instead of ~(groups+2). The r05 overlap-leg
            # ablation showed the per-group dispatch boundaries cost a
            # near-constant ~20 ms regardless of streamed bytes (0.83
            # efficiency plateau with 3 MB streamed); transfers still
            # overlap compute because the next step's prefetches kick
            # right after this (async) dispatch.
            merged = self._offload_merged_params()
            kv, packed, _tk, _ = self._step_fn(
                merged, self.kv_caches, input_ids, positions, qsl,
                seq_lens, block_table, slot_mapping, logits_indices,
                temperature, top_k, top_p, min_p, seeds, steps,
                penalty_args=penalty_args, grammar_mask=grammar_mask,
                row_slots=row_slots, decode_mode=decode_mode,
                draft_mat=draft_mat, draft_q=draft_q)
            self.kv_caches = kv
            store.advance(-1, self.streamed_moe_layers)
            return packed[0], jax.lax.bitcast_convert_type(
                packed[1], jnp.float32)

        md = AttentionMetadata(query_start_loc=qsl, seq_lens=seq_lens,
                               block_table=block_table,
                               slot_mapping=slot_mapping,
                               row_slots=row_slots,
                               decode_mode=decode_mode)
        # Warm the prefetch pipeline for the first streamed layers.
        store.advance(-1, self.streamed_moe_layers)

        def layer_params(i):
            lp = self.params["layers"][i]
            if i in self.moe_layers and not store.is_resident(i):
                w = store.get(i)
                store.advance(i, self.streamed_moe_layers)
                return {**lp, "moe": {**lp["moe"], **w}}
            if i in self.moe_layers:
                return {**lp, "moe": {**lp["moe"], **store._hbm[i]}}
            return lp

        x = self._embed_fn(self.params, input_ids, positions)
        residual = jnp.zeros_like(x)
        for kind, idxs in self._offload_plan:
            lps = [layer_params(i) for i in idxs]
            kvs = [self.kv_caches[i] for i in idxs]
            x, residual, new_kvs = self._group_fn(lps, x, residual,
                                                  positions, kvs, md)
            for j, i in enumerate(idxs):
                self.kv_caches[i] = new_kvs[j]
        return self._tail_fn(self.params, x, residual, logits_indices,
                             temperature, top_k, top_p, min_p, seeds, steps,
                             penalty_args=penalty_args,
                             grammar_mask=grammar_mask, draft_mat=draft_mat,
                             draft_q=draft_q)

    def _offload_use_scan(self) -> bool:
        """Pick the multi-step composition mode (OffloadConfig
        .multi_step_mode): scan-constants when the whole streamed set can
        transiently share HBM with resident weights + KV, else staged."""
        if self._offload_scan_decision is not None:
            return self._offload_scan_decision
        mode = self.config.offload_config.multi_step_mode
        if mode in ("scan", "staged"):
            self._offload_scan_decision = mode == "scan"
            return self._offload_scan_decision
        store = self.expert_store
        resident = sum(l.nbytes for l in jax.tree.leaves(self.params))
        resident += sum(l.nbytes for l in jax.tree.leaves(store._hbm))
        kv = sum(l.nbytes for l in jax.tree.leaves(self.kv_caches))
        streamed = store.host_bytes()
        if self.config.offload_config.num_hbm_buffers >= 2:
            streamed *= 2  # double-buffered next-round prefetch
        try:
            limit = jax.devices()[0].memory_stats()["bytes_limit"]
        except Exception:  # noqa: BLE001 — axon/CPU may not report
            limit = 16e9
        self._offload_scan_decision = \
            resident + streamed + kv <= 0.9 * limit
        logger.info(
            "offload multi-step mode: %s (resident %.2f GB + streamed "
            "%.2f GB + kv %.2f GB vs limit %.1f GB)",
            "scan" if self._offload_scan_decision else "staged",
            resident / 1e9, streamed / 1e9, kv / 1e9, limit / 1e9)
        return self._offload_scan_decision

    def _offload_merged_params(self):
        """Full params tree with every MoE layer's expert weights bound on
        device — cold layers stream in once (then live for the scan)."""
        store = self.expert_store
        for i in self.streamed_moe_layers:  # pipeline all uploads
            store.prefetch(i)
        params = dict(self.params)
        layers = list(params["layers"])
        for i in self.moe_layers:
            moe = layers[i].get("moe")
            if moe is None:
                continue
            w = store._hbm[i] if store.is_resident(i) else store.get(i)
            layers[i] = {**layers[i], "moe": {**moe, **w}}
        params["layers"] = layers
        return params

    def _staged_multi_step(self, tokens, positions, seq_lens, block_table,
                           temperature, top_k, top_p, min_p, seeds, steps,
                           horizon, greedy_only, row_slots=None):
        """Horizon decode with per-layer streaming: the decode carry
        (tokens/positions/seq_lens/slot) stays on device between steps, so
        the host dispatches ~(groups+3) async calls per step and fetches
        ONE packed result per horizon. Streamed layers re-upload each step
        (the does-not-fit-HBM regime) overlapped with compute via the
        prefetch thread."""
        R = int(tokens.shape[0])
        qsl = jnp.arange(R + 1, dtype=jnp.int32)
        li = jnp.arange(R, dtype=jnp.int32)[:, None]
        tok = jnp.asarray(tokens)
        pos = jnp.asarray(positions)
        sl = jnp.asarray(seq_lens)
        stp = jnp.asarray(steps)
        bt = jnp.asarray(block_table)
        pos_np = positions
        slot = jnp.asarray(
            (block_table[np.arange(R), pos_np // self.block_size]
             * self.block_size + pos_np % self.block_size).astype(np.int32))
        toks_h, lps_h = [], []
        for _ in range(horizon):
            sampled, logprobs = self._execute_staged(
                tok, pos, qsl, sl, bt, slot, li, temperature, top_k,
                top_p, min_p, seeds, stp, row_slots=row_slots,
                decode_mode=True)
            toks_h.append(sampled)
            lps_h.append(logprobs)
            tok, pos, sl, stp, slot = self._offload_adv_fn(
                sampled, pos, sl, stp, bt)
        packed = jnp.stack([
            jnp.concatenate(toks_h, axis=1).T,
            jax.lax.bitcast_convert_type(
                jnp.concatenate(lps_h, axis=1).T.astype(jnp.float32),
                jnp.int32)])                               # [2, H, R]
        return self.kv_caches, packed

    # ---- pipeline-parallel staged execution --------------------------------

    def _init_pipeline(self) -> None:
        """Partition layers into ``pp`` contiguous stages, place each
        stage's params + KV slice on its own device, and jit one stage
        function per stage. The first stage embeds (and resolves async
        placeholder tokens); the last runs final norm + logits + sampling,
        so only [T, H] activations cross stage edges."""
        from lvllm_tpu.parallel.pipeline import partition_layers

        mc = self.config.model_config
        devices = jax.devices()
        assert len(devices) >= self.pp, \
            f"pp={self.pp} needs {self.pp} devices, have {len(devices)}"
        self.pp_devices = list(devices[:self.pp])
        self.pp_stages = partition_layers(mc.num_hidden_layers, self.pp)

        def put(tree, dev):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, dev), tree)

        params = self.params
        S = self.pp
        self.pp_stage_params = []
        for s, rng in enumerate(self.pp_stages):
            sp = {"layers": [params["layers"][i] for i in rng]}
            if s == 0:
                sp["embed"] = params["embed"]
            if s == S - 1:
                sp["norm"] = params["norm"]
                if "lm_head" in params:
                    sp["lm_head"] = params["lm_head"]
                if mc.tie_word_embeddings:
                    sp["embed"] = params["embed"]
            self.pp_stage_params.append(put(sp, self.pp_devices[s]))
            for i in rng:
                self.kv_caches[i] = jax.device_put(self.kv_caches[i],
                                                   self.pp_devices[s])
        # Stage copies own the weights now; drop the fused tree so HBM on
        # the default device is not double-booked.
        self.params = None

        model = self.model

        def make_stage(s: int, rng: range):
            first, last = s == 0, s == S - 1

            def stage_fn(sp, kvs, x, residual, input_ids, positions, qsl,
                         seq_lens, block_table, slot_mapping,
                         logits_indices, temperature, top_k, top_p, min_p,
                         seeds, steps, penalty_args=None, grammar_mask=None,
                         async_args=None, greedy_only=False,
                         want_topk_logprobs=False):
                md = AttentionMetadata(
                    query_start_loc=qsl, seq_lens=seq_lens,
                    block_table=block_table, slot_mapping=slot_mapping)
                if first:
                    if async_args is not None:
                        prev_sampled, ph_rows = async_args
                        fill = prev_sampled[0, ph_rows, -1]
                        input_ids = jnp.where(input_ids < 0, fill, input_ids)
                    x = model.embed_tokens(sp, input_ids, positions)
                    residual = jnp.zeros_like(x)
                new_kvs = []
                for j, i in enumerate(rng):
                    x, residual, kv = model.apply_layer(
                        sp["layers"][j], x, residual, positions, kvs[j],
                        md, i)
                    new_kvs.append(kv)
                if not last:
                    return x, residual, new_kvs
                hidden = model.finalize_hidden(sp, x, residual)
                sampled, logprobs, topk = self._sample_from_hidden(
                    sp, hidden, logits_indices, temperature, top_k, top_p,
                    min_p, seeds, steps, penalty_args, grammar_mask,
                    greedy_only, want_topk_logprobs)
                packed = jnp.stack([
                    sampled,
                    jax.lax.bitcast_convert_type(
                        logprobs.astype(jnp.float32), jnp.int32)])
                return packed, topk, new_kvs

            return jax.jit(stage_fn, donate_argnums=(1,),
                           static_argnames=("greedy_only",
                                            "want_topk_logprobs"))

        self.pp_stage_fns = [make_stage(s, rng)
                             for s, rng in enumerate(self.pp_stages)]

    def _execute_pipelined(self, input_ids, positions, qsl, seq_lens,
                           block_table, slot_mapping, logits_indices,
                           temperature, top_k, top_p, min_p, seeds, steps,
                           penalty_args=None, grammar_mask=None,
                           async_args=None, greedy_only=False,
                           want_topk=False):
        """Run one batch through the staged pipeline. Returns
        (packed [2, R, S1], topk). Dispatches are async — with the
        engine-level batch queue (EngineCore, depth = pp) a later batch's
        early stages overlap this batch's late stages."""
        empty = jnp.zeros((0,), jnp.bfloat16)
        x, residual = empty, empty
        common = (positions, qsl, seq_lens, block_table, slot_mapping,
                  logits_indices, temperature, top_k, top_p, min_p, seeds,
                  steps)
        for s in range(self.pp):
            dev = self.pp_devices[s]
            rng = self.pp_stages[s]
            kvs = [self.kv_caches[i] for i in rng]
            args = jax.device_put((x, residual, input_ids) + common, dev)
            pen = jax.device_put(penalty_args, dev) \
                if penalty_args is not None and s == self.pp - 1 else None
            gm = jax.device_put(grammar_mask, dev) \
                if grammar_mask is not None and s == self.pp - 1 else None
            aa = jax.device_put(async_args, dev) \
                if async_args is not None and s == 0 else None
            out = self.pp_stage_fns[s](
                self.pp_stage_params[s], kvs, *args, penalty_args=pen,
                grammar_mask=gm, async_args=aa, greedy_only=greedy_only,
                want_topk_logprobs=want_topk)
            if s < self.pp - 1:
                x, residual, new_kvs = out
            else:
                packed, topk, new_kvs = out
            for j, i in enumerate(rng):
                self.kv_caches[i] = new_kvs[j]
        return packed, topk

    # ---- jitted step -------------------------------------------------------

    def _step(self, params, kv_caches, input_ids, positions, query_start_loc,
              seq_lens, block_table, slot_mapping, logits_indices,
              temperature, top_k, top_p, min_p, seeds, steps,
              penalty_args=None, grammar_mask=None, lora=None,
              token_adapter=None, row_slots_lora=None, async_args=None,
              greedy_only=False,
              row_slots=None, want_topk_logprobs=False,
              single_seq_prefill=False, pcp_prefill=False, mm_embeds=None,
              mm_mask=None, mm_deepstack=None,
              dcp_slot_mapping=None, want_hidden=False,
              cascade_args=None, aux_layers=(), draft_mat=None,
              draft_q=None, cross_args=None, decode_mode=False,
              prefix_lens=None, kv_copy=None):
        if kv_copy is not None:
            # Multi-candidate speculation: copy each straddling canonical
            # block into its chain-private scratch block BEFORE this
            # step's KV scatter, so extra-chain rows see the block's
            # earlier (real) tokens while writing their own drafts at
            # positions >= num_computed. Pad pairs are (0, 0) no-ops.
            src, dst = kv_copy

            def _cp_blocks(leaf):
                if hasattr(leaf, "ndim") and leaf.ndim >= 3 and \
                        leaf.shape[0] == 2:
                    return leaf.at[:, dst].set(leaf[:, src])
                return leaf
            kv_caches = jax.tree.map(_cp_blocks, kv_caches)
        if async_args is not None:
            # Async scheduling: placeholder inputs (-1) read the previous
            # step's on-device sampled tokens — no host round-trip.
            prev_sampled, ph_rows = async_args
            fill = prev_sampled[0, ph_rows, -1]
            input_ids = jnp.where(input_ids < 0, fill, input_ids)
        casc = cascade_args or (None, None, None, None)
        md = AttentionMetadata(
            query_start_loc=query_start_loc,
            seq_lens=seq_lens,
            block_table=block_table,
            slot_mapping=slot_mapping,
            row_slots=row_slots,
            single_seq_prefill=single_seq_prefill,
            pcp_prefill=pcp_prefill,
            decode_mode=decode_mode,
            dcp_slot_mapping=dcp_slot_mapping,
            cascade_prefix_blocks=casc[0],
            cascade_prefix_len=casc[1],
            cascade_suffix_block_table=casc[2],
            cascade_suffix_seq_lens=casc[3],
            cross_kv=cross_args[0] if cross_args is not None else None,
            cross_slots=cross_args[1] if cross_args is not None else None,
            prefix_lens=prefix_lens,
        )
        mm_kwargs = {}
        if mm_embeds is not None:
            mm_kwargs = dict(mm_embeds=mm_embeds, mm_mask=mm_mask)
            if mm_deepstack is not None:
                mm_kwargs["mm_deepstack"] = mm_deepstack
        aux = None
        if aux_layers:
            hidden, kv_caches, aux = self.model(
                params, input_ids, positions, kv_caches, md, lora=lora,
                token_adapter=token_adapter, aux_hidden_layers=aux_layers,
                **mm_kwargs)
        else:
            hidden, kv_caches = self.model(params, input_ids, positions,
                                           kv_caches, md, lora=lora,
                                           token_adapter=token_adapter,
                                           **mm_kwargs)
        sampled, logprobs, topk = self._sample_from_hidden(
            params, hidden, logits_indices, temperature, top_k, top_p,
            min_p, seeds, steps, penalty_args, grammar_mask, greedy_only,
            want_topk_logprobs, draft_mat=draft_mat, draft_q=draft_q,
            lora=lora, row_adapter=row_slots_lora)
        # Pack tokens + bitcast logprobs into ONE i32 array so the host
        # syncs the step with a single device->host fetch — on remote
        # transports (axon tunnel, multi-host) every fetch is a full RTT.
        packed = jnp.stack([
            sampled,
            jax.lax.bitcast_convert_type(logprobs.astype(jnp.float32),
                                         jnp.int32)])        # [2, R, S1]
        feats = aux if aux_layers else hidden
        return kv_caches, packed, topk, (feats if want_hidden else None)

    MAX_TOPK_LOGPROBS = 8

    def _sample_from_hidden(self, params, hidden, logits_indices,
                            temperature, top_k, top_p, min_p, seeds, steps,
                            penalty_args, grammar_mask=None,
                            greedy_only=False, want_topk_logprobs=False,
                            draft_mat=None, draft_q=None, lora=None,
                            row_adapter=None):
        """Sample at every verification position: logits_indices [R, S+1]
        (S=0 without spec decode). Sampling params are broadcast per row;
        the PRNG fold offsets by position so each slot draws independently.
        Returns (sampled [R, S+1], logprobs [R, S+1])."""
        R, S1 = logits_indices.shape
        sel = hidden[logits_indices.reshape(-1)]          # [R*S1, H]
        logits = self.model.compute_logits(params, sel)
        if lora is not None and "lm_head" in lora and \
                row_adapter is not None:
            # LM-head adapter (reference: vllm/lora logits-processor
            # wrapper): same SGMV as any projection, per sampled row.
            from lvllm_tpu.lora.layers import apply_lora
            logits = apply_lora(sel, logits, lora["lm_head"],
                                jnp.repeat(row_adapter, S1))
        if penalty_args is not None:
            # Penalties use each row's history; tile rows to positions.
            tiled = tuple(jnp.repeat(a, S1, axis=0) for a in penalty_args)
            logits = apply_penalties_from_history(logits, *tiled)
        if grammar_mask is not None:
            # Grammar bitmask (structured output): [R, V] bool, True=allowed.
            gm = jnp.repeat(grammar_mask, S1, axis=0)
            logits = jnp.where(gm, logits, -jnp.inf)
        rep = lambda a: jnp.repeat(a, S1, axis=0)  # noqa: E731
        st = SamplingTensors(temperature=rep(temperature), top_k=rep(top_k),
                             top_p=rep(top_p), min_p=rep(min_p),
                             keys=rep(seeds))
        steps_mat = (steps[:, None] +
                     jnp.arange(S1, dtype=jnp.int32)[None, :]).reshape(-1)
        sampled = sample(logits, st, steps_mat, greedy_only=greedy_only)
        if draft_mat is not None:
            # Stochastic (lossless) verification for non-greedy rows with
            # drafts; greedy rows keep the host exact-match path. Sampled
            # drafts ship their proposal distribution as (values [NQ, S1,
            # V], rows [NQ]); the one-hot q of deterministic rows is
            # synthesized here on device (the general-q path with a
            # one-hot q is numerically identical to the one-hot path).
            qv = None
            if draft_q is not None:
                q_vals, q_rows = draft_q
                Vq = logits.shape[-1]
                q_base = jax.nn.one_hot(jnp.clip(draft_mat, 0, Vq - 1),
                                        Vq, dtype=jnp.float32)
                q_full = q_base.at[q_rows].set(q_vals, mode="drop")
                qv = q_full.reshape(-1, Vq)
            sampled = rejection_sample(logits, st, steps_mat,
                                       draft_mat.reshape(-1), sampled,
                                       draft_q=qv)
        logprobs = compute_logprobs(logits, sampled)
        topk = None
        if want_topk_logprobs:
            K = self.MAX_TOPK_LOGPROBS
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            vals, ids = jax.lax.top_k(logp, K)
            topk = (vals.reshape(R, S1, K), ids.reshape(R, S1, K))
        return sampled.reshape(R, S1), logprobs.reshape(R, S1), topk

    # ---- multi-step decode ---------------------------------------------------

    def _multi_step(self, params, kv_caches, tokens, positions, seq_lens,
                    block_table, temperature, top_k, top_p, min_p, seeds,
                    steps, horizon, greedy_only=False, mrope_delta=None,
                    cross_args=None, row_slots=None):
        """H decode iterations in one jitted lax.scan: tokens sampled on
        device feed the next iteration's input; the host fetches ONE packed
        [2, H, R] result. Sampling PRNG folds per-row decode position, so
        outputs are bit-identical to H single steps. Hybrid models
        (GDN/Mamba layer_types) compose: their conv/recurrent state
        arrays are part of ``kv_caches`` and ride the scan carry exactly
        like paged KV; ``row_slots`` maps batch rows to persistent state
        slots (r03 VERDICT next #1)."""
        R = tokens.shape[0]
        BS = self.block_size
        qsl = jnp.arange(R + 1, dtype=jnp.int32)
        rows = jnp.arange(R, dtype=jnp.int32)
        st = SamplingTensors(temperature=temperature, top_k=top_k,
                             top_p=top_p, min_p=min_p, keys=seeds)

        def body(carry, _):
            kv, toks, pos, sl, stp = carry
            slot = block_table[rows, pos // BS] * BS + pos % BS
            # Enc-dec (Whisper): the cross-KV pool is loop-invariant over
            # the horizon — it rides as a scan constant, so audio decode
            # gets the same RTT amortization as text decode.
            md = AttentionMetadata(
                query_start_loc=qsl, seq_lens=sl,
                block_table=block_table, slot_mapping=slot,
                row_slots=row_slots, decode_mode=True,
                cross_kv=cross_args[0] if cross_args is not None else None,
                cross_slots=(cross_args[1] if cross_args is not None
                             else None))
            # Decode M-RoPE positions: all three streams equal pos+delta.
            model_pos = (pos if mrope_delta is None else
                         jnp.broadcast_to((pos + mrope_delta)[None],
                                          (3, R)))
            hidden, kv = self.model(params, toks, model_pos, kv, md)
            logits = self.model.compute_logits(params, hidden)
            new = sample(logits, st, stp, greedy_only=greedy_only)
            lp = compute_logprobs(logits, new)
            return (kv, new, pos + 1, sl + 1, stp + 1), (new, lp)

        init = (kv_caches, tokens, positions, seq_lens, steps)
        (kv_caches, *_), (toks_h, lps_h) = jax.lax.scan(
            body, init, None, length=horizon)
        packed = jnp.stack([
            toks_h,
            jax.lax.bitcast_convert_type(lps_h.astype(jnp.float32),
                                         jnp.int32)])       # [2, H, R]
        return kv_caches, packed

    def _can_multi_step(self, so, grammar_masks) -> bool:
        """Horizon execution excludes features that need per-step host
        state (grammar advance, penalties history, top-k logprobs, LoRA)
        or a different execution scheme (spec, EAGLE, DCP). Hybrid
        layer_types models (GDN/Mamba state caches) compose: states ride
        the scan carry, rows mapped to state slots via row_slots. Expert
        offload composes: streamed weights are either loop-invariant scan
        constants or re-streamed per staged step (_offload_use_scan). The
        scheduler pre-allocated lookahead blocks either way, so falling
        back to one step is always safe."""
        if (self.num_spec
                or self.eagle_proposer is not None or self.dcp > 1
                or self.pp > 1
                or grammar_masks):
            return False
        if self.is_enc_dec and (self._cross_pool is None
                                or self.expert_store is not None):
            return False  # cross pool must exist to ride as scan constant
        if self.expert_store is not None and self.uses_mrope:
            return False  # staged/scan decode paths are text-only
        ib = self.input_batch
        rows = [ib.req_id_to_index[rid] for rid in so.num_scheduled_tokens]
        if not rows:
            return False
        if ib.has_penalty[rows].any() or (ib.num_logprobs[rows] > 0).any():
            return False
        if self.lora_manager is not None and ib.lora_slot[rows].any():
            return False
        return True

    def _execute_multi_step(self, so: SchedulerOutput,
                            horizon: int) -> ModelRunnerOutput:
        ib = self.input_batch
        R = self.max_num_reqs
        scheduled = sorted(so.num_scheduled_tokens,
                           key=lambda rid: ib.req_id_to_index[rid])
        tokens = np.zeros(R, np.int32)
        positions = np.zeros(R, np.int32)
        # Inactive rows attend exactly their own null-block key (seq_len 1,
        # not 0): a fully-masked softmax yields NaN rows whose K/V would be
        # written to the null block and then poison active rows through the
        # 0·NaN contraction over masked columns.
        seq_lens = np.ones(R, np.int32)
        block_table = np.zeros((R, self.max_blocks_per_req), np.int32)
        steps = np.zeros(R, np.int32)
        for r, rid in enumerate(scheduled):
            idx = ib.req_id_to_index[rid]
            pos = ib.num_computed_tokens[idx]
            tokens[r] = ib.token_ids[idx, pos]
            positions[r] = pos
            seq_lens[r] = pos + 1
            block_table[r] = ib.block_table[idx]
            steps[r] = max(pos + 1 - ib.num_prompt_tokens[idx], 0)

        rows = [ib.req_id_to_index[rid] for rid in scheduled]
        pad_rows = rows + [0] * (R - len(rows))
        greedy_only = bool(np.all(ib.temperature[rows] == 0.0))
        mrope_kw = {}
        if self.uses_mrope:
            deltas = np.zeros(R, np.int32)
            for r, rid in enumerate(scheduled):
                deltas[r] = self._mrope_delta.get(rid, 0)
            mrope_kw = {"mrope_delta": jnp.asarray(deltas)}
        if self.is_enc_dec and self._cross_pool is not None:
            cs = np.full(R, self.max_num_reqs, dtype=np.int32)
            for r, rid in enumerate(scheduled):
                cs[r] = ib.req_id_to_index[rid]
            mrope_kw["cross_args"] = (self._cross_pool, jnp.asarray(cs))
        if self.config.model_config.layer_types is not None:
            # Hybrid state slots: active rows map to their persistent
            # batch slot; inactive rows write the scratch slot.
            rs = np.full(R, self.max_num_reqs, dtype=np.int32)
            for r, rid in enumerate(scheduled):
                rs[r] = ib.req_id_to_index[rid]
            mrope_kw["row_slots"] = jnp.asarray(rs)
        self.step_counter += 1
        if self.expert_store is not None and not self._offload_use_scan():
            kv, packed = self._staged_multi_step(
                tokens, positions, seq_lens, block_table,
                jnp.asarray(ib.temperature[pad_rows]),
                jnp.asarray(ib.top_k[pad_rows]),
                jnp.asarray(ib.top_p[pad_rows]),
                jnp.asarray(ib.min_p[pad_rows]),
                jnp.asarray(ib.seeds[pad_rows]),
                jnp.asarray(steps), horizon, greedy_only,
                row_slots=mrope_kw.get("row_slots"))
        else:
            step_params = self.params
            if self.expert_store is not None:
                step_params = self._offload_merged_params()
            kv, packed = self._multi_step_fn(
                step_params, self.kv_caches,
                jnp.asarray(tokens), jnp.asarray(positions),
                jnp.asarray(seq_lens), jnp.asarray(block_table),
                jnp.asarray(ib.temperature[pad_rows]),
                jnp.asarray(ib.top_k[pad_rows]),
                jnp.asarray(ib.top_p[pad_rows]),
                jnp.asarray(ib.min_p[pad_rows]),
                jnp.asarray(ib.seeds[pad_rows]),
                jnp.asarray(steps), horizon=horizon,
                greedy_only=greedy_only, **mrope_kw)
            if self.expert_store is not None and \
                    self.config.offload_config.num_hbm_buffers >= 2:
                # Double-buffer: upload next round's cold weights while the
                # scan computes (the fork's prefetch-window overlap at
                # whole-set granularity).
                for i in self.streamed_moe_layers:
                    self.expert_store.prefetch(i)
        self.kv_caches = kv

        packed_np = np.asarray(packed)                 # one fetch [2, H, R]
        toks_np = packed_np[0]
        lps_np = packed_np[1].view(np.float32)
        out = ModelRunnerOutput(sampled_token_ids={}, logprobs={})
        for r, rid in enumerate(scheduled):
            idx = ib.req_id_to_index[rid]
            emitted = [int(t) for t in toks_np[:, r]]
            out.sampled_token_ids[rid] = emitted
            if ib.wants_logprobs[idx]:
                out.logprobs[rid] = [float(x) for x in lps_np[:, r]]
            nt = ib.num_tokens[idx]
            ib.token_ids[idx, nt:nt + horizon] = emitted
            ib.num_tokens[idx] = nt + horizon
            ib.num_computed_tokens[idx] = positions[r] + horizon
        return out

    def execute_dummy_batch(self) -> None:
        """One forward over padding rows only (reference:
        execute_dummy_batch, v1/worker/dp_utils.py): row 0 attends its own
        null-block key (seq_len 1, like multi-step's inactive rows) and the
        sampled token is discarded. Reuses the smallest decode bucket's
        compiled executable."""
        if self.pp > 1 or self.expert_store is not None or self.dcp > 1 \
                or self.config.model_config.layer_types is not None:
            return  # staged/sharded-cache paths have no plain step to align
        sc = self.config.scheduler_config
        T = sc.token_buckets[0]
        R = self.max_num_reqs
        S1 = self.num_spec + 1
        pos = jnp.zeros((3, T) if self.uses_mrope else T, jnp.int32)
        kv, packed, _tk, _h = self._step_fn(
            self.params, self.kv_caches,
            jnp.zeros(T, jnp.int32), pos,
            jnp.zeros(R + 1, jnp.int32), jnp.ones(R, jnp.int32),
            jnp.zeros((R, self.max_blocks_per_req), jnp.int32),
            jnp.zeros(T, jnp.int32), jnp.zeros((R, S1), jnp.int32),
            jnp.zeros(R, jnp.float32), jnp.zeros(R, jnp.int32),
            jnp.ones(R, jnp.float32), jnp.zeros(R, jnp.float32),
            jnp.zeros(R, jnp.uint32), jnp.zeros(R, jnp.int32),
            greedy_only=True)
        self.kv_caches = kv

    # ---- batch maintenance -------------------------------------------------

    def _update_states(self, so: SchedulerOutput) -> None:
        """Apply scheduler diffs to the persistent batch (reference:
        gpu_model_runner._update_states:1061)."""
        ib = self.input_batch
        for rid in so.finished_req_ids:
            ib.remove_request(rid)
            self.draft_q_store.pop(rid, None)
            self._mm_feats.pop(rid, None)
            self._mm_positions.pop(rid, None)
            self._mm_raw.pop(rid, None)
            self._mrope_pos.pop(rid, None)
            self._mrope_delta.pop(rid, None)
            if self.eagle_proposer is not None:
                self.eagle_proposer.free(rid)
        for rid in so.preempted_req_ids:
            ib.remove_request(rid)
            if self.eagle_proposer is not None:
                self.eagle_proposer.free(rid)
        for nr in so.scheduled_new_reqs:
            ib.add_request(
                nr.req_id, nr.prompt_token_ids, nr.prompt_token_ids,
                nr.block_ids, nr.num_computed_tokens, nr.sampling_params,
                lora_slot=nr.lora_int_id)
            if getattr(nr, "mm_data", None) and \
                    getattr(self.model, "is_multimodal", False):
                self._encode_mm(nr.req_id, nr.prompt_token_ids, nr.mm_data)
        for cr in so.scheduled_cached_reqs:
            if cr.resumed_from_preemption:
                # Re-register with full state (tokens/blocks re-learned).
                if cr.req_id in ib.req_id_to_index:
                    ib.remove_request(cr.req_id)
                sp = self._sampling_params_cache[cr.req_id]
                n_prompt = self._prompt_len_cache[cr.req_id]
                ib.add_request(cr.req_id, cr.all_token_ids[:n_prompt],
                               cr.all_token_ids, cr.all_block_ids,
                               cr.num_computed_tokens, sp)
                if cr.req_id in self._mm_raw and \
                        cr.req_id not in self._mm_feats:
                    # Resume after the encoder cache freed the features:
                    # re-encode (processor cache makes this a lookup).
                    self._encode_mm(cr.req_id,
                                    cr.all_token_ids[:n_prompt],
                                    self._mm_raw[cr.req_id])
            else:
                if cr.new_block_ids:
                    ib.append_block_ids(cr.req_id, cr.new_block_ids)
                idx = ib.req_id_to_index[cr.req_id]
                ib.num_computed_tokens[idx] = cr.num_computed_tokens
        # Keep caches for possible preemption resume.
        for nr in so.scheduled_new_reqs:
            self._sampling_params_cache[nr.req_id] = nr.sampling_params
            self._prompt_len_cache[nr.req_id] = len(nr.prompt_token_ids)
        for rid in so.finished_req_ids:
            self._sampling_params_cache.pop(rid, None)
            self._prompt_len_cache.pop(rid, None)

    def _encode_mm(self, rid: str, prompt_token_ids, mm_data: dict) -> None:
        """Encode a request's images once; cache projected features and
        the placeholder positions within the prompt."""
        import jax.numpy as jnp
        if self.is_enc_dec:
            # Audio (Whisper): encoder runs once; per-layer cross K/V park
            # in the persistent pool at the request's batch slot.
            self._mm_raw[rid] = mm_data
            if "cross_kv" in mm_data:
                # EC transfer (P/D disagg): the prefill engine already ran
                # the encoder; park its cross-KV directly.
                ckv = jnp.asarray(mm_data["cross_kv"])
            else:
                feats = np.asarray(mm_data["input_features"], np.float32)
                if feats.ndim == 2:
                    feats = feats[None]
                enc = self._encode_audio_fn(self.params,
                                            jnp.asarray(feats))[0]
                ckv = self._cross_kv_fn(self.params, enc)  # [L,2,S,H,Dh]
            if self._cross_pool is None:
                L, _, S, H, Dh = ckv.shape
                self._cross_pool = jnp.zeros(
                    (L, 2, self.max_num_reqs + 1, S, H, Dh), ckv.dtype)
            slot = self.input_batch.req_id_to_index[rid]
            self._cross_pool = self._cross_set_fn(self._cross_pool, ckv,
                                                  slot)
            return
        self._mm_raw[rid] = mm_data
        ids = np.asarray(prompt_token_ids)
        if getattr(self.model, "mm_dynamic", False):
            feats = self._encode_images_fn(
                self.params, {**mm_data, "_input_ids": ids})
            self._mm_feats[rid] = np.asarray(feats, np.float32)
            if self.uses_mrope:
                pos3, delta = self.model.mm_positions(ids, mm_data)
                self._mrope_pos[rid] = pos3
                self._mrope_delta[rid] = delta
            # Models with multiple placeholder kinds (Phi-4-MM image +
            # audio) expose mm_token_ids; default is the image token.
            toks = getattr(self.model, "mm_token_ids", None) or \
                (self.config.model_config.image_token_id,)
            self._mm_positions[rid] = np.where(
                np.isin(ids, np.asarray(list(toks))))[0]
            if len(self._mm_positions[rid]) != self._mm_feats[rid].shape[0]:
                raise ValueError(
                    f"request {rid}: {len(self._mm_positions[rid])} image "
                    f"placeholder tokens vs {self._mm_feats[rid].shape[0]} "
                    f"image features")
            return
        pix_np = np.asarray(mm_data["pixel_values"], np.float32)
        import hashlib
        key = hashlib.sha256(pix_np.tobytes()).hexdigest()[:32]
        cached = self._mm_processor_cache.get(key)
        if cached is not None:
            self.mm_stats["processor_cache_hits"] += 1
            self._mm_feats[rid] = cached
        else:
            self.mm_stats["processor_cache_misses"] += 1
            feats = self._encode_images_fn(self.params,
                                           jnp.asarray(pix_np))  # [B, N, H]
            H = feats.shape[-1]
            flat = np.asarray(feats, np.float32).reshape(-1, H)
            self._mm_feats[rid] = flat
            self._mm_processor_cache[key] = flat
            self._mm_cache_order.append(key)
            if len(self._mm_cache_order) > self.MM_PROCESSOR_CACHE_SIZE:
                evict = self._mm_cache_order.pop(0)
                self._mm_processor_cache.pop(evict, None)
        img_tok = self.config.model_config.image_token_id
        self._mm_positions[rid] = np.where(ids == img_tok)[0]
        if len(self._mm_positions[rid]) != self._mm_feats[rid].shape[0]:
            raise ValueError(
                f"request {rid}: {len(self._mm_positions[rid])} image "
                f"placeholder tokens vs {self._mm_feats[rid].shape[0]} "
                f"image features")

    # ---- execution ---------------------------------------------------------

    def execute_model(self, so: SchedulerOutput, grammar_masks=None,
                      async_mode: bool = False):
        """Returns ModelRunnerOutput, or an in-flight StepHandle when
        async_mode (finalize() syncs it)."""
        if async_mode:
            assert self.num_spec == 0, "async scheduling excludes spec decode"
        self._update_states(so)
        if so.total_num_scheduled_tokens == 0:
            return ModelRunnerOutput()
        horizon = getattr(so, "decode_horizon", 1)
        if horizon > 1 and not async_mode and \
                self._can_multi_step(so, grammar_masks):
            return self._execute_multi_step(so, horizon)

        ib = self.input_batch
        sc = self.config.scheduler_config
        R = self.max_num_reqs
        T = sc.pad_tokens_to_bucket(so.total_num_scheduled_tokens)

        S1 = self.num_spec + 1
        input_ids = np.zeros(T, dtype=np.int32)
        positions = np.zeros(T, dtype=np.int32)
        # M-RoPE position streams [3, T]; text-only rows mirror positions.
        mrope_np = (np.zeros((3, T), dtype=np.int32)
                    if self.uses_mrope else None)
        slot_mapping = np.zeros(T, dtype=np.int32)
        qsl = np.zeros(R + 1, dtype=np.int32)
        seq_lens = np.zeros(R, dtype=np.int32)
        block_table = np.zeros((R, self.max_blocks_per_req), dtype=np.int32)
        logits_indices = np.zeros((R, S1), dtype=np.int32)
        draft_np = np.full((R, S1), -1, dtype=np.int32)

        # Encoder cache: drop per-request features once every placeholder
        # position has been computed into KV (reference: encoder-cache
        # manager) — decode steps never re-read them.
        for rid in list(self._mm_feats):
            idx = ib.req_id_to_index.get(rid)
            if idx is None:
                continue
            pos_arr = self._mm_positions.get(rid)
            if pos_arr is not None and len(pos_arr) and \
                    ib.num_computed_tokens[idx] > int(pos_arr[-1]):
                del self._mm_feats[rid]
                self._mm_positions.pop(rid, None)
                self.mm_stats["encoder_cache_freed"] += 1

        # Order requests by their batch slot for a stable layout.
        scheduled = [(rid, n) for rid, n in so.num_scheduled_tokens.items()]
        scheduled.sort(key=lambda x: ib.req_id_to_index[x[0]])

        t = 0
        row = 0
        row_req_ids: List[Optional[str]] = []
        row_drafts: List[List[int]] = []
        row_samples: List[bool] = []
        row_chain: List[int] = []     # chain index; -1 = single-chain row
        chain_groups: Dict[str, List[int]] = {}
        copy_src: List[int] = []      # straddling-block copies for extra
        copy_dst: List[int] = []      # chains (canonical -> scratch)
        ph_rows = np.zeros(T, dtype=np.int32)
        has_placeholder = False
        row_starts: List[int] = []
        row_t0s: List[int] = []
        dcp_slot = (np.zeros((self.dcp, T), dtype=np.int32)
                    if self.dcp > 1 else None)
        for rid, n_tok in scheduled:
            idx = ib.req_id_to_index[rid]
            drafts = so.scheduled_spec_decode_tokens.get(rid, [])
            # Multi-candidate (tree) speculation: chains past the first
            # become extra rows below; this (chain-0) row carries only
            # base + chain-0 tokens.
            chains = so.spec_chains.get(rid)
            extra_chains: List = []
            if chains and len(chains) > 1:
                start_c = int(ib.num_computed_tokens[idx])
                base_c = int(ib.num_tokens[idx]) - start_c
                n_extra = len(chains) - 1
                if row + 1 + n_extra <= R:
                    drafts = chains[0]
                    n_tok = base_c + len(drafts)
                    extra_chains = list(zip(
                        chains[1:], so.spec_scratch_blocks[rid]))
                else:
                    drafts = chains[0]          # rows exhausted: chain 0
                    n_tok = base_c + len(drafts)
                chain_groups[rid] = [row + j
                                     for j in range(1 + len(extra_chains))]
            if drafts:
                # Stage draft tokens after the known tokens so the input
                # slice below picks them up (num_tokens NOT advanced —
                # they're unverified).
                nt = ib.num_tokens[idx]
                ib.token_ids[idx, nt:nt + len(drafts)] = drafts
            start = ib.num_computed_tokens[idx]
            end = start + n_tok
            input_ids[t:t + n_tok] = ib.token_ids[idx, start:end]
            positions[t:t + n_tok] = np.arange(start, end)
            if mrope_np is not None:
                mp = self._mrope_pos.get(rid)
                if mp is None:
                    mrope_np[:, t:t + n_tok] = positions[t:t + n_tok]
                else:
                    delta = self._mrope_delta.get(rid, 0)
                    L_pre = mp.shape[1]
                    n_pre = max(min(end, L_pre) - start, 0)
                    if n_pre:
                        mrope_np[:, t:t + n_pre] = mp[:, start:start + n_pre]
                    if n_pre < n_tok:
                        tail = np.arange(start + n_pre, end) + delta
                        mrope_np[:, t + n_pre:t + n_tok] = tail
            blocks = ib.block_table[idx]
            tok_pos = np.arange(start, end)
            if self.dcp > 1:
                # Page-granularity interleave: logical page j → shard
                # j % CP, local page j // CP. Non-owner shards write the
                # token into the null block (slot < block_size).
                bs, cp = self.block_size, self.dcp
                owner = (tok_pos // bs) % cp
                lslot = (blocks[tok_pos // (bs * cp)] * bs + tok_pos % bs)
                for s in range(cp):
                    dcp_slot[s, t:t + n_tok] = np.where(
                        owner == s, lslot, tok_pos % bs)
            else:
                slot_mapping[t:t + n_tok] = (
                    blocks[tok_pos // self.block_size] * self.block_size +
                    tok_pos % self.block_size)
            qsl[row + 1] = t + n_tok
            seq_lens[row] = end
            block_table[row] = blocks
            # Right-aligned verification positions: column S1-1 is the last
            # scheduled token; with k drafts, columns S1-1-k .. S1-1 cover
            # the draft run (earlier columns clamp to the first of those).
            k = len(drafts)
            last = t + n_tok - 1
            for j in range(S1):
                back = min(S1 - 1 - j, k)
                logits_indices[row, j] = max(last - back, t)
            # Column S1-1-k+i samples the token that verifies drafts[i];
            # -1 marks draft-free columns (incl. the bonus slot S1-1).
            for i, dtok in enumerate(drafts):
                draft_np[row, S1 - 1 - k + i] = dtok
            row_req_ids.append(rid)
            row_drafts.append(drafts)
            row_samples.append(end >= ib.num_tokens[idx] + len(drafts))
            row_chain.append(0 if rid in chain_groups else -1)
            row_starts.append(int(start))
            row_t0s.append(int(t))
            if async_mode:
                known = ib.num_tokens[idx]
                if end > known:
                    # Unknown tail tokens come from the in-flight step.
                    u0 = t + max(known - start, 0)
                    input_ids[u0:t + n_tok] = -1
                    prev_row = self._prev_rows.get(rid)
                    assert prev_row is not None, rid
                    ph_rows[u0:t + n_tok] = prev_row
                    has_placeholder = True
            t += n_tok
            row += 1
            # Extra candidate-chain rows (row expansion, CLAUDE.md design;
            # reference capability: tree_attn.py:32): each chain is a
            # virtual row over the same prefix whose draft positions map
            # to chain-private scratch blocks. The straddling block (the
            # one containing position `start`) is copied canonical ->
            # scratch in-step, BEFORE the KV scatter, so earlier real
            # tokens in it stay visible.
            for ci, (ctoks, priv) in enumerate(extra_chains):
                bs0 = self.block_size
                b0 = start // bs0
                nt_j = base_c + len(ctoks)
                input_ids[t:t + base_c] = ib.token_ids[idx,
                                                       start:start + base_c]
                input_ids[t + base_c:t + nt_j] = ctoks
                positions[t:t + nt_j] = np.arange(start, start + nt_j)
                if mrope_np is not None:
                    mrope_np[:, t:t + nt_j] = positions[t:t + nt_j]
                bt = blocks.copy()
                for j, pb in enumerate(priv):
                    bt[b0 + j] = pb
                pos_j = np.arange(start, start + nt_j)
                slot_mapping[t:t + nt_j] = (
                    bt[pos_j // bs0] * bs0 + pos_j % bs0)
                copy_src.append(int(blocks[b0]))
                copy_dst.append(int(priv[0]))
                qsl[row + 1] = t + nt_j
                seq_lens[row] = start + nt_j
                block_table[row] = bt
                kj = len(ctoks)
                last_j = t + nt_j - 1
                for j in range(S1):
                    back = min(S1 - 1 - j, kj)
                    logits_indices[row, j] = max(last_j - back, t)
                for i, dtok in enumerate(ctoks):
                    draft_np[row, S1 - 1 - kj + i] = dtok
                row_req_ids.append(rid)
                row_drafts.append(ctoks)
                row_samples.append(True)
                row_chain.append(ci + 1)
                row_starts.append(int(start))
                row_t0s.append(int(t))
                t += nt_j
                row += 1
        qsl[row + 1:] = t

        # Sampling tensors gathered in row order.
        rows = [ib.req_id_to_index[rid] for rid in row_req_ids]
        pad_rows = rows + [0] * (R - len(rows))
        temperature = ib.temperature[pad_rows].copy()
        top_k = ib.top_k[pad_rows].copy()
        top_p = ib.top_p[pad_rows].copy()
        min_p = ib.min_p[pad_rows].copy()
        seeds = ib.seeds[pad_rows].copy()
        # Per-request sampling position (output index being generated) —
        # derived from the scheduled position, not batch state, so seeded
        # sampling is reproducible across batches AND identical between
        # sync and async scheduling (where ib.num_tokens lags one step).
        steps = np.clip(seq_lens - ib.num_prompt_tokens[pad_rows],
                        0, None).astype(np.int32)

        # Penalties: only materialize history tensors when some active row
        # needs them (separate jit trace via penalty_args structure).
        penalty_args = None
        if ib.has_penalty[pad_rows].any():
            penalty_args = (
                jnp.asarray(ib.token_ids[pad_rows]),
                jnp.asarray(ib.num_prompt_tokens[pad_rows]),
                jnp.asarray(ib.num_tokens[pad_rows]),
                jnp.asarray(ib.repetition_penalty[pad_rows]),
                jnp.asarray(ib.presence_penalty[pad_rows]),
                jnp.asarray(ib.frequency_penalty[pad_rows]),
            )

        # Per-token LoRA adapter slots (0 = none).
        lora_args = {}
        if self.lora_manager is not None and ib.lora_slot[pad_rows].any():
            token_adapter = np.zeros(T, dtype=np.int32)
            tt = 0
            for rid, n_tok in scheduled:
                slot = ib.lora_slot[ib.req_id_to_index[rid]]
                token_adapter[tt:tt + n_tok] = slot
                tt += n_tok
            row_lora = np.zeros(R, dtype=np.int32)
            for r, rid in enumerate(row_req_ids):
                row_lora[r] = ib.lora_slot[ib.req_id_to_index[rid]]
            lora_args = {
                "lora": dict(self.lora_manager.stacks),
                "token_adapter": jnp.asarray(token_adapter),
                "row_slots_lora": jnp.asarray(row_lora),
            }

        # Grammar bitmask rows for structured-output requests.
        grammar_mask = None
        if grammar_masks:
            gm = np.ones((R, self.config.model_config.vocab_size),
                         dtype=bool)
            hit = False
            for r, rid in enumerate(row_req_ids):
                m = grammar_masks.get(rid)
                if m is not None:
                    gm[r] = m
                    hit = True
            if hit:
                grammar_mask = jnp.asarray(gm)

        # Multi-candidate chains: canonical->scratch straddling-block
        # copies, executed in-step before the KV scatter.
        kv_copy = None
        if copy_src:
            src_np = np.zeros(R, np.int32)
            dst_np = np.zeros(R, np.int32)
            src_np[:len(copy_src)] = copy_src
            dst_np[:len(copy_dst)] = copy_dst
            kv_copy = (jnp.asarray(src_np), jnp.asarray(dst_np))

        self.step_counter += 1
        dev_args = (
            jnp.asarray(input_ids),
            jnp.asarray(mrope_np if mrope_np is not None else positions),
            jnp.asarray(qsl), jnp.asarray(seq_lens), jnp.asarray(block_table),
            jnp.asarray(slot_mapping), jnp.asarray(logits_indices),
            jnp.asarray(temperature), jnp.asarray(top_k), jnp.asarray(top_p),
            jnp.asarray(min_p), jnp.asarray(seeds), jnp.asarray(steps))
        async_args = None
        if has_placeholder:
            async_args = (self._prev_sampled, jnp.asarray(ph_rows))
        # Per-row persistent state slots (hybrid linear-attention layers).
        row_slots = None
        if self.config.model_config.layer_types is not None:
            rs = np.full(R, self.max_num_reqs, dtype=np.int32)
            for r, rid in enumerate(row_req_ids):
                rs[r] = ib.req_id_to_index[rid]
            row_slots = jnp.asarray(rs)
        # Encoder-decoder: cross-KV pool + per-row pool slots.
        cross_args = None
        if self.is_enc_dec and self._cross_pool is not None:
            cs = np.full(R, self.max_num_reqs, dtype=np.int32)
            for r, rid in enumerate(row_req_ids):
                cs[r] = ib.req_id_to_index[rid]
            cross_args = (self._cross_pool, jnp.asarray(cs))

        # Multimodal splice arrays for this step's scheduled chunks.
        mm_args = {}
        if self._encode_images_fn is not None:
            hid = self.config.model_config.hidden_size
            # Deepstack (Qwen3-VL): encode_mm stacks per-level features on
            # the channel dim; split them into [levels, T, H] adds.
            n_deep = getattr(self.model, "num_deepstack", 0)
            mm_mask_np = np.zeros(T, dtype=bool)
            mm_embeds_np = np.zeros((T, hid), dtype=np.float32)
            mm_deep_np = (np.zeros((n_deep, T, hid), dtype=np.float32)
                          if n_deep else None)
            t0 = 0
            for rid, n_tok in scheduled:
                idx = ib.req_id_to_index[rid]
                if rid in self._mm_feats:
                    start = ib.num_computed_tokens[idx]
                    pos = np.arange(start, start + n_tok)
                    imgpos = self._mm_positions[rid]
                    hit = np.isin(pos, imgpos)
                    if hit.any():
                        rows = t0 + np.nonzero(hit)[0]
                        fidx = np.searchsorted(imgpos, pos[hit])
                        sel = self._mm_feats[rid][fidx]
                        mm_embeds_np[rows] = sel[:, :hid]
                        for lv in range(n_deep):
                            mm_deep_np[lv, rows] = \
                                sel[:, (1 + lv) * hid:(2 + lv) * hid]
                        mm_mask_np[rows] = True
                t0 += n_tok
            mm_args = dict(mm_embeds=jnp.asarray(mm_embeds_np),
                           mm_mask=jnp.asarray(mm_mask_np))
            if n_deep:
                mm_args["mm_deepstack"] = jnp.asarray(mm_deep_np)

        # Cascade attention auto-detection (reference heuristic,
        # gpu_model_runner.py:2356): many sharers + a common leading block
        # run that every row's chunk starts after.
        cascade_args = None
        n_act = row
        from lvllm_tpu import envs
        from lvllm_tpu.ops.cascade import use_cascade_heuristic
        mc = self.config.model_config
        if (n_act >= 8 and self.dcp == 1 and self.pp == 1
                and mc.sliding_window is None and not chain_groups
                and not envs.LVLLM_DISABLE_CASCADE):
            bt = block_table[:n_act]
            limit = min(int(np.min(seq_lens[:n_act])) // self.block_size,
                        min(row_starts) // self.block_size)
            shared = 0
            while shared < limit and np.all(bt[:, shared] == bt[0, shared]):
                shared += 1
            if use_cascade_heuristic(n_act, shared * self.block_size,
                                     self.block_size):
                npb = 1
                while npb < shared:
                    npb *= 2
                prefix_blocks = np.zeros(npb, np.int32)
                prefix_blocks[:shared] = bt[0, :shared]
                suffix_table = np.zeros_like(block_table)
                suffix_table[:, :self.max_blocks_per_req - shared] = \
                    block_table[:, shared:]
                suffix_lens = np.clip(
                    seq_lens - shared * self.block_size, 0,
                    None).astype(np.int32)
                cascade_args = (
                    jnp.asarray(prefix_blocks),
                    jnp.asarray(shared * self.block_size, jnp.int32),
                    jnp.asarray(suffix_table),
                    jnp.asarray(suffix_lens))

        # Static chunk-parallel GDN path: exactly one scheduled request
        # with a long query segment (typical long-prefill chunk). Only
        # worth a distinct compile for hybrid linear-attention models.
        single_seq = bool(
            self.config.model_config.layer_types is not None
            and len(so.num_scheduled_tokens) == 1
            and next(iter(so.num_scheduled_tokens.values())) >= 64)

        # Static decode path: every scheduled request contributes one
        # token — recurrent-state layers take the batched parallel update
        # instead of the T-step scan (ops/gdn.py *_decode).
        decode_step = bool(
            self.config.model_config.layer_types is not None
            and not so.scheduled_spec_decode_tokens
            and all(n == 1 for n in so.num_scheduled_tokens.values()))

        # Static PCP path: one long-prefill chunk → queries sharded over
        # the mesh "context" axis (eligibility asserted at init).
        pcp_step = bool(
            self.pcp > 1
            and len(so.num_scheduled_tokens) == 1
            and next(iter(so.num_scheduled_tokens.values())) > 1
            and not so.scheduled_spec_decode_tokens
            and T % self.pcp == 0)

        # Static greedy fast path: active rows all temperature-0.
        active = [ib.req_id_to_index[rid] for rid in row_req_ids]
        greedy_only = bool(np.all(ib.temperature[active] == 0.0)) \
            if active else True
        # Stochastic rejection sampling: only ship the draft matrix (and
        # take the extra trace) when a non-greedy row has drafts staged.
        draft_mat = None
        draft_q = None
        if any(row_drafts[r] and ib.temperature[active[r]] > 0.0
               for r in range(len(row_req_ids))):
            draft_mat = jnp.asarray(draft_np)
            # Sampled drafts carry their proposal distribution q; rows
            # without one verify against the one-hot (deterministic) q,
            # synthesized ON DEVICE from draft_mat — only rows with a
            # stored distribution ship host→device (a dense [R, S1, V]
            # f32 would be ~50 MB/step at real vocab sizes; over the
            # ~5 MB/s dev tunnel that would erase the speculative win).
            q_rows = [r for r, rid in enumerate(row_req_ids)
                      if rid in self.draft_q_store and row_drafts[r]]
            if q_rows:
                Vv = self.config.model_config.vocab_size
                NQ = 1
                while NQ < len(q_rows):
                    NQ *= 2
                q_np = np.zeros((NQ, S1, Vv), np.float32)
                # Pad entries scatter at row R (out of bounds → dropped).
                rows_np = np.full(NQ, R, np.int32)
                for j, r in enumerate(q_rows):
                    rows_np[j] = r
                    pos_idx = np.clip(draft_np[r], 0, Vv - 1)
                    q_np[j, np.arange(S1), pos_idx] = 1.0
                    qr = self.draft_q_store[row_req_ids[r]]
                    if isinstance(qr, list):
                        # Multi-candidate: one q stack per chain.
                        ci = row_chain[r] if row_chain[r] >= 0 else 0
                        qr = qr[ci] if ci < len(qr) else None
                    if qr is None:
                        continue
                    kd = len(row_drafts[r])
                    for i in range(min(kd, qr.shape[0])):
                        q_np[j, S1 - 1 - kd + i] = qr[i]
                draft_q = (jnp.asarray(q_np), jnp.asarray(rows_np))
        want_topk = bool(np.any(ib.num_logprobs[active] > 0)) \
            if active else False
        topk = None
        hidden = None
        want_hidden = self.eagle_proposer is not None
        eagle_aux = ()
        if want_hidden and getattr(self.eagle_proposer, "mode",
                                   "eagle") == "eagle3":
            eagle_aux = tuple(self.eagle_proposer.aux_layers)
        if want_hidden:
            assert not async_mode, "async scheduling excludes EAGLE"
        if self.expert_store is not None:
            assert not async_mode, "async scheduling + offload staging TBD"
            sampled, logprobs = self._execute_staged(
                *dev_args, penalty_args=penalty_args,
                grammar_mask=grammar_mask, draft_mat=draft_mat,
                draft_q=draft_q, row_slots=row_slots,
                decode_mode=decode_step)
            packed = jnp.stack([
                jnp.asarray(sampled),
                jax.lax.bitcast_convert_type(
                    jnp.asarray(logprobs).astype(jnp.float32), jnp.int32)])
        elif self.pp > 1:
            assert not (mm_args or lora_args or want_hidden
                        or draft_mat is not None or row_slots is not None
                        or cascade_args is not None), \
                "PP excludes MM / LoRA / EAGLE / spec / hybrid / cascade"
            packed, topk = self._execute_pipelined(
                *dev_args, penalty_args=penalty_args,
                grammar_mask=grammar_mask, async_args=async_args,
                greedy_only=greedy_only, want_topk=want_topk)
        else:
            prefix_arg = None
            if getattr(self.model, "prefix_lm", False):
                # Prefix-LM (PaliGemma): bidirectional span = the prompt
                # (image placeholders + text) of each scheduled row.
                pl = np.zeros(len(seq_lens), np.int32)
                for r, rid in enumerate(row_req_ids):
                    pl[r] = ib.num_prompt_tokens[ib.req_id_to_index[rid]]
                prefix_arg = jnp.asarray(pl)
            kv, packed, topk, hidden = self._step_fn(
                self.params, self.kv_caches, *dev_args,
                penalty_args=penalty_args, grammar_mask=grammar_mask,
                async_args=async_args, greedy_only=greedy_only,
                row_slots=row_slots, want_topk_logprobs=want_topk,
                single_seq_prefill=single_seq, pcp_prefill=pcp_step,
                decode_mode=decode_step,
                dcp_slot_mapping=(jnp.asarray(dcp_slot)
                                  if dcp_slot is not None else None),
                want_hidden=want_hidden, cascade_args=cascade_args,
                aux_layers=eagle_aux, draft_mat=draft_mat,
                draft_q=draft_q, cross_args=cross_args,
                prefix_lens=prefix_arg, kv_copy=kv_copy,
                **mm_args, **lora_args)
            self.kv_caches = kv

        # EAGLE drafting: grammar rows are excluded (grammar state can't
        # advance ahead of acceptance), and penalty rows at temperature > 0
        # (verify positions share one history snapshot) — mirrors
        # EngineCore._propose_drafts. Greedy rows verify by exact-match;
        # non-greedy by stochastic rejection sampling.
        row_propose = [
            bool(not (grammar_masks and rid in grammar_masks)
                 and (ib.temperature[ib.req_id_to_index[rid]] == 0.0
                      or not ib.has_penalty[ib.req_id_to_index[rid]]))
            for rid in row_req_ids] if want_hidden else []

        handle = StepHandle(
            sampled=packed, logprobs=None, row_req_ids=row_req_ids,
            row_drafts=row_drafts, row_samples=row_samples, S1=S1,
            async_mode=async_mode, seq_lens=seq_lens.copy(),
            topk_logprobs=topk[0] if topk else None,
            topk_ids=topk[1] if topk else None,
            hidden=hidden, row_starts=row_starts, row_t0s=row_t0s,
            row_propose=row_propose, row_chain=row_chain,
            chain_groups=chain_groups)
        self._prev_rows = {rid: r for r, rid in enumerate(row_req_ids)}
        self._prev_sampled = packed
        if async_mode:
            return handle
        return self.finalize(handle)

    def finalize(self, handle) -> ModelRunnerOutput:
        """Sync an in-flight (or just-dispatched) step's results to host
        and update the persistent batch (reference:
        AsyncGPUModelRunnerOutput)."""
        ib = self.input_batch
        S1 = handle.S1
        packed_np = np.asarray(handle.sampled)       # [2, R, S1] one fetch
        sampled_np = packed_np[0]
        logprobs_np = packed_np[1].view(np.float32)
        topk_lp_np = topk_id_np = None
        if handle.topk_logprobs is not None:
            topk_lp_np = np.asarray(handle.topk_logprobs)
            topk_id_np = np.asarray(handle.topk_ids)

        out = ModelRunnerOutput(sampled_token_ids={}, logprobs={})
        for r, rid in enumerate(handle.row_req_ids):
            idx = ib.req_id_to_index.get(rid)
            if idx is None:
                continue  # finished/preempted while in flight
            if handle.row_chain and handle.row_chain[r] > 0:
                continue  # extra chain rows fold into the group below
            if rid in handle.chain_groups:
                self._finalize_chain_group(handle, out, rid, idx,
                                           sampled_np, logprobs_np)
                continue
            drafts = handle.row_drafts[r]
            k = len(drafts)
            if handle.row_samples[r]:
                seq = sampled_np[r, S1 - 1 - k:]          # [k+1]
                accepted = 0
                for i in range(k):
                    if int(seq[i]) == drafts[i]:
                        accepted += 1
                    else:
                        break
                emitted = [int(x) for x in seq[:accepted + 1]]
                out.sampled_token_ids[rid] = emitted
                if ib.wants_logprobs[idx]:
                    lp = logprobs_np[r, S1 - 1 - k:]
                    out.logprobs[rid] = [float(x)
                                         for x in lp[:accepted + 1]]
                    if topk_lp_np is not None:
                        tv = topk_lp_np[r, S1 - 1]
                        ti = topk_id_np[r, S1 - 1]
                        nlp = int(ib.num_logprobs[idx])
                        out.topk_logprobs.setdefault(rid, []).append(
                            {int(t): float(v)
                             for v, t in zip(tv[:nlp], ti[:nlp])})
                # Overwrite the staged draft region with verified tokens.
                nt = ib.num_tokens[idx]
                ib.token_ids[idx, nt:nt + len(emitted)] = emitted
                ib.num_tokens[idx] = nt + len(emitted)
                if not handle.async_mode:
                    ib.num_computed_tokens[idx] = \
                        handle.seq_lens[r] - (k - accepted)
            elif not handle.async_mode:
                ib.num_computed_tokens[idx] = handle.seq_lens[r]
            if handle.hidden is not None:
                self._eagle_step(handle, out, r, rid, idx)
        return out

    def _finalize_chain_group(self, handle, out, rid, idx, sampled_np,
                              logprobs_np) -> None:
        """Multi-candidate verification: each chain row verified
        independently (right-aligned columns, same per-row law as single
        chain — exact match greedy / rejection-sampled otherwise); the
        row with the longest accepted run wins, ties to the lowest chain
        index. A non-first winner's accepted tokens have KV only in
        scratch blocks, so the canonical watermark stays at base and the
        next step recomputes them as a catch-up chunk (reference
        capability: tree_attn.py:32 + speculative_token_tree)."""
        ib = self.input_batch
        S1 = handle.S1
        rows = handle.chain_groups[rid]
        r0 = rows[0]
        start = handle.row_starts[r0]
        base = int(handle.seq_lens[r0]) - start - len(handle.row_drafts[r0])
        best_r, best_acc = r0, -1
        for r in rows:
            drafts = handle.row_drafts[r]
            seq = sampled_np[r, S1 - 1 - len(drafts):]
            acc = 0
            for i in range(len(drafts)):
                if int(seq[i]) == drafts[i]:
                    acc += 1
                else:
                    break
            if acc > best_acc:
                best_r, best_acc = r, acc
        r = best_r
        drafts = handle.row_drafts[r]
        k = len(drafts)
        seq = sampled_np[r, S1 - 1 - k:]
        emitted = [int(x) for x in seq[:best_acc + 1]]
        out.sampled_token_ids[rid] = emitted
        if ib.wants_logprobs[idx]:
            lp = logprobs_np[r, S1 - 1 - k:]
            out.logprobs[rid] = [float(x) for x in lp[:best_acc + 1]]
        nt = ib.num_tokens[idx]
        ib.token_ids[idx, nt:nt + len(emitted)] = emitted
        ib.num_tokens[idx] = nt + len(emitted)
        winner_chain = handle.row_chain[r]
        if winner_chain == 0:
            computed = int(handle.seq_lens[r]) - (k - best_acc)
        else:
            computed = start + base
        ib.num_computed_tokens[idx] = computed
        out.spec_kv_computed[rid] = computed
        out.spec_winner_chain[rid] = winner_chain
        if handle.hidden is not None:
            self._eagle_step(handle, out, r, rid, idx,
                             accepted_end=start + base + best_acc)

    def _eagle_step(self, handle, out, r: int, rid: str, idx: int,
                    accepted_end: Optional[int] = None) -> None:
        """Feed this step's accepted positions to the EAGLE head and stash
        next-step drafts in the runner output (scheduler consumes
        ModelRunnerOutput.spec_token_ids)."""
        ib = self.input_batch
        mc = self.config.model_config
        if accepted_end is None:
            accepted_end = int(ib.num_computed_tokens[idx])
        emitted = out.sampled_token_ids.get(rid)
        want = bool(handle.row_propose[r] and emitted)
        room = mc.max_model_len - int(ib.num_tokens[idx]) - 1
        if room <= 0:
            want = False
        lm_w = None
        if not mc.tie_word_embeddings:
            lm = self.params["lm_head"]
            lm_w = lm.get("kernel")
            if lm_w is None:
                # Dense w8a8 replaced the bf16 kernel; the draft head
                # wants a plain matmul operand — dequantize once, cache.
                if not hasattr(self, "_lm_w_deq"):
                    import jax.numpy as jnp
                    self._lm_w_deq = (
                        lm["kernel_q"].astype(jnp.bfloat16)
                        * lm["scale"].astype(jnp.bfloat16))
                lm_w = self._lm_w_deq
        # Sampled drafting (the reference default for MTP/EAGLE): at
        # temperature > 0 the head samples its own filtered distribution
        # and records q — verified by the general-q rejection sampler
        # instead of exact match.
        sampling = None
        if float(ib.temperature[idx]) > 0.0:
            sampling = (float(ib.temperature[idx]), int(ib.top_k[idx]),
                        float(ib.top_p[idx]), float(ib.min_p[idx]),
                        int(ib.seeds[idx]))
        drafts = self.eagle_proposer.ingest_and_propose(
            rid, handle.hidden, handle.row_t0s[r], handle.row_starts[r],
            accepted_end, ib.token_ids[idx], want, max(room, 0),
            self.params["embed"]["weight"], lm_w, sampling=sampling)
        q = getattr(self.eagle_proposer, "last_q", {}).get(rid)
        if q is not None and drafts:
            self.draft_q_store[rid] = q
        if drafts and isinstance(drafts[0], list):
            # Multi-candidate proposal: list of chains (chain 0 doubles
            # as the single-chain draft for back-compat paths).
            chains = [c[:self.num_spec] for c in drafts if c]
            if chains:
                if out.spec_token_ids is None:
                    out.spec_token_ids = {}
                out.spec_token_ids[rid] = chains[0]
                if len(chains) > 1:
                    if out.spec_next_chains is None:
                        out.spec_next_chains = {}
                    out.spec_next_chains[rid] = chains
        elif drafts:
            if out.spec_token_ids is None:
                out.spec_token_ids = {}
            out.spec_token_ids[rid] = drafts[:self.num_spec]
