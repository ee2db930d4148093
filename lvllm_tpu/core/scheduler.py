"""Continuous-batching scheduler.

Counterpart of the reference's ``vllm/v1/core/sched/scheduler.py`` (Scheduler,
``schedule():350``, ``update_from_output():1301``). Same core model:

- No prefill/decode phases: a single token budget per step; each scheduled
  request contributes ``min(remaining_tokens, budget)`` tokens — chunked
  prefill and decode fall out naturally (scheduler.py:351-360).
- RUNNING requests are scheduled first, then WAITING requests are admitted
  while budget and KV blocks remain.
- On KV exhaustion, the lowest-priority running request is preempted
  (blocks freed, status PREEMPTED, back to head of waiting queue).
- Prefix caching: new requests reuse cached block chains.
"""

from collections import deque
from typing import Deque, Dict, List, Optional

from lvllm_tpu.config import CacheConfig, SchedulerConfig
from lvllm_tpu.core.kv_cache_manager import KVCacheManager
from lvllm_tpu.core.request import (PLACEHOLDER_TOKEN, Request,
                                    RequestStatus, check_stop)
from lvllm_tpu.core.sched_output import (CachedRequestData, ModelRunnerOutput,
                                         NewRequestData, SchedulerOutput)
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class Scheduler:

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        num_kv_blocks: int,
        dcp_world_size: int = 1,
        kv_offload_manager=None,
        sliding_window: Optional[int] = None,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.max_num_seqs = scheduler_config.max_num_seqs
        self.max_num_batched_tokens = scheduler_config.max_num_batched_tokens
        # Under DCP one pool block holds block_size tokens on EACH of the
        # dcp_world_size context shards (reference: scheduler dcp awareness,
        # sched/scheduler.py:155).
        self.block_size = cache_config.block_size * dcp_world_size

        self.kv_cache_manager = KVCacheManager(
            block_size=self.block_size,
            num_blocks=num_kv_blocks,
            max_model_len=scheduler_config.max_model_len,
            enable_caching=cache_config.enable_prefix_caching,
            sliding_window=sliding_window,
        )

        # Host-RAM KV offload (reference: CPUOffloadingManager wired via
        # OffloadingConnector): finished requests' blocks get stored; new
        # requests extend their prefix hit from the host tier.
        self.kv_offload = kv_offload_manager
        # (hashes, block_ids) the engine must copy out after this step,
        # before the pool can reuse those blocks (drained by EngineCore).
        self.pending_kv_stores: List[tuple] = []

        self.async_scheduling = scheduler_config.async_scheduling
        # Pause control (reference: PauseState, scheduler :1848):
        # None | "drain" (finish running, admit nothing) | "freeze".
        self.pause_mode: Optional[str] = None
        self.requests: Dict[str, Request] = {}
        self.waiting: Deque[Request] = deque()
        self.running: List[Request] = []
        self.finished_req_ids: List[str] = []

        # Cumulative counters (reference: SchedulerStats).
        self.num_scheduled_steps = 0
        self.num_preemptions = 0
        # Spec-decode acceptance counters (reference: v1/metrics
        # SpecDecodingStats — vllm:spec_decode_num_{draft,accepted}_tokens).
        self.num_spec_draft_tokens = 0
        self.num_spec_accepted_tokens = 0
        # Multi-candidate speculation: [single-or-chain0 wins, other-chain
        # wins] + in-flight scratch blocks for extra chains' draft KV.
        self.num_spec_chain_wins = [0, 0]
        self._chain_scratch: List = []

    # ---- request intake ---------------------------------------------------

    def add_request(self, request: Request) -> None:
        if request.request_id in self.requests:
            raise ValueError(f"duplicate request id {request.request_id}")
        self.requests[request.request_id] = request
        if self.scheduler_config.policy == "priority":
            # Stable insert by (priority, arrival) — simple variant of the
            # reference's priority heap (sched/request_queue.py:131).
            idx = len(self.waiting)
            for i, r in enumerate(self.waiting):
                if (request.priority, request.arrival_time) < \
                        (r.priority, r.arrival_time):
                    idx = i
                    break
            self.waiting.insert(idx, request)
        else:
            self.waiting.append(request)

    def abort_requests(self, request_ids) -> None:
        for rid in request_ids:
            req = self.requests.get(rid)
            if req is None or req.is_finished:
                continue
            req.status = RequestStatus.FINISHED_ABORTED
            if req in self.running:
                self.running.remove(req)
            else:
                try:
                    self.waiting.remove(req)
                except ValueError:
                    pass
            self._free_request(req)

    def has_unfinished_requests(self) -> bool:
        return bool(self.waiting or self.running)

    def get_num_unfinished_requests(self) -> int:
        return len(self.waiting) + len(self.running)

    # ---- scheduling -------------------------------------------------------

    def pause(self, mode: str = "drain") -> None:
        assert mode in ("drain", "freeze")
        self.pause_mode = mode

    def resume(self) -> None:
        self.pause_mode = None

    def schedule(self) -> SchedulerOutput:
        output = SchedulerOutput()
        budget = self.max_num_batched_tokens
        if self.pause_mode == "freeze":
            output.finished_req_ids = self.finished_req_ids
            self.finished_req_ids = []
            output.async_mode = self.async_scheduling
            return output

        # Drain finished ids collected since last step for the runner.
        output.finished_req_ids = self.finished_req_ids
        self.finished_req_ids = []

        # Multi-step decode horizon (config.multi_step_decode): viable only
        # when the whole step is steady 1-token decode with nothing waiting
        # to prefill; KV blocks get horizon-1 lookahead. The runner may
        # still fall back to one step (grammar/penalty/LoRA rows) —
        # accounting in update_from_output uses len(sampled) either way.
        H = self.scheduler_config.multi_step_decode
        horizon = 1
        if (H > 1 and not self.waiting and self.pause_mode is None
                and not self.async_scheduling and self.running
                and all(r.num_tokens_with_spec - r.num_computed_tokens == 1
                        and not r.spec_token_ids
                        and r.num_computed_tokens >= r.num_prompt_tokens - 1
                        for r in self.running)):
            room = min(self.scheduler_config.max_model_len - r.num_tokens
                       for r in self.running)
            horizon = max(1, min(H, room))
        output.decode_horizon = horizon

        # Phase 1: running requests (decode / continued chunked prefill).
        preempted: List[Request] = []
        idx = 0
        while idx < len(self.running) and budget > 0:
            req = self.running[idx]
            num_new_tokens = req.num_tokens_with_spec - req.num_computed_tokens
            num_new_tokens = min(num_new_tokens, budget)
            if (self.scheduler_config.long_prefill_token_threshold > 0
                    and req.num_computed_tokens < req.num_prompt_tokens):
                num_new_tokens = min(
                    num_new_tokens,
                    self.scheduler_config.long_prefill_token_threshold)
            if num_new_tokens <= 0:
                idx += 1
                continue

            # Multi-candidate speculation: extra chains each add a virtual
            # row re-processing the base (known) tokens + their own drafts.
            # Canonical slots cover base + the longest chain (whichever
            # chain wins, its emitted tokens append to the sequence); the
            # extra chains' draft KV goes to per-chain scratch blocks.
            chains = req.spec_chains
            extra_chain_tokens = 0
            alloc_tokens = num_new_tokens
            if chains and len(chains) > 1 and \
                    num_new_tokens == req.num_tokens_with_spec - \
                    req.num_computed_tokens:
                base = req.num_tokens - req.num_computed_tokens
                extra_chain_tokens = sum(base + len(c) for c in chains[1:])
                if extra_chain_tokens > budget - num_new_tokens:
                    chains = None  # no budget: single-chain fallback
                    extra_chain_tokens = 0
                else:
                    alloc_tokens = base + max(len(c) for c in chains)
            else:
                chains = None

            while True:
                new_blocks = self.kv_cache_manager.allocate_slots(
                    req, alloc_tokens,
                    num_lookahead_tokens=horizon - 1)
                if new_blocks is not None:
                    break
                # Preempt the lowest-priority (last) running request.
                victim = self._choose_victim()
                if victim is None or victim is req:
                    # Cannot make room; preempt self.
                    self._preempt(req, preempted)
                    new_blocks = None
                    break
                self._preempt(victim, preempted)
            if new_blocks is None:
                # req itself was preempted; it left self.running at idx.
                continue

            num_spec = len(req.spec_token_ids)
            output.scheduled_cached_reqs.append(CachedRequestData(
                req_id=req.request_id,
                new_block_ids=new_blocks.get_block_ids(),
                num_computed_tokens=req.num_computed_tokens,
            ))
            if num_spec:
                output.scheduled_spec_decode_tokens[req.request_id] = \
                    list(req.spec_token_ids)
            if chains and len(chains) > 1:
                scratch = self._alloc_chain_scratch(req, chains)
                if scratch is not None:
                    output.spec_chains[req.request_id] = \
                        [list(c) for c in chains]
                    output.spec_scratch_blocks[req.request_id] = scratch
                    num_new_tokens += extra_chain_tokens
            output.num_scheduled_tokens[req.request_id] = num_new_tokens
            if self.async_scheduling:
                self._advance_optimistically(req, num_new_tokens, output)
            budget -= num_new_tokens
            idx += 1

        # Phase 2: admit waiting requests (new or resumed-from-preemption).
        encoder_budget = self.scheduler_config.max_encoder_tokens_per_step
        encoder_used = 0
        while self.waiting and budget > 0 and self.pause_mode is None and \
                len(self.running) < self.max_num_seqs:
            req = self.waiting[0]
            resumed = req.status == RequestStatus.PREEMPTED

            # Encoder budget (reference: scheduler.py:1114): admitting a
            # multimodal request costs its placeholder tokens of encoder
            # work; defer when this step's budget is spent (a request
            # bigger than the whole budget runs alone).
            enc = 0 if resumed else getattr(req, "num_encoder_tokens", 0)
            if (enc and encoder_budget > 0 and encoder_used > 0
                    and encoder_used + enc > encoder_budget):
                break

            if resumed or getattr(req, "mm_data", None):
                # Multimodal prompts skip prefix-cache reuse: placeholder
                # token ids don't hash the image content (reference hashes
                # mm items into block hashes; we opt out instead).
                new_computed_blocks, num_cached_tokens = None, 0
            else:
                new_computed_blocks, num_cached_tokens = \
                    self.kv_cache_manager.get_computed_blocks(req)

            # Extend the device prefix hit from the host offload tier.
            off_hits = 0
            if (self.kv_offload is not None and not resumed
                    and not getattr(req, "mm_data", None)):
                hashes = self.kv_cache_manager.get_block_hashes(req)
                n_dev = len(new_computed_blocks.blocks) \
                    if new_computed_blocks else 0
                # Leave >= 1 prompt token to compute (same rule as the
                # device prefix cache).
                max_hit = (req.num_prompt_tokens - 1) // self.block_size
                off_hits = self.kv_offload.lookup(hashes[n_dev:max_hit])
                num_cached_tokens += off_hits * self.block_size

            num_new_tokens = req.num_tokens - num_cached_tokens - \
                req.num_computed_tokens
            if self.scheduler_config.long_prefill_token_threshold > 0:
                num_new_tokens = min(
                    num_new_tokens,
                    self.scheduler_config.long_prefill_token_threshold)
            num_new_tokens = min(num_new_tokens, budget)
            if num_new_tokens <= 0:
                break
            if (self.scheduler_config.atomic_prefill
                    and req.num_computed_tokens + num_cached_tokens
                    + num_new_tokens < req.num_prompt_tokens):
                # Prefix-LM: splitting the prompt across chunks would
                # truncate the bidirectional prefix span (earlier-chunk
                # prefix tokens never see later prefix keys). Hold until
                # a step whose budget reaches the end of the prompt; the
                # engine rejects prompts longer than the full budget at
                # add time, so this always terminates. (Generated tokens
                # recomputed after preemption are plain causal and may
                # still chunk.)
                break

            if not resumed and num_cached_tokens:
                req.num_computed_tokens = num_cached_tokens
                req.num_cached_tokens = num_cached_tokens

            new_blocks = self.kv_cache_manager.allocate_slots(
                req, num_new_tokens, new_computed_blocks=new_computed_blocks)
            if new_blocks is None:
                # If nothing is running and nothing else got scheduled, this
                # request can never fit in the pool — finish it as IGNORED
                # instead of deadlocking on an empty schedule.
                if not self.running and not output.num_scheduled_tokens:
                    logger.warning(
                        "Request %s needs more KV blocks than the pool has; "
                        "ignoring it.", req.request_id)
                    self.waiting.popleft()
                    req.status = RequestStatus.FINISHED_IGNORED
                    self._free_request(req)
                    continue
                break  # no KV room now; don't preempt for waiting reqs

            self.waiting.popleft()
            req.status = RequestStatus.RUNNING
            self.running.append(req)
            encoder_used += enc

            if off_hits:
                # The first off_hits fresh blocks back the host-tier hit;
                # the engine copies them in before executing the step.
                load_ids = new_blocks.get_block_ids()[:off_hits]
                slots = self.kv_offload.get_slots(hashes[n_dev:n_dev +
                                                         off_hits])
                output.kv_loads[req.request_id] = (slots, load_ids)

            if resumed:
                output.scheduled_cached_reqs.append(CachedRequestData(
                    req_id=req.request_id,
                    new_block_ids=[],  # superseded by all_block_ids
                    num_computed_tokens=req.num_computed_tokens,
                    resumed_from_preemption=True,
                    all_token_ids=req.all_token_ids,
                    all_block_ids=self.kv_cache_manager.get_block_ids(
                        req.request_id),
                ))
            else:
                output.scheduled_new_reqs.append(NewRequestData(
                    req_id=req.request_id,
                    prompt_token_ids=req.prompt_token_ids,
                    block_ids=self.kv_cache_manager.get_block_ids(
                        req.request_id),
                    num_computed_tokens=req.num_computed_tokens,
                    sampling_params=req.sampling_params,
                    lora_int_id=getattr(req, 'lora_slot', 0),
                    mm_data=getattr(req, 'mm_data', None),
                ))
            output.num_scheduled_tokens[req.request_id] = num_new_tokens
            if self.async_scheduling:
                self._advance_optimistically(req, num_new_tokens, output)
            budget -= num_new_tokens

        output.preempted_req_ids = [r.request_id for r in preempted]
        output.total_num_scheduled_tokens = sum(
            output.num_scheduled_tokens.values())
        output.async_mode = self.async_scheduling
        self.num_scheduled_steps += 1
        return output

    def _advance_optimistically(self, req: Request, num_new: int,
                                output) -> None:
        """Async scheduling: advance bookkeeping before results arrive.
        Sampling rows gain a PLACEHOLDER output token, replaced at
        finalize (reference: AsyncScheduler, sched/async_scheduler.py)."""
        will_sample = req.num_computed_tokens + num_new >= req.num_tokens
        req.num_computed_tokens += num_new
        if will_sample:
            req.append_output_token_ids([PLACEHOLDER_TOKEN])
            req.num_placeholders += 1
            output.async_sampled_req_ids.add(req.request_id)

    def _choose_victim(self) -> Optional[Request]:
        if not self.running:
            return None
        if self.scheduler_config.policy == "priority":
            return max(self.running,
                       key=lambda r: (r.priority, r.arrival_time))
        return self.running[-1]

    def _preempt(self, req: Request, preempted: List[Request]) -> None:
        self.kv_cache_manager.free(req)
        req.status = RequestStatus.PREEMPTED
        req.num_computed_tokens = 0
        req.num_preemptions += 1
        req.spec_token_ids = []
        req.spec_chains = None
        if req.num_placeholders:
            del req.output_token_ids[-req.num_placeholders:]
            req.num_placeholders = 0
        self.num_preemptions += 1
        if req in self.running:
            self.running.remove(req)
        self.waiting.appendleft(req)
        preempted.append(req)

    def recompute_after_kv_load_failure(self, request_id: str,
                                        output) -> None:
        """KV-load-failure policy (reference: the offloading connector's
        load-failure recovery — affected requests are rescheduled to
        RECOMPUTE instead of decoding over garbage pages): drop the
        request from this step's scheduler output, free its blocks, and
        put it back at the head of the waiting queue with zero computed
        tokens (prefix cache may still serve the device-resident part)."""
        req = self.requests.get(request_id)
        if req is None:
            return
        was_new = any(r.req_id == request_id
                      for r in output.scheduled_new_reqs)
        # The request's device blocks were never computed (the step is
        # being unwound) — purge them from the prefix cache before freeing
        # or later requests would hit garbage pages.
        pool = self.kv_cache_manager.block_pool
        for blk in self.kv_cache_manager.get_blocks(request_id):
            pool._maybe_evict_cached_block(blk)
        preempted: List[Request] = []
        self._preempt(req, preempted)
        if was_new:
            # Never reached the runner: next schedule re-admits it as a
            # fresh request (a "resume" would reference state the runner
            # never cached).
            req.status = RequestStatus.WAITING
            req.num_preemptions -= 1
            self.num_preemptions -= 1
        n = output.num_scheduled_tokens.pop(request_id, 0)
        output.total_num_scheduled_tokens -= n
        output.scheduled_new_reqs = [
            r for r in output.scheduled_new_reqs if r.req_id != request_id]
        output.scheduled_cached_reqs = [
            r for r in output.scheduled_cached_reqs
            if r.req_id != request_id]
        output.kv_loads.pop(request_id, None)
        # Runner-side cleanup: drop the row if it was already registered.
        if request_id not in output.preempted_req_ids:
            output.preempted_req_ids.append(request_id)

    # ---- post-execution update -------------------------------------------

    def _alloc_chain_scratch(self, req: Request,
                             chains: List[List[int]]):
        """Per-chain KV-slot accounting for multi-candidate verification:
        chains past the first write their draft KV into private scratch
        blocks covering the draft positions (the first scratch block is a
        copy of the straddling canonical block, made in-step by the
        runner). Returns per-extra-chain block-id lists, or None if the
        pool can't supply them (caller falls back to chain 0 only)."""
        bs = self.block_size
        pool = self.kv_cache_manager.block_pool
        computed = req.num_computed_tokens
        base = req.num_tokens - computed
        needs = []
        for c in chains[1:]:
            last = computed + base + len(c) - 1
            needs.append(last // bs - computed // bs + 1)
        if sum(needs) > pool.get_num_free_blocks():
            return None
        out = []
        for n in needs:
            blocks = pool.get_new_blocks(n)
            self._chain_scratch.extend(blocks)
            out.append([b.block_id for b in blocks])
        return out

    def _free_chain_scratch(self) -> None:
        if self._chain_scratch:
            self.kv_cache_manager.block_pool.free_blocks(
                self._chain_scratch)
            self._chain_scratch = []

    def update_from_output(
        self,
        scheduler_output: SchedulerOutput,
        runner_output: ModelRunnerOutput,
    ) -> List[Request]:
        """Advance request state with sampled tokens; returns requests that
        produced new tokens this step (for the output processor).
        Reference: sched/scheduler.py:1301."""
        finished: List[Request] = []
        stepped: List[Request] = []
        self._free_chain_scratch()

        if scheduler_output.async_mode:
            return self._update_from_output_async(scheduler_output,
                                                  runner_output)

        for req in list(self.running):
            rid = req.request_id
            num_scheduled = scheduler_output.num_scheduled_tokens.get(rid)
            if num_scheduled is None:
                continue
            spec_scheduled = scheduler_output.scheduled_spec_decode_tokens.get(
                rid, [])
            sampled = runner_output.sampled_token_ids.get(rid, [])

            # Spec-decode accounting: of the scheduled tokens, the draft
            # tokens past the first may be rejected — computed tokens advance
            # only by accepted count.
            num_draft = len(spec_scheduled)
            if rid in scheduler_output.spec_chains and \
                    rid in runner_output.spec_kv_computed:
                # Multi-candidate verification: the runner reports the
                # canonical-KV watermark directly (a non-first winning
                # chain's accepted tokens live in scratch blocks; their
                # KV recomputes as a catch-up chunk next step). Drafts
                # count the LONGEST chain so acceptance_rate stays <= 1.
                num_draft = max(
                    len(c) for c in scheduler_output.spec_chains[rid])
                num_accepted = max(len(sampled) - 1, 0)
                self.num_spec_draft_tokens += num_draft
                self.num_spec_accepted_tokens += num_accepted
                self.num_spec_chain_wins[
                    runner_output.spec_winner_chain.get(rid, 0) > 0] += 1
                req.num_computed_tokens = \
                    runner_output.spec_kv_computed[rid]
            elif num_draft:
                num_accepted = max(len(sampled) - 1, 0)
                num_rejected = num_draft - num_accepted
                self.num_spec_draft_tokens += num_draft
                self.num_spec_accepted_tokens += num_accepted
                req.num_computed_tokens += num_scheduled - num_rejected
            elif scheduler_output.decode_horizon > 1 and sampled:
                # Multi-step decode: the runner wrote KV for every sampled
                # token (len==horizon, or 1 if it fell back).
                req.num_computed_tokens += len(sampled)
            else:
                req.num_computed_tokens += num_scheduled
            req.spec_token_ids = []
            req.spec_chains = None

            if req.num_computed_tokens < req.num_prompt_tokens:
                continue  # mid chunked-prefill: no token sampled yet

            if sampled:
                req.append_output_token_ids(sampled)
                stepped.append(req)
                if check_stop(req, num_new_tokens=len(sampled)):
                    finished.append(req)
                    continue
            # Stash next-step drafts.
            if runner_output.spec_token_ids:
                req.spec_token_ids = runner_output.spec_token_ids.get(rid, [])
                if runner_output.spec_next_chains:
                    req.spec_chains = \
                        runner_output.spec_next_chains.get(rid)

        for req in finished:
            self.running.remove(req)
            self._free_request(req)

        return stepped

    def _update_from_output_async(self, scheduler_output,
                                  runner_output) -> List[Request]:
        """Finalize an async step: replace placeholder tokens with the
        device results, then run stop checks one step late."""
        finished: List[Request] = []
        stepped: List[Request] = []
        for rid in scheduler_output.async_sampled_req_ids:
            req = self.requests.get(rid)
            if req is None or req.is_finished:
                continue
            sampled = runner_output.sampled_token_ids.get(rid, [])
            if not sampled:
                continue
            assert req.num_placeholders > 0, rid
            idx = len(req.output_token_ids) - req.num_placeholders
            assert req.output_token_ids[idx] == PLACEHOLDER_TOKEN
            req.output_token_ids[idx] = sampled[0]
            req.num_placeholders -= 1
            stepped.append(req)
            # Stop conditions at the replaced position.
            sp = req.sampling_params
            tok = sampled[0]
            stop = None
            if idx + 1 >= sp.min_tokens:
                if (not sp.ignore_eos and req.eos_token_id is not None
                        and tok == req.eos_token_id):
                    stop = RequestStatus.FINISHED_STOPPED
                elif tok in (sp.stop_token_ids or ()):
                    stop = RequestStatus.FINISHED_STOPPED
                    req.stop_reason = tok
            if stop is None and idx + 1 >= req.max_tokens:
                stop = RequestStatus.FINISHED_LENGTH_CAPPED
            if stop is not None:
                # Drop any later placeholders (their compute is in flight
                # but discarded) and finish.
                del req.output_token_ids[idx + 1:]
                req.num_placeholders = 0
                req.status = stop
                finished.append(req)
        for req in finished:
            if req in self.running:
                self.running.remove(req)
            self._free_request(req)
        return stepped

    def finish_request_external(self, req: Request, status: RequestStatus)\
            -> None:
        """Finish triggered outside update (e.g. stop-string hit detected by
        the detokenizer)."""
        req.status = status
        if req in self.running:
            self.running.remove(req)
        self._free_request(req)

    def _free_request(self, req: Request) -> None:
        if self.kv_offload is not None and not getattr(req, "mm_data", None):
            # Queue the request's full blocks for HBM→host copy. The pages
            # stay valid until the pool reuses them, which can only happen
            # in a later schedule() — the engine drains this list first
            # (reference: offloading_connector request_finished hook).
            hashes = self.kv_cache_manager.req_to_block_hashes.get(
                req.request_id, [])
            block_ids = self.kv_cache_manager.get_block_ids(req.request_id)
            n = min(len(hashes), len(block_ids),
                    req.num_computed_tokens // self.block_size)
            if n > 0:
                todo, slots = self.kv_offload.prepare_store(hashes[:n])
                if todo:
                    # Map stored hashes back to their block ids.
                    pos = {self.kv_offload._key(h): i
                           for i, h in enumerate(hashes[:n])}
                    ids = [block_ids[pos[self.kv_offload._key(h)]]
                           for h in todo]
                    self.pending_kv_stores.append((ids, slots))
        self.kv_cache_manager.free(req)
        self.kv_cache_manager.free_block_hashes(req)
        self.finished_req_ids.append(req.request_id)
        self.requests.pop(req.request_id, None)

    # ---- stats -----------------------------------------------------------

    def make_stats(self) -> dict:
        return {
            "num_running": len(self.running),
            "num_waiting": len(self.waiting),
            "kv_cache_usage": self.kv_cache_manager.usage,
            "num_preemptions": self.num_preemptions,
            "spec_decode": {
                "num_draft_tokens": self.num_spec_draft_tokens,
                "num_accepted_tokens": self.num_spec_accepted_tokens,
                "chain_wins": list(self.num_spec_chain_wins),
                "acceptance_rate": (
                    self.num_spec_accepted_tokens /
                    self.num_spec_draft_tokens
                    if self.num_spec_draft_tokens else None),
            },
            "prefix_cache": self.kv_cache_manager.make_prefix_cache_stats(),
        }
