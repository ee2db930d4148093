"""Deviceless scheduler tests (reference model: tests/v1/core/test_scheduler.py
built on the create_scheduler fixture, SURVEY.md §4)."""

import pytest

from lvllm_tpu.config import CacheConfig, SchedulerConfig
from lvllm_tpu.core.request import Request, RequestStatus
from lvllm_tpu.core.scheduler import Scheduler
from lvllm_tpu.core.sched_output import ModelRunnerOutput
from lvllm_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.smoke


def create_scheduler(max_num_batched_tokens=64, max_num_seqs=8,
                     num_kv_blocks=64, block_size=16,
                     enable_prefix_caching=True):
    return Scheduler(
        SchedulerConfig(max_num_batched_tokens=max_num_batched_tokens,
                        max_num_seqs=max_num_seqs, max_model_len=1024),
        CacheConfig(block_size=block_size,
                    enable_prefix_caching=enable_prefix_caching),
        num_kv_blocks=num_kv_blocks,
    )


def make_request(rid, prompt_len, max_tokens=8, prompt=None):
    tokens = prompt if prompt is not None else \
        [(hash(rid) + i) % 1000 for i in range(prompt_len)]
    return Request(rid, tokens, SamplingParams(max_tokens=max_tokens),
                   eos_token_id=0)


def run_step(sched, sampled_token=5):
    """Schedule one step and fake the model: sample `sampled_token` for every
    request whose prompt is fully computed after this step."""
    out = sched.schedule()
    sampled = {}
    for rid, n in out.num_scheduled_tokens.items():
        req = sched.requests.get(rid)
        if req and req.num_computed_tokens + n >= req.num_prompt_tokens:
            sampled[rid] = [sampled_token]
    sched.update_from_output(out, ModelRunnerOutput(sampled_token_ids=sampled))
    return out


def test_single_request_prefill_then_decode():
    sched = create_scheduler()
    req = make_request("r0", 20, max_tokens=3)
    sched.add_request(req)

    out = sched.schedule()
    assert out.num_scheduled_tokens == {"r0": 20}
    assert len(out.scheduled_new_reqs) == 1
    sched.update_from_output(out, ModelRunnerOutput(
        sampled_token_ids={"r0": [7]}))
    assert req.num_computed_tokens == 20
    assert req.output_token_ids == [7]

    out2 = sched.schedule()
    assert out2.num_scheduled_tokens == {"r0": 1}
    assert len(out2.scheduled_cached_reqs) == 1


def test_chunked_prefill():
    sched = create_scheduler(max_num_batched_tokens=64)
    req = make_request("r0", 150, max_tokens=2)
    sched.add_request(req)

    out1 = sched.schedule()
    assert out1.num_scheduled_tokens["r0"] == 64
    sched.update_from_output(out1, ModelRunnerOutput())
    assert req.num_computed_tokens == 64

    out2 = sched.schedule()
    assert out2.num_scheduled_tokens["r0"] == 64
    sched.update_from_output(out2, ModelRunnerOutput())

    out3 = sched.schedule()
    assert out3.num_scheduled_tokens["r0"] == 22
    sched.update_from_output(out3, ModelRunnerOutput(
        sampled_token_ids={"r0": [9]}))
    assert req.output_token_ids == [9]


def test_token_budget_shared_across_requests():
    sched = create_scheduler(max_num_batched_tokens=64)
    sched.add_request(make_request("r0", 40, max_tokens=2))
    sched.add_request(make_request("r1", 40, max_tokens=2))
    out = sched.schedule()
    assert out.num_scheduled_tokens["r0"] == 40
    assert out.num_scheduled_tokens["r1"] == 24  # remaining budget
    assert out.total_num_scheduled_tokens == 64


def test_max_num_seqs_cap():
    sched = create_scheduler(max_num_batched_tokens=1024, max_num_seqs=2)
    for i in range(4):
        sched.add_request(make_request(f"r{i}", 8))
    out = sched.schedule()
    assert len(out.num_scheduled_tokens) == 2


def test_finish_on_eos_and_length():
    sched = create_scheduler()
    req = make_request("r0", 4, max_tokens=10)
    sched.add_request(req)
    run_step(sched)  # prefill + first token
    # EOS (=0) should finish it.
    out = sched.schedule()
    sched.update_from_output(out, ModelRunnerOutput(
        sampled_token_ids={"r0": [0]}))
    assert req.status == RequestStatus.FINISHED_STOPPED
    assert not sched.has_unfinished_requests()

    req2 = make_request("r1", 4, max_tokens=2)
    sched.add_request(req2)
    run_step(sched)
    run_step(sched)
    assert req2.status == RequestStatus.FINISHED_LENGTH_CAPPED
    assert req2.num_output_tokens == 2


def test_preemption_and_resume():
    # Tiny pool: 8 usable blocks of 16 tokens = 128 tokens of KV.
    sched = create_scheduler(max_num_batched_tokens=1024, num_kv_blocks=9,
                             enable_prefix_caching=False)
    r0 = make_request("r0", 60, max_tokens=100)
    r1 = make_request("r1", 60, max_tokens=100)
    sched.add_request(r0)
    sched.add_request(r1)
    out = sched.schedule()
    assert set(out.num_scheduled_tokens) == {"r0", "r1"}
    sched.update_from_output(out, ModelRunnerOutput(
        sampled_token_ids={"r0": [5], "r1": [5]}))

    # Decode until pool exhausts → r1 (last) preempted.
    preempted = False
    for _ in range(20):
        out = sched.schedule()
        if out.preempted_req_ids:
            assert out.preempted_req_ids == ["r1"]
            preempted = True
            break
        sched.update_from_output(out, ModelRunnerOutput(
            sampled_token_ids={rid: [5] for rid in out.num_scheduled_tokens}))
    assert preempted
    assert r1.status == RequestStatus.PREEMPTED
    assert r1.num_computed_tokens == 0
    assert sched.num_preemptions == 1

    # Finish r0, then r1 resumes and reruns its whole (prompt+output) prefix.
    sched.abort_requests(["r0"])
    out = sched.schedule()
    assert "r1" in out.num_scheduled_tokens
    cached = out.scheduled_cached_reqs[0] if out.scheduled_cached_reqs else None
    assert cached is not None and cached.resumed_from_preemption
    assert cached.all_token_ids is not None


def test_prefix_cache_reduces_prefill():
    sched = create_scheduler(max_num_batched_tokens=256)
    prompt = list(range(100))
    r0 = Request("r0", prompt, SamplingParams(max_tokens=1), eos_token_id=-1)
    sched.add_request(r0)
    run_step(sched)
    run_step(sched)
    assert r0.is_finished

    r1 = Request("r1", prompt, SamplingParams(max_tokens=1), eos_token_id=-1)
    sched.add_request(r1)
    out = sched.schedule()
    # 6 full blocks = 96 tokens cached → only 4 scheduled.
    assert out.num_scheduled_tokens["r1"] == 4
    assert r1.num_cached_tokens == 96


def test_abort_waiting_and_running():
    sched = create_scheduler()
    r0 = make_request("r0", 8)
    r1 = make_request("r1", 8)
    sched.add_request(r0)
    sched.add_request(r1)
    run_step(sched)
    sched.abort_requests(["r0", "r1"])
    assert not sched.has_unfinished_requests()
    assert sched.kv_cache_manager.block_pool.get_usage() == 0.0


def test_priority_policy():
    sched = Scheduler(
        SchedulerConfig(max_num_batched_tokens=8, max_num_seqs=1,
                        max_model_len=1024, policy="priority"),
        CacheConfig(block_size=16), num_kv_blocks=64)
    low = Request("low", [1] * 8, SamplingParams(), priority=10)
    high = Request("high", [2] * 8, SamplingParams(), priority=0)
    sched.add_request(low)
    sched.add_request(high)
    out = sched.schedule()
    assert "high" in out.num_scheduled_tokens


def test_spec_decode_accounting():
    sched = create_scheduler()
    req = make_request("r0", 8, max_tokens=20)
    sched.add_request(req)
    run_step(sched)
    # Propose 2 draft tokens for next step.
    req.spec_token_ids = [11, 12]
    out = sched.schedule()
    assert out.num_scheduled_tokens["r0"] == 3  # 1 real + 2 draft
    assert out.scheduled_spec_decode_tokens["r0"] == [11, 12]
    # Model accepts 1 draft (returns 2 tokens: accepted + bonus).
    sched.update_from_output(out, ModelRunnerOutput(
        sampled_token_ids={"r0": [11, 13]}))
    assert req.output_token_ids[-2:] == [11, 13]
    # computed advances by scheduled(3) - rejected(1) = 2 → 10; this keeps
    # the invariant computed == num_tokens - 1 going into the next decode.
    assert req.num_computed_tokens == 10
    assert req.num_computed_tokens == req.num_tokens - 1


def test_pause_drain_and_freeze():
    sched = create_scheduler()
    r0 = make_request("r0", 8, max_tokens=5)
    r1 = make_request("r1", 8, max_tokens=5)
    sched.add_request(r0)
    run_step(sched)          # r0 running
    sched.add_request(r1)    # waiting

    sched.pause("drain")
    out = sched.schedule()
    # r0 keeps decoding; r1 is NOT admitted.
    assert "r0" in out.num_scheduled_tokens
    assert "r1" not in out.num_scheduled_tokens

    sched.pause("freeze")
    out = sched.schedule()
    assert out.is_empty()

    sched.resume()
    out = sched.schedule()
    assert "r1" in out.num_scheduled_tokens


def test_atomic_prefill_holds_until_budget_reaches_prompt_end():
    """Prefix-LM models (atomic_prefill): a prompt never splits across
    prefill chunks — the request waits for a step with enough budget
    (ADVICE r04: chunked prefill truncated the bidirectional span)."""
    sched = Scheduler(
        SchedulerConfig(max_num_batched_tokens=64, max_num_seqs=8,
                        max_model_len=1024, atomic_prefill=True),
        CacheConfig(block_size=16, enable_prefix_caching=False),
        num_kv_blocks=64,
    )
    # r0 eats 40 of the 64-token budget; r1 (40 tokens) must NOT take the
    # remaining 24 as a partial chunk.
    sched.add_request(make_request("r0", 40, max_tokens=2))
    sched.add_request(make_request("r1", 40, max_tokens=2))
    out = sched.schedule()
    assert out.num_scheduled_tokens == {"r0": 40}
    sched.update_from_output(out, ModelRunnerOutput(
        sampled_token_ids={"r0": [7]}))
    # Next step: r0 decodes 1 token, leaving 63 — r1 fits whole.
    out2 = sched.schedule()
    assert out2.num_scheduled_tokens["r1"] == 40
