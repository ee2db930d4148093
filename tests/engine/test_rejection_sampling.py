"""Stochastic rejection sampling (lossless spec decode at temperature > 0).

Reference: vllm/v1/sample/rejection_sampler.py — accept draft d with prob
p(d) (one-hot proposal), else recover from (p - delta_d)+ renormalized.
The op-level tests check the combined output law IS the target sampling
distribution; the engine test runs ngram spec decode at temperature > 0.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.ops.sampling import SamplingTensors, rejection_sample
from lvllm_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.smoke

V = 8


def _run_op(logits_row, draft, n, top_k=0, top_p=1.0, min_p=0.0,
            temperature=1.0):
    """Run rejection_sample over n independent seeds for one logits row."""
    logits = jnp.tile(jnp.asarray(logits_row, jnp.float32)[None], (n, 1))
    st = SamplingTensors(
        temperature=jnp.full((n,), temperature, jnp.float32),
        top_k=jnp.full((n,), top_k, jnp.int32),
        top_p=jnp.full((n,), top_p, jnp.float32),
        min_p=jnp.full((n,), min_p, jnp.float32),
        keys=jnp.arange(n, dtype=jnp.uint32))
    steps = jnp.zeros((n,), jnp.int32)
    drafts = jnp.full((n,), draft, jnp.int32)
    regular = jnp.full((n,), -7, jnp.int32)  # sentinel: must not appear
    out = rejection_sample(logits, st, steps, drafts, regular)
    return np.asarray(out)


def _empirical(tokens, v=V):
    return np.bincount(tokens, minlength=v) / len(tokens)


def test_combined_law_matches_target():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=V) * 1.5
    p = np.exp(logits - logits.max())
    p /= p.sum()
    n = 16384
    for draft in (int(np.argmax(p)), int(np.argmin(p)), 3):
        toks = _run_op(logits, draft, n)
        assert (toks != -7).all()
        emp = _empirical(toks)
        tv = 0.5 * np.abs(emp - p).sum()
        assert tv < 0.03, (draft, tv, emp, p)


def test_recovery_never_equals_draft_when_rejected():
    # Draft has low target prob → mostly rejected; rejected slots must not
    # emit the draft (this is what keeps the host's exact-match scan
    # a valid acceptance test).
    logits = np.zeros(V)
    logits[0] = 5.0
    toks = _run_op(logits, draft=7, n=4096)
    p7 = float(jnp.exp(jnp.asarray(logits[7]) -
                       jax.scipy.special.logsumexp(jnp.asarray(logits))))
    frac7 = (toks == 7).mean()
    assert abs(frac7 - p7) < 0.01  # only genuine accepts produce the draft


def test_top_p_filter_respected():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=V) * 2.0
    # Expected filtered distribution (top_p = 0.7, full-vocab semantics:
    # keep tokens while cumulative-before < top_p).
    scaled = logits - logits.max()
    p = np.exp(scaled) / np.exp(scaled).sum()
    order = np.argsort(-p)
    cum = np.cumsum(p[order])
    keep_sorted = (cum - p[order]) < 0.7
    keep = np.zeros(V, bool)
    keep[order[keep_sorted]] = True
    p_f = np.where(keep, p, 0.0)
    p_f /= p_f.sum()

    dropped = int(order[~keep_sorted][0])
    n = 16384
    toks = _run_op(logits, draft=dropped, n=n, top_p=0.7)
    # Draft outside the kept set: never accepted, never recovered.
    assert not (toks == dropped).any()
    emp = _empirical(toks)
    tv = 0.5 * np.abs(emp - p_f).sum()
    assert tv < 0.03, (tv, emp, p_f)


def test_top_k_one_always_argmax():
    logits = np.array([0.1, 3.0, 0.2, 0.0, -1.0, 0.5, 0.3, 0.9])
    toks = _run_op(logits, draft=1, n=512, top_k=1)
    assert (toks == 1).all()  # draft == argmax == the whole kept set
    toks = _run_op(logits, draft=4, n=512, top_k=1)
    assert (toks == 1).all()  # reject draft, recover argmax


def _build_engine(spec: bool, seed=11):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, max_model_len=256, eos_token_id=-1,
        seed=seed)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=128),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=256,
                                         max_num_seqs=4, max_model_len=256),
        speculative_config=SpeculativeConfig(
            method="ngram" if spec else None, num_speculative_tokens=3,
            ngram_min=2, ngram_max=3),
    )
    return LLMEngine(cfg, load_format="dummy")


def _run_engine(engine, prompts, temperature, max_tokens=24, seed=123,
                top_k=0):
    outs = {}
    sp = SamplingParams(temperature=temperature, max_tokens=max_tokens,
                        seed=seed, top_k=top_k)
    for i, p in enumerate(prompts):
        engine.add_request(f"r{i}", p, sp)
    steps = 0
    seen = {}
    max_gain = 0  # largest per-request token gain in one step
    while engine.has_unfinished_requests():
        for o in engine.step():
            n = len(o.outputs[0].token_ids)
            max_gain = max(max_gain, n - seen.get(o.request_id, 0))
            seen[o.request_id] = n
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < 10000
    return [outs[f"r{i}"].outputs[0].token_ids
            for i in range(len(prompts))], steps, max_gain


def test_engine_nongreedy_spec_completes():
    """Plain temp-0.8 sampling with a high-entropy dummy model: drafts are
    rarely proposed (ngram needs repeats) and correctly rejected when the
    target prob of the draft is tiny — the run must still complete with
    exactly max_tokens per request."""
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [7, 8, 7, 8, 7, 8, 7]]
    toks, steps, _ = _run_engine(_build_engine(True), prompts,
                                 temperature=0.8)
    for t in toks:
        assert len(t) == 24
        assert all(0 <= x < 64 for x in t)
    assert steps <= 2 * 24


def test_engine_nongreedy_spec_accepts():
    """Acceptance evidence through the STOCHASTIC verify path: top_k=1 at
    temperature>0 makes the filtered target one-hot at the argmax, so the
    chain matches greedy decoding and any matching ngram draft has
    acceptance probability p(d)=1. Some step must emit >1 token for a
    request (accepted draft + bonus) — a steps-only bound is vacuous
    because the slowest request can still take one step per token."""
    toks, steps, max_gain = _run_engine(
        _build_engine(True), [[3, 4, 3, 4, 3, 4, 3, 4]], temperature=0.8,
        top_k=1, max_tokens=32)
    assert len(toks[0]) == 32
    assert max_gain > 1
    assert steps < 32


def test_engine_nongreedy_spec_seeded_reproducible():
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2]]
    a, _, _ = _run_engine(_build_engine(True), prompts, temperature=0.8)
    b, _, _ = _run_engine(_build_engine(True), prompts, temperature=0.8)
    assert a == b


def test_engine_mixed_greedy_and_sampled_spec():
    engine = _build_engine(True)
    engine.add_request("g", [1, 2, 3, 1, 2, 3], SamplingParams(
        temperature=0.0, max_tokens=16))
    engine.add_request("s", [7, 8, 7, 8, 7], SamplingParams(
        temperature=0.9, max_tokens=16, seed=7))
    outs = {}
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < 10000
    assert len(outs["g"].outputs[0].token_ids) == 16
    assert len(outs["s"].outputs[0].token_ids) == 16
    # Greedy row must be unaffected by the sampled row sharing the batch:
    base = _build_engine(True)
    base.add_request("g", [1, 2, 3, 1, 2, 3], SamplingParams(
        temperature=0.0, max_tokens=16))
    ref = {}
    while base.has_unfinished_requests():
        for o in base.step():
            if o.finished:
                ref[o.request_id] = o
    assert ref["g"].outputs[0].token_ids == outs["g"].outputs[0].token_ids


# ---- general-q (sampled-draft) verification --------------------------------

def _run_op_q(logits_row, draft, q_row, n, temperature=1.0, top_k=0,
              top_p=1.0):
    logits = jnp.tile(jnp.asarray(logits_row, jnp.float32)[None], (n, 1))
    st = SamplingTensors(
        temperature=jnp.full((n,), temperature, jnp.float32),
        top_k=jnp.full((n,), top_k, jnp.int32),
        top_p=jnp.full((n,), top_p, jnp.float32),
        min_p=jnp.zeros((n,), jnp.float32),
        keys=jnp.arange(n, dtype=jnp.uint32))
    steps = jnp.zeros((n,), jnp.int32)
    drafts = jnp.full((n,), draft, jnp.int32)
    regular = jnp.full((n,), -7, jnp.int32)
    q = jnp.tile(jnp.asarray(q_row, jnp.float32)[None], (n, 1))
    out = rejection_sample(logits, st, steps, drafts, regular, draft_q=q)
    return np.asarray(out)


def test_general_q_combined_law_matches_target():
    """Arbitrary proposal q (reference rejection_sampler.py general form):
    with drafts DRAWN from q, the accept/recover law must equal the
    target distribution p (speculative-sampling theorem)."""
    rng = np.random.default_rng(3)
    logits = rng.normal(size=V) * 1.5
    p = np.exp(logits - logits.max())
    p /= p.sum()
    q = rng.dirichlet(np.ones(V) * 0.7)
    n = 16384
    drafts = rng.choice(V, size=n, p=q).astype(np.int32)
    logits_b = jnp.tile(jnp.asarray(logits, jnp.float32)[None], (n, 1))
    st = SamplingTensors(
        temperature=jnp.ones((n,), jnp.float32),
        top_k=jnp.zeros((n,), jnp.int32),
        top_p=jnp.ones((n,), jnp.float32),
        min_p=jnp.zeros((n,), jnp.float32),
        keys=jnp.arange(n, dtype=jnp.uint32))
    out = rejection_sample(
        logits_b, st, jnp.zeros((n,), jnp.int32), jnp.asarray(drafts),
        jnp.full((n,), -7, jnp.int32),
        draft_q=jnp.tile(jnp.asarray(q, jnp.float32)[None], (n, 1)))
    toks = np.asarray(out)
    assert (toks != -7).all()
    emp = _empirical(toks)
    tv = 0.5 * np.abs(emp - p).sum()
    assert tv < 0.03, (tv, emp, p)


def test_general_q_one_hot_reduces_to_deterministic_path():
    """One-hot q must reproduce the deterministic verification law."""
    rng = np.random.default_rng(4)
    logits = rng.normal(size=V)
    draft = 2
    q = np.zeros(V)
    q[draft] = 1.0
    n = 16384
    toks_q = _run_op_q(logits, draft, q, n)
    toks_1h = _run_op(logits, draft, n)
    # Same law (and same accept stream → same accepted slots).
    tv = 0.5 * np.abs(_empirical(toks_q) - _empirical(toks_1h)).sum()
    assert tv < 0.03


def test_general_q_rejection_never_emits_draft():
    """Rejection implies p(d) < q(d) so the residual at d is zero; the
    host's exact-match acceptance scan stays valid."""
    logits = np.zeros(V)
    logits[1] = 5.0           # target concentrated on token 1
    q = np.full(V, 1e-6)
    q[3] = 1.0 - 1e-6 * (V - 1)   # draft token 3, q(3)≈1, p(3) tiny
    toks = _run_op_q(logits, 3, q, 8192)
    frac_draft = (toks == 3).mean()
    assert frac_draft < 0.02      # ≈ p(3)/q(3), tiny
    assert ((toks == 3) | (toks == 1) | (toks >= 0)).all()


def test_engine_sampled_drafts_draft_model():
    """Draft-model proposer at temperature>0 samples its drafts and ships
    q; the run must complete, be seed-reproducible, and record
    acceptance stats."""
    from lvllm_tpu.config import ModelConfig as MC

    def build():
        tiny = MC(model="dummy", architecture="Qwen3ForCausalLM",
                  dtype="bfloat16", vocab_size=64, hidden_size=32,
                  intermediate_size=64, num_hidden_layers=1,
                  num_attention_heads=2, num_key_value_heads=2,
                  head_dim=16, max_position_embeddings=128,
                  max_model_len=64, eos_token_id=-1)
        cfg = EngineConfig(
            model_config=MC(
                model="dummy", architecture="Qwen3ForCausalLM",
                dtype="bfloat16", vocab_size=64, hidden_size=64,
                intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=2, num_key_value_heads=2, head_dim=32,
                max_position_embeddings=128, max_model_len=64,
                eos_token_id=-1),
            cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
            scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                             max_num_seqs=4,
                                             max_model_len=64),
            speculative_config=SpeculativeConfig(
                method="draft_model", num_speculative_tokens=3,
                draft_model_config=tiny))
        return LLMEngine(cfg, load_format="dummy")

    def run(eng):
        eng.add_request("s", [1, 2, 3, 4, 5], SamplingParams(
            temperature=0.9, max_tokens=16, seed=11))
        out = None
        steps = 0
        while eng.has_unfinished_requests() and steps < 100:
            for o in eng.step():
                if o.finished:
                    out = o.outputs[0].token_ids
            steps += 1
        return out, eng

    a, eng = run(build())
    assert a is not None and len(a) == 16
    # The sampled-draft path actually ran: q distributions were staged.
    sd = eng.get_stats()["spec_decode"]
    assert sd["num_draft_tokens"] > 0
    b, _ = run(build())
    assert a == b
