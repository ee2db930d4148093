"""Batched sampling ops (jittable).

Counterpart of the reference's ``vllm/v1/sample/sampler.py`` + its Triton
ops: per-request temperature / top-k / top-p / min-p, penalties, greedy.
All ops are batch-invariant: each row's result depends only on its own
params and its per-request PRNG key.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass
class SamplingTensors:
    """Per-slot device arrays driving the sampler (built by the runner from
    each request's SamplingParams)."""

    temperature: jax.Array   # [B] f32; 0 => greedy
    top_k: jax.Array         # [B] i32; 0 => disabled
    top_p: jax.Array         # [B] f32; 1 => disabled
    min_p: jax.Array         # [B] f32; 0 => disabled
    # Per-request PRNG keys, folded with the step counter by the caller.
    keys: jax.Array          # [B] uint32 seeds


def make_keys(seeds: jax.Array, steps: jax.Array) -> jax.Array:
    """Derive per-row PRNG keys from per-request seeds and each request's
    own decode position [B] — so seeded sampling is reproducible regardless
    of global engine step or batch composition (batch-invariant)."""
    base = jax.vmap(jax.random.key)(seeds.astype(jnp.uint32))
    return jax.vmap(jax.random.fold_in)(base, steps)


def apply_penalties(
    logits: jax.Array,          # [B, V] f32
    prompt_mask: jax.Array,     # [B, V] bool — token appears in prompt
    output_counts: jax.Array,   # [B, V] i32 — occurrences in output
    repetition_penalty: jax.Array,  # [B] f32 (1 = off)
    presence_penalty: jax.Array,    # [B] f32 (0 = off)
    frequency_penalty: jax.Array,   # [B] f32 (0 = off)
) -> jax.Array:
    """Reference-equivalent penalties (sampler ops penalties.py):
    repetition scales seen-token logits; presence/frequency subtract."""
    seen = prompt_mask | (output_counts > 0)
    rp = repetition_penalty[:, None]
    scaled = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, scaled, logits)
    logits = logits - frequency_penalty[:, None] * output_counts
    logits = logits - presence_penalty[:, None] * (output_counts > 0)
    return logits


def apply_penalties_from_history(
    logits: jax.Array,       # [B, V] f32
    token_mat: jax.Array,    # [B, L] i32 — prompt+output token history
    num_prompt: jax.Array,   # [B] i32
    num_tokens: jax.Array,   # [B] i32
    repetition_penalty: jax.Array,  # [B]
    presence_penalty: jax.Array,    # [B]
    frequency_penalty: jax.Array,   # [B]
) -> jax.Array:
    """Build presence/count masks from raw token history on device, then
    apply penalties — avoids shipping dense [B, V] matrices from the host
    (reference: sampler ops penalties.py builds these on GPU)."""
    B, V = logits.shape
    L = token_mat.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_prompt = pos < num_prompt[:, None]
    in_output = (pos >= num_prompt[:, None]) & (pos < num_tokens[:, None])
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, L))
    safe_tok = jnp.clip(token_mat, 0, V - 1)
    prompt_mask = jnp.zeros((B, V), jnp.bool_).at[rows, safe_tok].max(
        in_prompt)
    out_counts = jnp.zeros((B, V), jnp.int32).at[rows, safe_tok].add(
        in_output.astype(jnp.int32))
    return apply_penalties(logits, prompt_mask, out_counts,
                           repetition_penalty, presence_penalty,
                           frequency_penalty)


def sample(
    logits: jax.Array,  # [B, V] f32
    st: SamplingTensors,
    steps: jax.Array,   # [B] i32 per-request decode position
    greedy_only: bool = False,
    topk_cap: int = 128,
) -> jax.Array:
    """Sample one token per row → [B] i32.

    Fast path: masking runs in a ``lax.top_k(topk_cap)``-wide space — a
    full-vocab argsort dominates sampling cost on TPU (reference analog:
    vllm's flashinfer/triton top-k+top-p kernels avoid it too). This stays
    EXACT: probabilities use the full-vocab logsumexp denominator, and a
    ``lax.cond`` falls back to the full sort whenever any row's kept set
    could extend past the cap (top_k disabled/large AND the top-cap mass
    short of top_p, or a min_p bound that the cap'th token still clears).
    Gumbel noise is keyed by token id (not rank), so both branches draw
    identically — the chosen path never changes the sample.
    """
    B, V = logits.shape
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        # Static fast path: every active row is temperature-0 — skip
        # sampling entirely.
        return greedy_ids

    temp = jnp.maximum(st.temperature, 1e-6)[:, None]
    scaled = logits.astype(jnp.float32) / temp
    keys = make_keys(st.keys, steps)
    gumbel = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (V,), dtype=jnp.float32))(keys)

    K = min(topk_cap, V)
    vals, idx = jax.lax.top_k(scaled, K)                  # [B, K] descending
    lse = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
    p_k = jnp.exp(vals - lse)                             # exact full-denom
    ranks = jnp.arange(K, dtype=jnp.int32)[None, :]
    k = jnp.where(st.top_k <= 0, V, st.top_k)[:, None]
    cum = jnp.cumsum(p_k, axis=-1)
    keep_k = (ranks < k) & ((cum - p_k) < st.top_p[:, None]) & \
        (p_k >= st.min_p[:, None] * p_k[:, :1])

    sampling_row = st.temperature > 0.0
    beyond_cap = (st.top_k <= 0) | (st.top_k > K)
    p_reaches_tail = cum[:, -1] < st.top_p
    minp_reaches_tail = (st.min_p > 0.0) & \
        (p_k[:, -1] >= st.min_p * p_k[:, 0])
    need_full = jnp.any(sampling_row & beyond_cap &
                        (p_reaches_tail | minp_reaches_tail))

    def capped_branch(_):
        g = jnp.take_along_axis(gumbel, idx, axis=-1)
        masked = jnp.where(keep_k, vals + g, -jnp.inf)
        r = jnp.argmax(masked, axis=-1)
        return jnp.take_along_axis(idx, r[:, None],
                                   axis=-1)[:, 0].astype(jnp.int32)

    def full_branch(_):
        sort_idx = jnp.argsort(-scaled, axis=-1)          # [B, V]
        sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
        rv = jnp.arange(V, dtype=jnp.int32)[None, :]
        probs = jnp.exp(sorted_logits - lse)
        cumsum = jnp.cumsum(probs, axis=-1)
        keep = (rv < k) & ((cumsum - probs) < st.top_p[:, None]) & \
            (probs >= st.min_p[:, None] * probs[:, :1])
        g = jnp.take_along_axis(gumbel, sort_idx, axis=-1)
        masked = jnp.where(keep, sorted_logits + g, -jnp.inf)
        r = jnp.argmax(masked, axis=-1)
        return jnp.take_along_axis(sort_idx, r[:, None],
                                   axis=-1)[:, 0].astype(jnp.int32)

    sampled = jax.lax.cond(need_full, full_branch, capped_branch, None)
    return jnp.where(st.temperature == 0.0, greedy_ids, sampled)


def rejection_sample(
    logits: jax.Array,        # [B, V] f32 (post penalties/grammar)
    st: SamplingTensors,
    steps: jax.Array,         # [B] i32 per-request decode position
    draft_tokens: jax.Array,  # [B] i32; -1 = no draft at this slot
    regular: jax.Array,       # [B] i32 fallback (output of ``sample``)
    draft_q: "jax.Array | None" = None,  # [B, V] proposal distribution
) -> jax.Array:
    """Lossless stochastic verification of draft proposals
    (reference: ``vllm/v1/sample/rejection_sampler.py``).

    Deterministic proposers (ngram, suffix, greedy chains, EAGLE, medusa,
    MTP) have a one-hot proposal distribution q at the draft token d, so
    speculative sampling reduces to (``draft_q=None``):

      accept d with prob p(d)            (u < p(d)/q(d), q(d)=1)
      else emit a recovery token from    (p - delta_d)+ / (1 - p(d))

    Sampling-based proposers supply their full per-position proposal
    distribution ``draft_q`` and get the general form:

      accept d with prob min(1, p(d)/q(d))
      else emit a recovery token from    (p - q)+ / Z

    where p is the SAME filtered/renormalized target distribution that
    ``sample`` draws from (temperature + top-k/top-p/min-p masking).
    The combined law is exactly p (speculative-sampling theorem) either
    way, and the recovery token can never equal d (rejection implies
    p(d) < q(d), so the residual at d is zero) — so the host's
    exact-match prefix scan over (sampled == draft) remains a correct
    acceptance test.

    Slots with no draft, or temperature 0 (greedy exact-match path), pass
    ``regular`` through. Runs in full-vocab space: this trace only exists
    when a non-greedy row has drafts scheduled, and exactness of the kept
    set matters more than the top-k-cap fast path here.
    """
    B, V = logits.shape
    temp = jnp.maximum(st.temperature, 1e-6)[:, None]
    scaled = logits.astype(jnp.float32) / temp
    lse = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)

    # Kept-token mask, identical to sample()'s full_branch semantics.
    sort_idx = jnp.argsort(-scaled, axis=-1)                   # [B, V]
    sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
    probs_sorted = jnp.exp(sorted_logits - lse)
    cumsum = jnp.cumsum(probs_sorted, axis=-1)
    rv = jnp.arange(V, dtype=jnp.int32)[None, :]
    k = jnp.where(st.top_k <= 0, V, st.top_k)[:, None]
    keep_sorted = (rv < k) & ((cumsum - probs_sorted) < st.top_p[:, None]) \
        & (probs_sorted >= st.min_p[:, None] * probs_sorted[:, :1])
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, V))
    keep = jnp.zeros((B, V), jnp.bool_).at[rows, sort_idx].set(keep_sorted)

    p_full = jnp.exp(scaled - lse)                             # [B, V]
    z = jnp.sum(jnp.where(keep, p_full, 0.0), axis=-1, keepdims=True)
    d = jnp.clip(draft_tokens, 0, V - 1)[:, None]
    d_kept = jnp.take_along_axis(keep, d, axis=-1)[:, 0]
    p_d = jnp.where(
        d_kept,
        jnp.take_along_axis(p_full, d, axis=-1)[:, 0] /
        jnp.maximum(z[:, 0], 1e-20),
        0.0)

    # Independent sub-streams off the per-(request, position) key: fold 1
    # for the acceptance uniform, 2 for the recovery Gumbel draw (the base
    # key itself feeds sample()'s Gumbel).
    keys = make_keys(st.keys, steps)
    u = jax.vmap(lambda kk: jax.random.uniform(
        jax.random.fold_in(kk, 1), dtype=jnp.float32))(keys)

    g = jax.vmap(lambda kk: jax.random.gumbel(
        jax.random.fold_in(kk, 2), (V,), dtype=jnp.float32))(keys)
    tok_ids = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    if draft_q is None:
        accept = u < p_d
        recovery_keep = keep & (tok_ids != d)
        # (p - delta_d)+ renormalized == p restricted to keep \ {d}:
        # Gumbel argmax over the masked logits samples it exactly. If
        # keep == {d}, p_d == 1 and u < 1 always accepts, so the empty
        # mask is never read.
        masked = jnp.where(recovery_keep, scaled + g, -jnp.inf)
        recovery = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    else:
        # General q: accept u < min(1, p(d)/q(d)); recover from
        # (p - q)+ / Z via Gumbel argmax over log residual.
        q_d = jnp.take_along_axis(draft_q.astype(jnp.float32), d,
                                  axis=-1)[:, 0]
        accept = u * jnp.maximum(q_d, 1e-20) < p_d
        p_keep = jnp.where(keep, p_full / jnp.maximum(z, 1e-20), 0.0)
        residual = jnp.maximum(p_keep - draft_q.astype(jnp.float32), 0.0)
        masked = jnp.where(residual > 0.0, jnp.log(residual) + g, -jnp.inf)
        # Guard the degenerate all-zero residual (p numerically == q
        # everywhere but fp rounding of p_d vs q_d still rejected):
        # argmax over an all -inf row would silently emit token 0; the
        # draft itself is the correct emission since p == q.
        recovery = jnp.where(
            jnp.sum(residual, axis=-1) > 0.0,
            jnp.argmax(masked, axis=-1), d[:, 0]).astype(jnp.int32)

    verified = jnp.where(accept, draft_tokens, recovery)
    use = (draft_tokens >= 0) & (st.temperature > 0.0)
    return jnp.where(use, verified, regular)


def compute_logprobs(
    logits: jax.Array,      # [B, V]
    token_ids: jax.Array,   # [B]
) -> jax.Array:
    """Log-prob of each chosen token (for SamplingParams.logprobs)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, token_ids[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
