"""EAGLE speculative-decoding proposer.

Counterpart of the reference's EAGLE/EAGLE-3 proposer stack
(``vllm/v1/spec_decode/llm_base_proposer.py``, ``eagle.py``; registry
``_SPECULATIVE_DECODING_MODELS`` ``models/registry.py:570``): a one-layer
draft head conditioned on the *target model's hidden states* — for target
position p the head ingests the pair (feature h_p, token t_{p+1}) through

    x = fc(concat(embed(t_{p+1}), h_p))  →  one decoder layer  →  feature
    logits = lm_head(norm(feature))      →  draft for position p+2

and during drafting feeds its own predicted features back autoregressively.

TPU-native state design mirrors ``DraftModelProposer``: the head keeps its
own paged KV cache with a per-request ``processed`` cursor; every engine
step ingests the newly *accepted* pairs as a ragged chunk (overwriting any
slots written by rejected drafts — rollback is cursor-only), then decodes
up to k draft tokens. Target hidden states stay on device: the runner hands
the proposer its full per-step hidden array and row offsets, and the ingest
step slices it inside jit (no host round-trip of activations).

Verification stays exact-match greedy in the runner, so a poorly-trained
(or dummy) head degrades acceptance, never correctness.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm, silu_and_mul
from lvllm_tpu.logger import init_logger
from lvllm_tpu.ops.attention import ragged_paged_attention
from lvllm_tpu.ops.kv_cache import new_kv_cache, write_kv
from lvllm_tpu.ops.rope import apply_rope, compute_cos_sin_cache

logger = init_logger(__name__)


def _bucket(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


def sample_draft_token(logits, temperature, top_k, top_p, min_p, seed,
                       draw):
    """Draw one draft token from the head's own filtered distribution and
    return (token, q) — q is the filtered, renormalized proposal the
    general-q rejection verifier accepts against (reference
    rejection_sampler.py; same math as DraftModelProposer.step_sampled).
    ``logits`` is a [V] row."""
    V = logits.shape[-1]
    scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    lse = jax.scipy.special.logsumexp(scaled, keepdims=True)
    sort_idx = jnp.argsort(-scaled)
    sorted_logits = scaled[sort_idx]
    probs_sorted = jnp.exp(sorted_logits - lse)
    cumsum = jnp.cumsum(probs_sorted)
    rv = jnp.arange(V, dtype=jnp.int32)
    kk = jnp.where(top_k <= 0, V, top_k)
    keep_sorted = (rv < kk) & ((cumsum - probs_sorted) < top_p) & \
        (probs_sorted >= min_p * probs_sorted[0])
    keep = jnp.zeros((V,), jnp.bool_).at[sort_idx].set(keep_sorted)
    p = jnp.where(keep, jnp.exp(scaled - lse), 0.0)
    q = p / jnp.maximum(p.sum(), 1e-20)
    # Draft chain rng: fold 3 = disjoint from the target's sample/accept/
    # recovery streams; per-draw offset separates chain positions.
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(seed), 3), draw)
    g = jax.random.gumbel(key, (V,), dtype=jnp.float32)
    tok = jnp.argmax(jnp.where(keep, scaled + g, -jnp.inf))
    return tok.astype(jnp.int32), q


class EagleProposer:
    """One-layer EAGLE head over the target's feature stream."""

    def __init__(self, target_config: ModelConfig, k: int,
                 block_size: int = 16, num_blocks: int = 512,
                 weights=None, seed: int = 0, mode: str = "eagle",
                 aux_layers: tuple = ()):
        """``mode='eagle3'``: the first ingest fuses hidden states tapped
        from ``aux_layers`` of the target (concat [3H] → fc3 → feature);
        drafting then feeds the head's own features as in EAGLE-1
        (reference: eagle3 multi-level feature fusion,
        v1/spec_decode/eagle.py)."""
        c = target_config
        self.k = k
        self.mode = mode
        self.aux_layers = tuple(aux_layers)
        self.num_feats = max(len(self.aux_layers), 1) if mode == "eagle3" \
            else 1
        self.config = c
        self.block_size = block_size
        self.dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self.head_dim = c.head_dim
        self.scale = c.head_dim ** -0.5
        rot = int(c.head_dim * c.partial_rotary_factor)
        self.cos_sin = compute_cos_sin_cache(
            rot, c.max_position_embeddings, c.rope_theta, c.rope_scaling,
            dtype=jnp.float32)
        self.params = (self._load(weights) if weights is not None
                       else self.init_params(seed))
        self.kv_cache = new_kv_cache(num_blocks, block_size,
                                     c.num_key_value_heads, c.head_dim,
                                     self.dtype)
        self._free_blocks = list(range(num_blocks - 1, 0, -1))
        self._reqs: Dict[str, dict] = {}
        self._max_blocks = -(-c.max_model_len // block_size)
        # rid → [k, V] f32 proposal distributions of the last sampled
        # proposal (consumed by the runner's rejection_sample draft_q);
        # a LIST of such stacks (one per chain) in multi-candidate mode.
        self.last_q: Dict[str, object] = {}
        # Multi-candidate (tree) speculation: number of chains to branch
        # at the root (set by EngineCore before first use; reference:
        # speculative_token_tree, llm_base_proposer.py:282).
        self.n_chains = 1
        self._copy_block_fn = None

        self._ingest_fn = jax.jit(self._fwd_ingest, donate_argnums=(1,),
                                  static_argnames=("tied", "want_logits"))
        self._decode_fn = jax.jit(self._fwd_decode, donate_argnums=(1,),
                                  static_argnames=("tied", "want_logits"))

    # ---- params -------------------------------------------------------------

    def init_params(self, seed: int) -> dict:
        """Random head init (dummy load format; pure numpy — no eager
        device RNG on the remote-compile path)."""
        c = self.config
        rng = np.random.default_rng(seed)
        D, H = c.head_dim, c.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale,
                self.dtype)

        extra = ({"fc3": dense((self.num_feats * H, H))}
                 if self.mode == "eagle3" else {})
        return {
            **extra,
            "fc": dense((2 * H, H)),
            "input_layernorm": jnp.ones((H,), self.dtype),
            "post_attention_layernorm": jnp.ones((H,), self.dtype),
            "norm": jnp.ones((H,), self.dtype),
            "q_proj": dense((H, c.num_attention_heads * D)),
            "k_proj": dense((H, c.num_key_value_heads * D)),
            "v_proj": dense((H, c.num_key_value_heads * D)),
            "o_proj": dense((c.num_attention_heads * D, H)),
            "gate_up": dense((H, 2 * c.intermediate_size)),
            "down": dense((c.intermediate_size, H)),
        }

    def _load(self, weights) -> dict:
        """Map an EAGLE head checkpoint (HF layout: ``fc.weight``,
        ``layers.0.self_attn...`` — e.g. yuhuili/EAGLE-* repos) onto the
        params dict; embed/lm_head stay shared with the target."""
        params = self.init_params(0)
        H = self.config.hidden_size
        gate = up = None
        for name, w in weights:
            # eagle3 checkpoints name their single layer "midlayer".
            name = name.removeprefix("model.").replace("midlayer.",
                                                       "layers.0.")
            if name == "fc.weight":
                # Width disambiguates: [H, 2H] = emb‖feat fuse, [H, kH] =
                # eagle3 multi-level feature fuse.
                if w.shape[1] == self.num_feats * H and self.num_feats > 1:
                    params["fc3"] = jnp.asarray(w.T, self.dtype)
                else:
                    params["fc"] = jnp.asarray(w.T, self.dtype)
            elif name.endswith("input_layernorm.weight"):
                params["input_layernorm"] = jnp.asarray(w, self.dtype)
            elif name.endswith("post_attention_layernorm.weight"):
                params["post_attention_layernorm"] = jnp.asarray(
                    w, self.dtype)
            elif name == "norm.weight":
                params["norm"] = jnp.asarray(w, self.dtype)
            elif "self_attn" in name:
                for p in ("q_proj", "k_proj", "v_proj", "o_proj"):
                    if f"{p}.weight" in name:
                        params[p] = jnp.asarray(w.T, self.dtype)
            elif "mlp.gate_proj.weight" in name:
                gate = w
            elif "mlp.up_proj.weight" in name:
                up = w
            elif "mlp.down_proj.weight" in name:
                params["down"] = jnp.asarray(w.T, self.dtype)
        if gate is not None and up is not None:
            params["gate_up"] = jnp.asarray(
                np.concatenate([gate, up], axis=0).T, self.dtype)
        return params

    # ---- forward ------------------------------------------------------------

    def _layer(self, p, x, positions, kv_cache, slots, seq_len, blocks, n):
        c = self.config
        D = self.head_dim
        B = x.shape[0]
        h = rms_norm(x, p["input_layernorm"], c.rms_norm_eps)
        q = (h @ p["q_proj"]).reshape(B, c.num_attention_heads, D)
        k = (h @ p["k_proj"]).reshape(B, c.num_key_value_heads, D)
        v = (h @ p["v_proj"]).reshape(B, c.num_key_value_heads, D)
        q, k = apply_rope(q, k, positions, self.cos_sin)
        kv_cache = write_kv(kv_cache, k, v, slots)
        qsl = jnp.stack([jnp.zeros((), jnp.int32), n]).astype(jnp.int32)
        out = ragged_paged_attention(
            q, kv_cache, blocks[None], qsl, seq_len[None], scale=self.scale)
        x = x + out.reshape(B, -1) @ p["o_proj"]
        h = rms_norm(x, p["post_attention_layernorm"], c.rms_norm_eps)
        x = x + silu_and_mul(h @ p["gate_up"]) @ p["down"]
        return x, kv_cache

    def _head(self, p, tokens, feats, positions, kv_cache, slots, seq_len,
              blocks, n, last_idx, embed_w, lm_w, tied, sample_args=None,
              want_logits=False):
        emb = embed_w[tokens].astype(self.dtype)
        if feats.shape[-1] != emb.shape[-1]:
            # EAGLE-3 multi-level features: fuse [num_feats*H] → [H].
            feats = feats.astype(self.dtype) @ p["fc3"]
        x = jnp.concatenate([emb, feats.astype(self.dtype)], axis=-1) \
            @ p["fc"]
        x, kv_cache = self._layer(p, x, positions, kv_cache, slots,
                                  seq_len, blocks, n)
        feat_out = x[last_idx]
        hidden = rms_norm(feat_out, p["norm"], self.config.rms_norm_eps)
        kernel = embed_w.T if tied else lm_w
        logits = (hidden @ kernel).astype(jnp.float32)
        return self._emit(logits, feat_out, kv_cache, sample_args,
                          want_logits)

    def _emit(self, logits, feat_out, kv_cache, sample_args,
              want_logits=False):
        """Greedy argmax by default; sampled (token + proposal q) when the
        request decodes at temperature > 0 — the runner verifies sampled
        drafts with the general-q stochastic rejection sampler. With
        ``want_logits`` (multi-candidate mode) the first slot carries the
        full [V] logits row instead — branching/sampling happens host-side
        in propose_chains."""
        if want_logits:
            return logits, None, feat_out, kv_cache
        if sample_args is None:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return tok, None, feat_out, kv_cache
        tok, q = sample_draft_token(logits, *sample_args)
        return tok, q, feat_out, kv_cache

    def _fwd_ingest(self, p, kv_cache, hidden_src, feat_offset, tokens,
                    positions, slots, seq_len, blocks, n, last_idx,
                    embed_w, lm_w, tied=False, sample_args=None,
                    want_logits=False):
        B = tokens.shape[0]
        H = hidden_src.shape[-1]
        padded = jnp.concatenate(
            [hidden_src, jnp.zeros((B, H), hidden_src.dtype)])
        feats = jax.lax.dynamic_slice_in_dim(padded, feat_offset, B)
        return self._head(p, tokens, feats, positions, kv_cache, slots,
                          seq_len, blocks, n, last_idx, embed_w, lm_w, tied,
                          sample_args, want_logits)

    def _fwd_decode(self, p, kv_cache, feat, tokens, positions, slots,
                    seq_len, blocks, n, last_idx, embed_w, lm_w,
                    tied=False, sample_args=None, want_logits=False):
        B = tokens.shape[0]
        feats = jnp.zeros((B, feat.shape[-1]), feat.dtype).at[0].set(feat)
        return self._head(p, tokens, feats, positions, kv_cache, slots,
                          seq_len, blocks, n, last_idx, embed_w, lm_w, tied,
                          sample_args, want_logits)

    # ---- request lifecycle ---------------------------------------------------

    def free(self, rid: str) -> None:
        st = self._reqs.pop(rid, None)
        if st:
            self._free_blocks.extend(reversed(st["blocks"]))
        self.last_q.pop(rid, None)

    def _state(self, rid: str) -> dict:
        if rid not in self._reqs:
            self._reqs[rid] = {"processed": 0, "blocks": []}
        return self._reqs[rid]

    def _ensure_blocks(self, st: dict, num_tokens: int) -> bool:
        need = -(-num_tokens // self.block_size)
        while len(st["blocks"]) < need:
            if not self._free_blocks:
                return False
            st["blocks"].append(self._free_blocks.pop())
        return True

    def _slots(self, st: dict, pos0: int, count: int, bucket: int):
        slots = np.zeros(bucket, np.int32)  # pads → null block
        for i in range(count):
            q = pos0 + i
            slots[i] = (st["blocks"][q // self.block_size] * self.block_size
                        + q % self.block_size)
        return slots

    # ---- ingest + propose ----------------------------------------------------

    def ingest_and_propose(
        self,
        rid: str,
        hidden: jax.Array,        # [T, H] full-step target hidden (device)
        row_t0: int,              # token-slice offset of this request's chunk
        chunk_start: int,         # global position of the chunk's 1st token
        accepted_end: int,        # computed tokens after this step's update
        token_ids: np.ndarray,    # target token ids [>= accepted_end + 1]
        want_drafts: bool,
        room: int,
        embed_w,                  # target embedding [V, H] (device, shared)
        lm_w,                     # target lm_head kernel or None if tied
        sampling=None,            # (temperature, top_k, top_p, min_p, seed)
    ) -> List[int]:
        """Ingest pairs for target positions [cursor, accepted_end) from the
        step's hidden states, then (optionally) decode up to k drafts —
        greedy argmax at temperature 0, sampled from the head's own
        filtered distribution otherwise (q recorded in ``last_q`` for the
        general-q rejection verifier; reference default for MTP)."""
        st = self._state(rid)
        cursor = st["processed"]
        if cursor < chunk_start:
            # Prefix-cache hit skipped earlier positions: their features
            # were never computed. Start from what we have — quality-only.
            cursor = chunk_start
        n_pairs = accepted_end - cursor
        if n_pairs <= 0 and not want_drafts:
            return []
        if not self._ensure_blocks(
                st, min(accepted_end + self.k, self.config.max_model_len)):
            return []
        tied = bool(self.config.tie_word_embeddings)
        lm_arg = embed_w if lm_w is None else lm_w
        sampled_mode = bool(sampling is not None and sampling[0] > 0.0)
        self.last_q.pop(rid, None)
        qs: List[np.ndarray] = []

        def sargs(draw):
            if not sampled_mode:
                return None
            t, tk, tp, mp, seed = sampling
            return (jnp.asarray(t, jnp.float32), jnp.asarray(tk, jnp.int32),
                    jnp.asarray(tp, jnp.float32), jnp.asarray(mp, jnp.float32),
                    jnp.asarray(seed, jnp.uint32),
                    jnp.asarray(accepted_end * 131 + draw, jnp.int32))

        chains_mode = self.n_chains > 1
        feat = None
        tok = -1
        if n_pairs > 0:
            B = _bucket(n_pairs)
            tokens = np.zeros(B, np.int32)
            tokens[:n_pairs] = token_ids[cursor + 1:accepted_end + 1]
            positions = np.zeros(B, np.int32)
            positions[:n_pairs] = np.arange(cursor, accepted_end)
            slots = self._slots(st, cursor, n_pairs, B)
            tok, q, feat, self.kv_cache = self._ingest_fn(
                self.params, self.kv_cache, hidden,
                jnp.asarray(row_t0 + (cursor - chunk_start), jnp.int32),
                jnp.asarray(tokens),
                jnp.asarray(positions), jnp.asarray(slots),
                jnp.asarray(accepted_end, jnp.int32),
                jnp.asarray(self._pad_blocks(st), jnp.int32),
                jnp.asarray(n_pairs, jnp.int32),
                n_pairs - 1, embed_w, lm_arg, tied=tied,
                sample_args=None if chains_mode else sargs(0),
                want_logits=chains_mode)
            if q is not None:
                qs.append(np.asarray(q))
            st["processed"] = accepted_end
        if not want_drafts or n_pairs <= 0:
            return []
        if chains_mode:
            # Multi-candidate branch: `tok` carries the [V] logits row.
            return self._propose_chains(
                rid, st, np.asarray(tok), feat, accepted_end, room,
                embed_w, lm_arg, tied, sampling)

        drafts = [int(tok)]
        B = 8
        for j in range(1, min(self.k, max(room, 1))):
            p = accepted_end + j - 1
            if p + 2 >= self.config.max_model_len:
                break
            if not self._ensure_blocks(st, p + 1):
                break
            tokens = np.zeros(B, np.int32)
            tokens[0] = drafts[-1]
            positions = np.zeros(B, np.int32)
            positions[0] = p
            slots = self._slots(st, p, 1, B)
            tok, q, feat, self.kv_cache = self._decode_fn(
                self.params, self.kv_cache, feat, jnp.asarray(tokens),
                jnp.asarray(positions), jnp.asarray(slots),
                jnp.asarray(p + 1, jnp.int32),
                jnp.asarray(self._pad_blocks(st), jnp.int32),
                jnp.asarray(1, jnp.int32), 0, embed_w, lm_arg, tied=tied,
                sample_args=sargs(j))
            if q is not None:
                qs.append(np.asarray(q))
            drafts.append(int(tok))
        drafts = drafts[:room]
        if sampled_mode and qs:
            self.last_q[rid] = np.stack(qs[:len(drafts)])
        return drafts

    def _pad_blocks(self, st: dict) -> List[int]:
        return st["blocks"] + [0] * (self._max_blocks - len(st["blocks"]))

    # ---- multi-candidate (tree) proposal ------------------------------------

    def _host_sample(self, logits: np.ndarray, sampling, draw: int):
        """Numpy replica of sample_draft_token's filtering (temperature /
        top-k / top-p / min-p) with deterministic per-(seed, draw) gumbel —
        used in multi-candidate mode where branching happens host-side on
        the returned logits row. Returns (token, q [V] f32)."""
        t, tk, tp, mp, seed = sampling
        scaled = logits.astype(np.float64) / max(t, 1e-6)
        scaled -= scaled.max()
        probs = np.exp(scaled)
        probs /= probs.sum()
        order = np.argsort(-probs, kind="stable")
        ps = probs[order]
        cum = np.cumsum(ps)
        V = len(probs)
        kk = V if tk <= 0 else tk
        keep_sorted = (np.arange(V) < kk) & ((cum - ps) < tp) & \
            (ps >= mp * ps[0])
        keep = np.zeros(V, bool)
        keep[order] = keep_sorted
        q = np.where(keep, probs, 0.0)
        q = q / q.sum()
        rng = np.random.default_rng([int(seed), 3, int(draw)])
        g = rng.gumbel(size=V)
        tok = int(np.argmax(np.where(
            keep, np.log(np.maximum(q, 1e-30)) + g, -np.inf)))
        return tok, q.astype(np.float32)

    def _copy_head_block(self, src: int, dst: int) -> None:
        """Copy one head-cache block (chain-private straddling-block copy;
        only positions < accepted_end are ever read from it — later slots
        are overwritten by the chain's own decode writes)."""
        if self._copy_block_fn is None:
            def _cp(kv, s_, d_):
                def go(leaf):
                    if hasattr(leaf, "ndim") and leaf.ndim >= 3 and \
                            leaf.shape[0] == 2:
                        return leaf.at[:, d_].set(leaf[:, s_])
                    return leaf
                return jax.tree.map(go, kv)
            self._copy_block_fn = jax.jit(_cp, donate_argnums=(0,))
        self.kv_cache = self._copy_block_fn(
            self.kv_cache, jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32))

    def _propose_chains(self, rid, st, root_logits, feat, accepted_end,
                        room, embed_w, lm_arg, tied, sampling):
        """Root-branched candidate chains (reference capability:
        speculative_token_tree / propose_tree, llm_base_proposer.py:282):
        n_chains roots from the post-ingest logits — top-n at temperature
        0, independent filtered samples otherwise — each continued to
        depth k with the head's autoregressive decode. Chain 0 writes its
        draft KV into the canonical head blocks (rolled back by cursor on
        the next ingest, as in single-chain); later chains write into
        private scratch blocks of the head cache so their positions don't
        collide."""
        k = min(self.k, max(room, 1))
        bs = self.block_size
        mm = self.config.max_model_len
        sampled_mode = bool(sampling is not None and sampling[0] > 0.0)
        n = self.n_chains
        self.last_q.pop(rid, None)
        if sampled_mode:
            roots, root_qs = [], []
            for i in range(n):
                t_, q_ = self._host_sample(
                    root_logits, sampling, draw=accepted_end * 131 * 97 + i)
                roots.append(t_)
                root_qs.append(q_)
        else:
            nn = min(n, root_logits.shape[0])
            top = np.argpartition(-root_logits, nn - 1)[:nn]
            roots = [int(x) for x in top[np.argsort(-root_logits[top])]]
            root_qs = [None] * len(roots)
        b0 = accepted_end // bs
        span_last = accepted_end + max(k - 2, 0)
        n_priv = span_last // bs - b0 + 1
        chains: List[List[int]] = []
        chain_qs: List[Optional[np.ndarray]] = []
        for i, root in enumerate(roots):
            priv = None
            if i > 0 and k >= 2:
                if len(self._free_blocks) < n_priv:
                    break
                priv = [self._free_blocks.pop() for _ in range(n_priv)]
                if len(st["blocks"]) > b0:
                    self._copy_head_block(st["blocks"][b0], priv[0])
            chain = [int(root)]
            cqs = [root_qs[i]] if sampled_mode else []
            cf = feat
            for j in range(1, k):
                p = accepted_end + j - 1
                if p + 2 >= mm:
                    break
                if i == 0 and not self._ensure_blocks(st, p + 1):
                    break
                blocks_list = self._pad_blocks(st)
                if priv is not None:
                    for j2, pb in enumerate(priv):
                        if b0 + j2 < len(blocks_list):
                            blocks_list[b0 + j2] = pb
                B = 8
                tokens = np.zeros(B, np.int32)
                tokens[0] = chain[-1]
                positions = np.zeros(B, np.int32)
                positions[0] = p
                slots = np.zeros(B, np.int32)
                slots[0] = blocks_list[p // bs] * bs + p % bs
                lg, _, cf, self.kv_cache = self._decode_fn(
                    self.params, self.kv_cache, cf, jnp.asarray(tokens),
                    jnp.asarray(positions), jnp.asarray(slots),
                    jnp.asarray(p + 1, jnp.int32),
                    jnp.asarray(blocks_list, jnp.int32),
                    jnp.asarray(1, jnp.int32), 0, embed_w, lm_arg,
                    tied=tied, sample_args=None, want_logits=True)
                lg = np.asarray(lg)
                if sampled_mode:
                    t_, q_ = self._host_sample(
                        lg, sampling,
                        draw=accepted_end * 131 * 97 + i * 1009 + j)
                    chain.append(t_)
                    cqs.append(q_)
                else:
                    chain.append(int(np.argmax(lg)))
            if priv is not None:
                self._free_blocks.extend(reversed(priv))
            chains.append(chain[:room])
            chain_qs.append(np.stack([q[None] if q.ndim == 0 else q
                                      for q in cqs])[:room]
                            if sampled_mode and cqs else None)
        # Dedup identical chains (sampled roots can coincide).
        seen, uniq, uniq_q = set(), [], []
        for c, q in zip(chains, chain_qs):
            tc = tuple(c)
            if tc and tc not in seen:
                seen.add(tc)
                uniq.append(list(c))
                uniq_q.append(q)
        if sampled_mode and uniq:
            self.last_q[rid] = uniq_q
        return uniq
