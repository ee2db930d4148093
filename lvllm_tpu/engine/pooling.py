"""Pooling / embedding execution.

Counterpart of the reference's pooling stack (``layers/pooler/``,
``v1/pool/``, LLM.encode/embed, /v1/embeddings): prompts run a prefill-only
forward; hidden states are pooled (last-token or mean) into embedding
vectors. Runs as its own jitted call with a throwaway KV cache — embedding
batches don't interact with the generation scheduler.
"""

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.models.model_base import AttentionMetadata
from lvllm_tpu.ops.kv_cache import new_kv_cache


class PoolingRunner:

    def __init__(self, model, params, block_size: int = 16,
                 max_tokens: int = 2048):
        self.model = model
        self.params = params
        self.block_size = block_size
        self.max_tokens = max_tokens
        self._fwd = jax.jit(self._forward, static_argnames=("pooling",))

    def _forward(self, params, input_ids, positions, qsl, seq_lens,
                 block_table, slot_mapping, kv_caches, row_valid,
                 pooling: str, mm_embeds=None, mm_mask=None):
        md = AttentionMetadata(
            query_start_loc=qsl, seq_lens=seq_lens,
            block_table=block_table, slot_mapping=slot_mapping,
            # Bidirectional decoder embeds (LlamaBidirectional / Voyage)
            # ride the prefix-LM mask with the whole prompt as prefix.
            prefix_lens=(seq_lens
                         if getattr(self.model, "bidirectional", False)
                         else None))
        if mm_embeds is not None:
            hidden, _ = self.model(params, input_ids, positions, kv_caches,
                                   md, mm_embeds=mm_embeds,
                                   mm_mask=mm_mask)
        else:
            hidden, _ = self.model(params, input_ids, positions, kv_caches,
                                   md)
        R = seq_lens.shape[0]
        T = input_ids.shape[0]
        if hasattr(self.model, "pool_hidden"):
            # Model-defined pooling (SPLADE sparse vocab-max): returns
            # [R, D]; the model decides whether to L2-normalize.
            emb = self.model.pool_hidden(params, hidden, input_ids, qsl,
                                         seq_lens).astype(jnp.float32)
            if getattr(self.model, "pool_normalize", True):
                norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
                emb = emb / jnp.maximum(norm, 1e-12)
            return jnp.where(row_valid[:, None], emb, 0.0)
        if pooling == "token":
            # Late-interaction (ColBERT): per-token projected embeddings
            # [T, dim], L2-normalized per token; split by qsl on host.
            tok = self.model.token_project(params, hidden).astype(
                jnp.float32)
            norm = jnp.linalg.norm(tok, axis=-1, keepdims=True)
            return tok / jnp.maximum(norm, 1e-12)
        if pooling == "cls":
            # Encoder-family CLS pooling: first token of each segment.
            emb = hidden[qsl[:-1]]                            # [R, H]
        elif pooling == "last":
            last_idx = jnp.maximum(qsl[1:] - 1, 0)
            emb = hidden[last_idx]                            # [R, H]
        else:  # mean over each segment
            tok = jnp.arange(T)
            req = jnp.searchsorted(qsl, tok, side="right") - 1
            req = jnp.clip(req, 0, R - 1)
            in_seg = (tok >= qsl[req]) & (tok < qsl[req + 1])
            one_hot = (req[:, None] == jnp.arange(R)[None, :]) & \
                in_seg[:, None]
            sums = jnp.einsum("th,tr->rh", hidden.astype(jnp.float32),
                              one_hot.astype(jnp.float32))
            counts = jnp.maximum(one_hot.sum(0), 1)[:, None]
            emb = sums / counts
        if hasattr(self.model, "project_pooled"):
            # Dual-encoder projections (CLIP text_projection / SigLIP
            # text head) apply after pooling, before normalization.
            emb = self.model.project_pooled(params, emb)
        emb = emb.astype(jnp.float32)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return jnp.where(row_valid[:, None], emb / jnp.maximum(norm, 1e-12),
                         0.0)

    def _forward_classify(self, params, input_ids, positions, qsl,
                          seq_lens, block_table, slot_mapping, kv_caches):
        md = AttentionMetadata(
            query_start_loc=qsl, seq_lens=seq_lens,
            block_table=block_table, slot_mapping=slot_mapping,
            prefix_lens=(seq_lens
                         if getattr(self.model, "bidirectional", False)
                         else None))
        hidden, _ = self.model(params, input_ids, positions, kv_caches, md)
        return self.model.classify(params, hidden, qsl)

    def classify(self, token_lists: List[List[int]]) -> List[np.ndarray]:
        """Cross-encoder classification (score/rerank models): returns a
        [num_labels] logit vector per input (sequence-level heads) or a
        [len, num_labels] matrix (token-level heads)."""
        if not hasattr(self, "_fwd_cls"):
            self._fwd_cls = jax.jit(self._forward_classify)
        results: List[np.ndarray] = []
        # Greedy token-budget batching (same as embed): a fixed prompt
        # count lets 16 long query+doc pairs blow up T_pad — each new
        # bucket is a fresh 20-60s remote compile over the tunnel
        # (ADVICE r04).
        batches: List[List[List[int]]] = []
        cur: List[List[int]] = []
        total = 0
        for toks in token_lists:
            if cur and total + len(toks) > self.max_tokens:
                batches.append(cur)
                cur, total = [], 0
            cur.append(toks)
            total += len(toks)
        if cur:
            batches.append(cur)
        for batch in batches:
            args = self._batch_args(batch)
            logits = np.asarray(self._fwd_cls(self.params, *args))
            qsl = np.cumsum([0] + [len(t) for t in batch])
            for r, toks in enumerate(batch):
                if getattr(self.model, "token_level", False):
                    results.append(logits[qsl[r]:qsl[r] + len(toks)])
                else:
                    results.append(logits[r])
        return results

    def embed(self, token_lists: List[List[int]],
              pooling: str = "auto", normalize: bool = True) -> np.ndarray:
        """Returns [N, H] float32 (L2-normalized). pooling="auto" follows
        the model family's convention (CLS for encoder-only BERT-style
        models, last-token for causal LMs)."""
        if pooling == "auto":
            pooling = getattr(self.model, "default_pooling", "last")
        mc = self.model.config
        out = []
        # Batch prompts greedily under the token budget.
        batch: List[List[int]] = []
        total = 0
        for toks in token_lists + [None]:
            flush = toks is None or (total + len(toks) > self.max_tokens
                                     and batch)
            if flush and batch:
                out.append(self._embed_batch(batch, pooling))
                batch, total = [], 0
            if toks is not None:
                batch.append(toks)
                total += len(toks)
        return np.concatenate(out) if out else np.zeros((0, mc.hidden_size),
                                                        np.float32)

    def embed_token_level(self, token_lists: List[List[int]],
                          mm_data: Optional[List[Optional[dict]]] = None
                          ) -> List[np.ndarray]:
        """Late-interaction embeddings (reference: token_embed pooling
        task, layers/pooler/tokwise.py): one [len_i, dim] matrix of
        L2-normalized per-token vectors per prompt. MaxSim scoring is the
        caller's job. ``mm_data[i]`` optionally carries the prompt's
        multimodal inputs (ColPali/ColQwen document images): features are
        spliced at the image-token rows and M-RoPE positions come from
        the model's mm_positions hook when it has one."""
        mm_data = mm_data or [None] * len(token_lists)
        out: List[np.ndarray] = []
        batch: List[List[int]] = []
        mm_batch: List[Optional[dict]] = []
        total = 0
        for toks, mm in list(zip(token_lists, mm_data)) + [(None, None)]:
            flush = toks is None or (total + len(toks) > self.max_tokens
                                     and batch)
            if flush and batch:
                out.extend(self._token_embed_batch(batch, mm_batch))
                batch, mm_batch, total = [], [], 0
            if toks is not None:
                batch.append(toks)
                mm_batch.append(mm)
                total += len(toks)
        return out

    def _token_embed_batch(self, batch, mm_batch):
        args = self._batch_args(batch)
        row_valid = np.ones(len(batch), bool)
        mm_embeds = mm_mask = None
        T_pad = int(args[0].shape[0])
        use_mrope = hasattr(self.model, "mm_positions")
        any_mm = any(mm is not None for mm in mm_batch)
        if any_mm:
            H = self.model.config.hidden_size
            embeds = np.zeros((T_pad, H), np.float32)
            mask = np.zeros((T_pad,), bool)
            img_id = self.model.config.image_token_id
            start = 0
            for toks, mm in zip(batch, mm_batch):
                ids = np.asarray(toks)
                if mm is not None:
                    if hasattr(self.model, "encode_mm"):
                        feats = np.asarray(
                            self.model.encode_mm(self.params, mm))
                    else:
                        feats = np.asarray(self.model.encode_images(
                            self.params,
                            jnp.asarray(mm["pixel_values"])))
                    feats = feats.reshape(-1, feats.shape[-1])
                    rows = np.nonzero(ids == img_id)[0]
                    n = min(len(rows), feats.shape[0])
                    embeds[start + rows[:n]] = feats[:n]
                    mask[start + rows[:n]] = True
                start += len(toks)
            mm_embeds = jnp.asarray(embeds)
            mm_mask = jnp.asarray(mask)
        if use_mrope:
            # M-RoPE models need [3, T] positions even for pure text.
            pos_rows = []
            for toks, mm in zip(batch, mm_batch):
                p, _ = self.model.mm_positions(np.asarray(toks), mm or {
                    "image_grid_thw": np.zeros((0, 3), np.int64)})
                pos_rows.append(np.asarray(p))
            pos = np.zeros((pos_rows[0].shape[0], T_pad), np.int32)
            s = 0
            for p in pos_rows:
                pos[:, s:s + p.shape[-1]] = p
                s += p.shape[-1]
            args = (args[0], jnp.asarray(pos)) + args[2:]
        tok = np.asarray(self._fwd(self.params, *args,
                                   jnp.asarray(row_valid),
                                   pooling="token", mm_embeds=mm_embeds,
                                   mm_mask=mm_mask))
        res = []
        start = 0
        for t in batch:
            res.append(tok[start:start + len(t)])
            start += len(t)
        return res

    def _batch_args(self, batch: List[List[int]]):
        """Flatten a prompt batch into the device forward args
        (input_ids, positions, qsl, seq_lens, block_table, slot_mapping,
        kv_caches)."""
        mc = self.model.config
        bs = self.block_size
        R = len(batch)
        T = sum(len(t) for t in batch)
        # Pad T to a multiple of 64 for stable compile shapes.
        T_pad = -(-T // 64) * 64
        maxb = max(-(-len(t) // bs) for t in batch)
        input_ids = np.zeros(T_pad, np.int32)
        positions = np.zeros(T_pad, np.int32)
        slot_mapping = np.zeros(T_pad, np.int32)
        qsl = np.zeros(R + 1, np.int32)
        seq_lens = np.zeros(R, np.int32)
        table = np.zeros((R, maxb), np.int32)
        t = 0
        next_block = 1
        for r, toks in enumerate(batch):
            n = len(toks)
            input_ids[t:t + n] = toks
            positions[t:t + n] = np.arange(n)
            nb = -(-n // bs)
            table[r, :nb] = np.arange(next_block, next_block + nb)
            pos = np.arange(n)
            slot_mapping[t:t + n] = \
                table[r, pos // bs] * bs + pos % bs
            next_block += nb
            qsl[r + 1] = t + n
            seq_lens[r] = n
            t += n
        qsl[R] = t
        num_blocks = next_block + 1
        dt = jnp.bfloat16 if mc.dtype == "bfloat16" else jnp.float32
        if hasattr(self.model, "make_layer_cache"):
            # Hybrid backbones (Jamba classifiers etc.) carry per-layer
            # cache structures (recurrent state dicts) the model builds.
            kv = [self.model.make_layer_cache(i, num_blocks, bs, dt,
                                              max_reqs=R)
                  for i in range(mc.num_hidden_layers)]
        else:
            kv = [new_kv_cache(num_blocks, bs, mc.kv_cache_heads,
                               mc.kv_cache_dim, dt)
                  for _ in range(mc.num_hidden_layers)]
        return (jnp.asarray(input_ids), jnp.asarray(positions),
                jnp.asarray(qsl), jnp.asarray(seq_lens),
                jnp.asarray(table), jnp.asarray(slot_mapping), kv)

    def _embed_batch(self, batch: List[List[int]], pooling: str):
        args = self._batch_args(batch)
        row_valid = np.ones(len(batch), bool)
        emb = self._fwd(self.params, *args, jnp.asarray(row_valid),
                        pooling=pooling)
        return np.asarray(emb)
