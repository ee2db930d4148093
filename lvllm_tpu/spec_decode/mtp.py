"""MTP (multi-token prediction) speculative decoding.

Counterpart of the reference's MTP draft models
(``vllm/model_executor/models/deepseek_mtp.py``
DeepSeekMultiTokenPredictorLayer:64-124; registry
``models/registry.py:572-594`` — DeepSeek-V3/Kimi-class checkpoints ship
their own extra predictor layer at index ``num_hidden_layers``):

    x = eh_proj(concat(enorm(embed(t_{p+1})), hnorm(h_p)))
    x → the checkpoint's own decoder layer (same family as the target —
        MLA + MoE for DeepSeek) → feature
    logits = shared_head.head(shared_head.norm(feature))

TPU-native design: the decoder block is the *family model's*
``apply_layer`` over a one-layer config — MLA absorption, MoE routing,
quantized experts and the paged-KV layout all come for free — and the
proposer inherits EagleProposer's ragged ingest/cursor machinery (the
driving contract is identical: consume the target's hidden states each
step, emit up to k greedy drafts).
"""

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm
from lvllm_tpu.logger import init_logger
from lvllm_tpu.models.model_base import AttentionMetadata
from lvllm_tpu.spec_decode.eagle import EagleProposer

logger = init_logger(__name__)


class MTPProposer(EagleProposer):
    """Checkpoint-native MTP layer as the draft head."""

    def __init__(self, target_config: ModelConfig, k: int,
                 block_size: int = 16, num_blocks: int = 512,
                 weights=None, seed: int = 0):
        from lvllm_tpu.models.registry import build_model

        self.mtp_config = dataclasses.replace(
            target_config, num_hidden_layers=1, mlp_only_layers=(),
            decoder_sparse_step=1, layer_types=None)
        self.model = build_model(self.mtp_config)
        super().__init__(target_config, k, block_size=block_size,
                         num_blocks=num_blocks, weights=weights, seed=seed,
                         mode="mtp")
        # Family-native single-layer cache (MLA latent layout for
        # DeepSeek) replaces Eagle's MHA cache.
        self.kv_cache = self.model.make_layer_cache(
            0, num_blocks, block_size, self.dtype, max_reqs=1)

    # ---- params -------------------------------------------------------------

    def init_params(self, seed: int) -> dict:
        c = self.config
        rng = np.random.default_rng(seed)
        H = c.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale,
                self.dtype)

        layer = self.model.init_params(seed)["layers"][0]
        return {
            "layer": layer,
            "enorm": jnp.ones((H,), self.dtype),
            "hnorm": jnp.ones((H,), self.dtype),
            "eh_proj": dense((2 * H, H)),
            "shared_norm": jnp.ones((H,), self.dtype),
        }

    def _load(self, weights) -> dict:
        """Map the checkpoint's spec layer (index == target
        num_hidden_layers; reference deepseek_v2.py
        get_spec_layer_idx_from_weight_name) onto the params dict."""
        L = self.config.num_hidden_layers
        prefix = f"layers.{L}."
        extra: Dict[str, jax.Array] = {}
        own_head = {}
        block_stream = []
        for name, w in weights:
            name = name.removeprefix("model.")
            if not name.startswith(prefix):
                continue
            rest = name[len(prefix):]
            if rest == "enorm.weight":
                extra["enorm"] = jnp.asarray(w, self.dtype)
            elif rest == "hnorm.weight":
                extra["hnorm"] = jnp.asarray(w, self.dtype)
            elif rest == "eh_proj.weight":
                extra["eh_proj"] = jnp.asarray(
                    np.ascontiguousarray(w.T), self.dtype)
            elif rest == "shared_head.norm.weight":
                extra["shared_norm"] = jnp.asarray(w, self.dtype)
            elif rest == "shared_head.head.weight":
                own_head["head"] = jnp.asarray(
                    np.ascontiguousarray(w.T), self.dtype)
            elif rest == "embed_tokens.weight":
                pass  # shared with the target at call time
            else:
                block_stream.append(("layers.0." + rest, w))
        family = self.model.load_weights(iter(block_stream))
        params = self.init_params(0)
        params["layer"] = family["layers"][0]
        params.update(extra)
        params.update(own_head)
        missing = [k for k in ("enorm", "hnorm", "eh_proj", "shared_norm")
                   if k not in extra]
        if missing:
            logger.warning("MTP checkpoint missing %s (dummy init kept)",
                           missing)
        return params

    # ---- forward ------------------------------------------------------------

    def _head(self, p, tokens, feats, positions, kv_cache, slots, seq_len,
              blocks, n, last_idx, embed_w, lm_w, tied, sample_args=None,
              want_logits=False):
        c = self.config
        emb = embed_w[tokens].astype(self.dtype)
        # Position 0 has no previous token context (deepseek_mtp.py:110).
        emb = jnp.where(positions[:, None] == 0, 0.0, emb)
        e = rms_norm(emb, p["enorm"], c.rms_norm_eps)
        hf = rms_norm(feats.astype(self.dtype), p["hnorm"], c.rms_norm_eps)
        x = jnp.concatenate([e, hf], axis=-1) @ p["eh_proj"]
        md = AttentionMetadata(
            query_start_loc=jnp.stack(
                [jnp.zeros((), jnp.int32), n]).astype(jnp.int32),
            seq_lens=seq_len[None],
            block_table=blocks[None],
            slot_mapping=slots)
        x_out, residual, kv_cache = self.model.apply_layer(
            p["layer"], x, jnp.zeros_like(x), positions, kv_cache, md, 0)
        feat_out = (x_out + residual)[last_idx]
        hidden = rms_norm(feat_out, p["shared_norm"], c.rms_norm_eps)
        if "head" in p:
            kernel = p["head"]
        else:
            kernel = embed_w.T if tied else lm_w
        logits = (hidden @ kernel).astype(jnp.float32)
        tok, q, feat_out, kv_cache = self._emit(logits, feat_out, kv_cache,
                                                sample_args, want_logits)
        return tok, q, feat_out, kv_cache
