"""Qwen3-Next: hybrid linear-attention (Gated DeltaNet) + gated full
attention + MoE with gated shared expert.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
qwen3_next.py`` (hybrid GDN layers via the mamba/GDN attention backends);
HF numerics reference: transformers ``modeling_qwen3_next``. This is the
family behind the reference fork's headline benchmark
(Qwen3-Next-80B-A3B, BASELINE.md).

Layer schedule comes from ``config.layer_types``; linear-attention layers
keep per-request recurrent state (conv window + delta-rule memory,
``ops/gdn.py``) instead of paged KV; full-attention layers add an output
sigmoid gate and partial rotary (0.25).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.ops.gdn import (causal_conv1d_decode, causal_conv1d_ragged,
                               causal_conv1d_single,
                               gated_delta_rule_chunked,
                               gated_delta_rule_decode,
                               gated_delta_rule_ragged,
                               l2norm)
from lvllm_tpu.ops.attention import _token_request_map
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class Qwen3NextModel(Qwen3Model):

    dcp_compatible = False  # hybrid GDN state caches are not paged-sharded

    def __init__(self, config: ModelConfig):
        config.attn_output_gate = True
        super().__init__(config)

    # ---- cache layout ------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        c = self.config
        if c.layer_type(layer_idx) == "linear_attention":
            from lvllm_tpu.core.kv_cache_spec import LinearAttentionSpec
            conv_dim = (2 * c.linear_num_key_heads * c.linear_key_head_dim +
                        c.linear_num_value_heads * c.linear_value_head_dim)
            return LinearAttentionSpec(
                conv_dim=conv_dim, conv_width=c.linear_conv_kernel_dim,
                num_v_heads=c.linear_num_value_heads,
                k_head_dim=c.linear_key_head_dim,
                v_head_dim=c.linear_value_head_dim)
        return super().kv_cache_spec(layer_idx, kv_dtype)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        nprng = np.random.default_rng(777 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        Hk, Hv = c.linear_num_key_heads, c.linear_num_value_heads
        dk, dv = c.linear_key_head_dim, c.linear_value_head_dim
        conv_dim = 2 * Hk * dk + Hv * dv
        for i, layer in enumerate(params["layers"]):
            if c.layer_type(i) == "linear_attention":
                layer["self_attn"] = {
                    "in_proj_qkvz": {"kernel": dense(
                        (c.hidden_size, 2 * Hk * dk + 2 * Hv * dv))},
                    "in_proj_ba": {"kernel": dense((c.hidden_size, 2 * Hv))},
                    "conv_weight": dense((conv_dim,
                                          c.linear_conv_kernel_dim)),
                    "dt_bias": jnp.ones((Hv,), jnp.float32),
                    "a_log": jnp.asarray(
                        np.log(nprng.uniform(0.5, 8, Hv)), jnp.float32),
                    "norm": {"weight": jnp.ones((dv,), self.dtype)},
                    "out_proj": {"kernel": dense(
                        (Hv * dv, c.hidden_size))},
                }
            else:
                # Full attention with output gate: q_proj is double width.
                D = self.head_dim
                layer["self_attn"]["q_proj"]["kernel"] = dense(
                    (c.hidden_size, c.num_attention_heads * D * 2))
            if "moe" in layer and c.num_shared_experts:
                layer["moe"]["shared_gate"] = dense((c.hidden_size, 1))
        return params

    # ---- layers ------------------------------------------------------------

    def _attention(self, lp, x, positions, kv_cache, md, lora=None,
                   token_adapter=None, layer_idx: int = 0):
        c = self.config
        if "in_proj_qkvz" in lp["self_attn"]:
            return self._linear_attention(lp, x, positions, kv_cache, md)
        return self._gated_full_attention(lp, x, positions, kv_cache, md)

    def _gated_full_attention(self, lp, x, positions, kv_cache, md):
        from lvllm_tpu.ops.attention import ragged_paged_attention
        from lvllm_tpu.ops.kv_cache import write_kv
        from lvllm_tpu.ops.rope import apply_rope

        c = self.config
        D = self.head_dim
        T = x.shape[0]
        attn = lp["self_attn"]
        qg = (x @ attn["q_proj"]["kernel"]).reshape(
            T, c.num_attention_heads, 2 * D)
        q, gate = qg[..., :D], qg[..., D:]
        gate = gate.reshape(T, c.num_attention_heads * D)
        k = (x @ attn["k_proj"]["kernel"]).reshape(
            T, c.num_key_value_heads, D)
        v = (x @ attn["v_proj"]["kernel"]).reshape(
            T, c.num_key_value_heads, D)
        if c.qk_norm:
            q = rms_norm(q, attn["q_norm"]["weight"], c.rms_norm_eps)
            k = rms_norm(k, attn["k_norm"]["weight"], c.rms_norm_eps)
        q, k = apply_rope(q, k, positions, self.cos_sin)
        kv_cache = write_kv(kv_cache, k, v, md.slot_mapping)
        out = ragged_paged_attention(
            q, kv_cache, md.block_table, md.query_start_loc, md.seq_lens,
            scale=self.scale, sliding_window=c.sliding_window)
        out = out.reshape(T, c.num_attention_heads * D)
        out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
        return out @ attn["o_proj"]["kernel"], kv_cache

    def _linear_attention(self, lp, x, positions, state, md):
        c = self.config
        T = x.shape[0]
        Hk, Hv = c.linear_num_key_heads, c.linear_num_value_heads
        dk, dv = c.linear_key_head_dim, c.linear_value_head_dim
        G = Hv // Hk
        attn = lp["self_attn"]

        qkvz = x @ attn["in_proj_qkvz"]["kernel"]
        ba = x @ attn["in_proj_ba"]["kernel"]
        # HF interleaved-by-key-head layout (fix_query_key_value_ordering).
        qkvz = qkvz.reshape(T, Hk, 2 * dk + 2 * G * dv)
        q = qkvz[..., :dk]
        k = qkvz[..., dk:2 * dk]
        v = qkvz[..., 2 * dk:2 * dk + G * dv].reshape(T, Hv, dv)
        z = qkvz[..., 2 * dk + G * dv:].reshape(T, Hv, dv)
        ba = ba.reshape(T, Hk, 2 * G)
        b = ba[..., :G].reshape(T, Hv)
        a = ba[..., G:].reshape(T, Hv)

        # Conv over concatenated (q, k, v) channel layout.
        mixed = jnp.concatenate(
            [q.reshape(T, Hk * dk), k.reshape(T, Hk * dk),
             v.reshape(T, Hv * dv)], axis=-1)

        num_reqs = md.block_table.shape[0]
        req_idx = _token_request_map(md.query_start_loc, T, num_reqs)
        scratch = state["rec"].shape[0] - 1
        token_valid = jnp.arange(T) < md.query_start_loc[num_reqs]
        token_slot = jnp.where(
            token_valid,
            md.row_slots[req_idx] if md.row_slots is not None else req_idx,
            scratch).astype(jnp.int32)
        reset = (positions == 0) & token_valid

        if md.single_seq_prefill:
            # Chunk-parallel fast path (one contiguous request segment):
            # conv via K shifted adds, delta rule via the WY chunk form.
            slot0 = token_slot[0]
            L = md.query_start_loc[1] - md.query_start_loc[0]
            reset0 = reset[0]
            win0 = jnp.where(reset0, 0.0, state["conv"][slot0])
            conv_out, new_win = causal_conv1d_single(
                mixed, win0, attn["conv_weight"].astype(jnp.float32), L)
            conv_state = state["conv"].at[slot0].set(new_win)
        elif md.decode_mode:
            conv_out, conv_state = causal_conv1d_decode(
                mixed, state["conv"], attn["conv_weight"].astype(jnp.float32),
                token_slot, reset)
        else:
            conv_out, conv_state = causal_conv1d_ragged(
                mixed, state["conv"], attn["conv_weight"].astype(jnp.float32),
                token_slot, reset)

        qc = conv_out[:, :Hk * dk].reshape(T, Hk, dk)
        kc = conv_out[:, Hk * dk:2 * Hk * dk].reshape(T, Hk, dk)
        vc = conv_out[:, 2 * Hk * dk:].reshape(T, Hv, dv)
        # GQA expansion of q/k to value heads.
        qc = jnp.repeat(qc, G, axis=1)
        kc = jnp.repeat(kc, G, axis=1)

        beta = jax.nn.sigmoid(b.astype(jnp.float32))
        g = -jnp.exp(attn["a_log"]) * jax.nn.softplus(
            a.astype(jnp.float32) + attn["dt_bias"])

        if md.single_seq_prefill:
            # Neutralize padded tail tokens: β=0 (no update), g=0 (no
            # decay) freezes the state at position L.
            tv = token_valid[:, None]
            s0 = jnp.where(reset0, 0.0, state["rec"][slot0])
            core, s_out = gated_delta_rule_chunked(
                qc, kc, vc, jnp.where(tv, g, 0.0),
                jnp.where(tv, beta, 0.0), s0)
            rec_state = state["rec"].astype(jnp.float32).at[slot0].set(s_out)
        elif md.decode_mode:
            core, rec_state = gated_delta_rule_decode(
                qc, kc, vc, g, beta, state["rec"], token_slot, reset)
        else:
            core, rec_state = gated_delta_rule_ragged(
                qc, kc, vc, g, beta, state["rec"], token_slot, reset)

        # Gated RMSNorm (norm then * silu(z)).
        normed = rms_norm(core.astype(jnp.float32),
                          attn["norm"]["weight"].astype(jnp.float32),
                          c.rms_norm_eps)
        out = normed * jax.nn.silu(z.astype(jnp.float32))
        out = out.reshape(T, Hv * dv).astype(x.dtype)
        new_state = {"conv": conv_state, "rec": rec_state}
        return out @ attn["out_proj"]["kernel"], new_state

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]) -> Params:
        c = self.config
        tagged: Dict[Tuple[int, str], np.ndarray] = {}

        def filter_stream():
            for name, w in weights:
                stripped = name.removeprefix("model.")
                # Qwen3Next RMSNorm is zero-centered: y = x̂ * (1 + w)
                # (modeling_qwen3_next.Qwen3NextRMSNorm). Fold the +1 into
                # the stored weight so the shared rms_norm applies. The GDN
                # gated norm (linear_attn.norm) is NOT zero-centered.
                if (stripped == "norm.weight"
                        or re.search(r"(input_layernorm|post_attention_"
                                     r"layernorm|q_norm|k_norm)\.weight$",
                                     stripped)):
                    w = w + 1.0
                m = re.match(
                    r"layers\.(\d+)\.(linear_attn|self_attn|mlp)\.(.+)",
                    stripped)
                if m is None:
                    yield name, w
                    continue
                i, mod, rest = int(m.group(1)), m.group(2), m.group(3)
                if mod == "linear_attn":
                    tagged[(i, rest)] = w
                elif mod == "self_attn" and rest == "q_proj.weight":
                    tagged[(i, "q_proj2.weight")] = w
                elif mod == "mlp" and rest in (
                        "shared_expert_gate.weight",):
                    tagged[(i, "shared_gate")] = w
                elif mod == "mlp" and rest.startswith("shared_expert."):
                    yield ("model.layers.%d.mlp.shared_experts.%s"
                           % (i, rest.split(".", 1)[1])), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())

        for i, layer in enumerate(params["layers"]):
            if c.layer_type(i) == "linear_attention":
                attn = layer["self_attn"]
                attn["in_proj_qkvz"]["kernel"] = jnp.asarray(
                    tagged[(i, "in_proj_qkvz.weight")].T, self.dtype)
                attn["in_proj_ba"]["kernel"] = jnp.asarray(
                    tagged[(i, "in_proj_ba.weight")].T, self.dtype)
                attn["conv_weight"] = jnp.asarray(
                    tagged[(i, "conv1d.weight")][:, 0, :], jnp.float32)
                attn["dt_bias"] = jnp.asarray(tagged[(i, "dt_bias")],
                                              jnp.float32)
                attn["a_log"] = jnp.asarray(tagged[(i, "A_log")],
                                            jnp.float32)
                attn["norm"]["weight"] = jnp.asarray(
                    tagged[(i, "norm.weight")], self.dtype)
                attn["out_proj"]["kernel"] = jnp.asarray(
                    tagged[(i, "out_proj.weight")].T, self.dtype)
            elif (i, "q_proj2.weight") in tagged:
                layer["self_attn"]["q_proj"]["kernel"] = jnp.asarray(
                    tagged[(i, "q_proj2.weight")].T, self.dtype)
            if (i, "shared_gate") in tagged and "moe" in layer:
                layer["moe"]["shared_gate"] = jnp.asarray(
                    tagged[(i, "shared_gate")].T, self.dtype)
        return params
