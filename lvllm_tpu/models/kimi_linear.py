"""Kimi-Linear — KDA (Kimi Delta Attention) hybrid with MLA layers.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
kimi_linear.py`` + ``layers/kda.py`` (config
``transformers_utils/configs/kimi_linear.py``). No HF transformers class
exists in this image — tests are structural + op-level oracles.

Layers listed in ``linear_attn_config["kda_layers"]`` (1-based) run KDA:
q/k/v projections each pass a per-request depthwise causal conv + SiLU,
the per-(head, channel) log-decay gate comes from a low-rank projection
(f_a→f_b) through −exp(A_log)·softplus(·+dt_bias), β = σ(b_proj), and
the output is per-head RMS-normed and gated by σ(g_b(g_a(x))) before
o_proj. Other layers are MLA (DeepSeek path); FFN is dense or
DeepSeek-style MoE via the unified config knobs.
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.deepseek import DeepseekModel
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.ops.attention import _token_request_map
from lvllm_tpu.ops.gdn import causal_conv1d_decode, causal_conv1d_ragged
from lvllm_tpu.ops.kda import kda_decode, kda_gate, kda_ragged
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@register_model("KimiLinearForCausalLM")
class KimiLinearModel(DeepseekModel):

    dcp_compatible = False

    # ---- cache layout ------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        c = self.config
        if c.layer_type(layer_idx) == "linear_attention":
            from lvllm_tpu.core.kv_cache_spec import LinearAttentionSpec
            H, D = c.linear_num_key_heads, c.linear_key_head_dim
            return LinearAttentionSpec(
                conv_dim=3 * H * D,        # separate q/k/v conv windows
                conv_width=c.linear_conv_kernel_dim,
                num_v_heads=H, k_head_dim=D, v_head_dim=D)
        return super().kv_cache_spec(layer_idx, kv_dtype)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        H, D = c.linear_num_key_heads, c.linear_key_head_dim
        seed = rng if isinstance(rng, int) else 0
        nprng = np.random.default_rng(606 + seed + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        for i, layer in enumerate(params["layers"]):
            if c.layer_type(i) != "linear_attention":
                continue
            layer["self_attn"] = {
                "q_proj": {"kernel": dense((c.hidden_size, H * D))},
                "k_proj": {"kernel": dense((c.hidden_size, H * D))},
                "v_proj": {"kernel": dense((c.hidden_size, H * D))},
                "b_proj": {"kernel": dense((c.hidden_size, H))},
                "f_a_proj": {"kernel": dense((c.hidden_size, D))},
                "f_b_proj": {"kernel": dense((D, H * D))},
                "g_a_proj": {"kernel": dense((c.hidden_size, D))},
                "g_b_proj": {"kernel": dense((D, H * D))},
                "dt_bias": jnp.zeros((H * D,), jnp.float32),
                "a_log": jnp.zeros((H,), jnp.float32),
                "q_conv": dense((H * D, c.linear_conv_kernel_dim)),
                "k_conv": dense((H * D, c.linear_conv_kernel_dim)),
                "v_conv": dense((H * D, c.linear_conv_kernel_dim)),
                "o_norm": {"weight": jnp.ones((D,), self.dtype)},
                "o_proj": {"kernel": dense((H * D, c.hidden_size))},
            }
        return params

    # ---- attention ---------------------------------------------------------

    def _attention(self, lp, x, positions, kv_cache, md, lora=None,
                   token_adapter=None, layer_idx: int = 0):
        if "b_proj" in lp["self_attn"]:
            return self._kda_attention(lp, x, positions, kv_cache, md)
        return super()._attention(lp, x, positions, kv_cache, md,
                                  lora=lora, token_adapter=token_adapter,
                                  layer_idx=layer_idx)

    def _kda_attention(self, lp, x, positions, state, md):
        c = self.config
        T = x.shape[0]
        H, D = c.linear_num_key_heads, c.linear_key_head_dim
        attn = lp["self_attn"]

        num_reqs = md.block_table.shape[0]
        req_idx = _token_request_map(md.query_start_loc, T, num_reqs)
        scratch = state["rec"].shape[0] - 1
        token_valid = jnp.arange(T) < md.query_start_loc[num_reqs]
        token_slot = jnp.where(
            token_valid,
            md.row_slots[req_idx] if md.row_slots is not None else req_idx,
            scratch).astype(jnp.int32)
        reset = (positions == 0) & token_valid

        # Separate q/k/v depthwise convs sharing one window leaf.
        conv_fn = causal_conv1d_decode if md.decode_mode \
            else causal_conv1d_ragged
        mixed = jnp.concatenate(
            [x @ attn["q_proj"]["kernel"], x @ attn["k_proj"]["kernel"],
             x @ attn["v_proj"]["kernel"]], axis=-1)        # [T, 3HD]
        conv_w = jnp.concatenate(
            [attn["q_conv"], attn["k_conv"], attn["v_conv"]],
            axis=0).astype(jnp.float32)
        conv_out, conv_state = conv_fn(mixed, state["conv"], conv_w,
                                       token_slot, reset)
        HD = H * D
        q = conv_out[:, :HD].reshape(T, H, D)
        k = conv_out[:, HD:2 * HD].reshape(T, H, D)
        v = conv_out[:, 2 * HD:].reshape(T, H, D)

        beta = jax.nn.sigmoid(
            (x @ attn["b_proj"]["kernel"]).astype(jnp.float32))
        g_raw = (x @ attn["f_a_proj"]["kernel"]) @ attn["f_b_proj"]["kernel"]
        g = kda_gate(g_raw, attn["a_log"], attn["dt_bias"], D)

        fn = kda_decode if md.decode_mode else kda_ragged
        core, rec_state = fn(q, k, v, g, beta, state["rec"], token_slot,
                             reset)

        # Per-head gated RMSNorm with sigmoid gate (FusedRMSNormGated
        # activation="sigmoid"): norm(core) * sigmoid(g2), weight [D].
        g2 = ((x @ attn["g_a_proj"]["kernel"])
              @ attn["g_b_proj"]["kernel"]).reshape(T, H, D)
        var = jnp.mean(jnp.square(core), axis=-1, keepdims=True)
        normed = core * jax.lax.rsqrt(var + c.rms_norm_eps) * \
            attn["o_norm"]["weight"].astype(jnp.float32)
        out = normed * jax.nn.sigmoid(g2.astype(jnp.float32))
        out = out.reshape(T, HD).astype(x.dtype)
        return out @ attn["o_proj"]["kernel"], \
            {"conv": conv_state, "rec": rec_state}

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        c = self.config
        tagged: Dict[Tuple[int, str], np.ndarray] = {}
        kda_keys = ("q_proj.weight", "k_proj.weight", "v_proj.weight",
                    "b_proj.weight", "f_a_proj.weight", "f_b_proj.weight",
                    "g_a_proj.weight", "g_b_proj.weight", "dt_bias",
                    "A_log", "q_conv1d.weight", "k_conv1d.weight",
                    "v_conv1d.weight", "o_norm.weight", "o_proj.weight")

        def filter_stream():
            for name, w in weights:
                n = name.removeprefix("model.")
                m = re.match(r"layers\.(\d+)\.self_attn\.(.+)", n)
                if m and c.layer_type(int(m.group(1))) == \
                        "linear_attention" and m.group(2) in kda_keys:
                    tagged[(int(m.group(1)), m.group(2))] = np.asarray(w)
                elif m and "block_sparse_moe" in n:
                    yield name.replace("block_sparse_moe", "mlp"), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        for (i, key), w in tagged.items():
            attn = params["layers"][i]["self_attn"]
            if key.endswith("_proj.weight"):
                attn[key[:-7]]["kernel"] = jnp.asarray(w.T, self.dtype)
            elif key in ("dt_bias",):
                attn["dt_bias"] = jnp.asarray(w.reshape(-1), jnp.float32)
            elif key == "A_log":
                attn["a_log"] = jnp.asarray(w.reshape(-1), jnp.float32)
            elif key.endswith("_conv1d.weight"):
                attn[key[0] + "_conv"] = jnp.asarray(
                    w.reshape(w.shape[0], -1), self.dtype)
            elif key == "o_norm.weight":
                attn["o_norm"]["weight"] = jnp.asarray(w, self.dtype)
        return params
