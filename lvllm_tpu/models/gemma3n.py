"""Gemma 3n (MatFormer) text model: AltUp multi-stream residuals,
Laurel blocks, per-layer embeddings, KV sharing, activation sparsity.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
gemma3n.py`` / HF ``modeling_gemma3n.py``:
- AltUp (Gemma3nTextAltUp): 4 parallel residual streams; predict mixes
  streams with router-conditioned coefficients before the layer,
  correct propagates the active stream's innovation after it;
- Laurel (Gemma3nTextLaurelBlock): low-rank residual branch on the
  normed attention input, merged as (attn + laurel)/sqrt(2);
- per-layer embeddings (PLE): a second embedding table provides a
  256-wide per-layer input, gated into streams 1..3 after correction;
- KV sharing: the last ``num_kv_shared_layers`` layers attend using
  the cache of the last non-shared layer of the same attention type
  (sliding vs full) and write no KV of their own (NullSpec caches);
- attention: per-head q/k RMSNorm (zero-centered weights), scale-less
  v RMSNorm, dual rope (local base on sliding layers), scaling=1.0;
- MLP: gelu-tanh gated with per-layer widths and statistical top-k
  activation sparsity (mean + std·Φ⁻¹(p) cutoff) on early layers;
- final hidden: mean over unembed-projected streams, then norm.
"""

import math
from statistics import NormalDist
from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm
from lvllm_tpu.models.gemma import GemmaModel
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.ops.attention import ragged_paged_attention
from lvllm_tpu.ops.kv_cache import write_kv
from lvllm_tpu.ops.rope import apply_rope


def _rms_noscale(x, eps):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.square(xf).mean(-1, keepdims=True)
                               + eps)).astype(x.dtype)


@register_model("Gemma3nForCausalLM")
class Gemma3nModel(GemmaModel):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        g = config.gemma3n or {}
        self.n_altup = g.get("altup_num_inputs", 4)
        self.altup_active = g.get("altup_active_idx", 0)
        self.altup_correct_scale = g.get("altup_correct_scale", True)
        self.laurel_rank = g.get("laurel_rank", 64)
        self.h_per_layer = g.get("hidden_size_per_layer_input", 256)
        self.vocab_per_layer = g.get("vocab_size_per_layer_input",
                                     config.vocab_size)
        self.num_kv_shared = g.get("num_kv_shared_layers", 0)
        self.sparsity = list(g.get("activation_sparsity_pattern") or
                             [0.0] * config.num_hidden_layers)
        self.inter_sizes = list(
            g.get("intermediate_size_per_layer") or
            [config.intermediate_size] * config.num_hidden_layers)
        # Φ⁻¹(p) per layer, precomputed host-side.
        self._std_mult = [NormalDist().inv_cdf(p) if p > 0.0 else 0.0
                          for p in self.sparsity]
        L = config.num_hidden_layers
        self.first_shared = L - self.num_kv_shared
        # For each shared layer, the source = last non-shared layer of
        # the same attention type (HF Gemma3nTextAttention.__init__).
        self.kv_share_src: Dict[int, int] = {}
        if 0 < self.first_shared <= L:
            prev = [config.layer_type(i) for i in range(self.first_shared)]
            for i in range(self.first_shared, L):
                t = config.layer_type(i)
                self.kv_share_src[i] = (len(prev) - 1 -
                                        prev[::-1].index(t))

    # ---- caches ------------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        if layer_idx in self.kv_share_src:
            from lvllm_tpu.core.kv_cache_spec import NullSpec
            return NullSpec()
        return super().kv_cache_spec(layer_idx, kv_dtype)

    # ---- forward -----------------------------------------------------------

    def _g3n_attention(self, lp, x, positions, kv_cache, md, layer_idx,
                       shared_cache):
        c = self.config
        D = self.head_dim
        T = x.shape[0]
        attn = lp["self_attn"]
        window = c.window_for_layer(layer_idx)
        q = (x @ attn["q_proj"]["kernel"]).reshape(
            T, c.num_attention_heads, D)
        q = rms_norm(q, attn["q_norm"]["weight"], c.rms_norm_eps)
        cos_sin = self.rope_cache(layer_idx)
        if layer_idx in self.kv_share_src:
            # Reuse the source layer's cache (already updated this step);
            # only q is computed locally. Write nothing.
            q, _ = apply_rope(q, q[:, :c.num_key_value_heads], positions,
                              cos_sin)
            cache = shared_cache
            new_cache = kv_cache
        else:
            k = (x @ attn["k_proj"]["kernel"]).reshape(
                T, c.num_key_value_heads, D)
            k = rms_norm(k, attn["k_norm"]["weight"], c.rms_norm_eps)
            v = (x @ attn["v_proj"]["kernel"]).reshape(
                T, c.num_key_value_heads, D)
            v = _rms_noscale(v, c.rms_norm_eps)
            q, k = apply_rope(q, k, positions, cos_sin)
            cache = write_kv(kv_cache, k, v, md.slot_mapping)
            new_cache = cache
        out = ragged_paged_attention(
            q, cache, md.block_table, md.query_start_loc, md.seq_lens,
            scale=1.0, sliding_window=window,
            prefix_lens=md.prefix_lens)
        out = out.reshape(T, c.num_attention_heads * D) \
            @ attn["o_proj"]["kernel"]
        return out, new_cache

    def _g3n_mlp(self, lp, x, layer_idx):
        mlp = lp["mlp"]
        gate = x @ mlp["gate"]["kernel"]
        if self.sparsity[layer_idx] > 0.0:
            gf = gate.astype(jnp.float32)
            mean = gf.mean(-1, keepdims=True)
            std = jnp.sqrt(jnp.square(gf - mean).mean(-1, keepdims=True))
            cutoff = mean + std * self._std_mult[layer_idx]
            gate = jax.nn.relu(gf - cutoff).astype(x.dtype)
        act = jax.nn.gelu(gate.astype(jnp.float32),
                          approximate=True).astype(x.dtype)
        up = x @ mlp["up"]["kernel"]
        return (act * up) @ mlp["down"]["kernel"]

    def _router_modalities(self, alt, x):
        c = self.config
        r = rms_norm(x, alt["router_norm"]["weight"], c.rms_norm_eps) \
            * (1.0 / c.hidden_size)
        return jnp.tanh((r @ alt["modality_router"]["kernel"]
                         ).astype(jnp.float32)).astype(x.dtype)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_metadata, lora=None, token_adapter=None,
                 mm_embeds=None, mm_mask=None, mm_deepstack=None,
                 aux_hidden_layers: Tuple[int, ...] = ()):
        c = self.config
        N = self.n_altup
        active = self.altup_active
        T = input_ids.shape[0]
        L = c.num_hidden_layers
        P = self.h_per_layer
        eps = c.rms_norm_eps
        gp = params["g3n"]

        x0 = self.embed_tokens(params, input_ids)
        if mm_embeds is not None:
            x0 = jnp.where(mm_mask[:, None], mm_embeds.astype(x0.dtype),
                           x0)

        # Per-layer inputs: PLE table rows (zeroed for out-of-range ids,
        # e.g. mm placeholders) + projected main embedding, / sqrt(2).
        in_range = input_ids < self.vocab_per_layer
        ids_c = jnp.where(in_range, input_ids, 0)
        ple = gp["embed_per_layer"]["weight"][ids_c].astype(x0.dtype) \
            * jnp.asarray(P ** 0.5, self.dtype)
        ple = jnp.where(in_range[:, None], ple, 0.0).reshape(T, L, P)
        proj = (x0 @ gp["per_layer_model_projection"]["kernel"]) \
            * (c.hidden_size ** -0.5)
        proj = rms_norm(proj.reshape(T, L, P),
                        gp["per_layer_projection_norm"]["weight"], eps)
        per_layer = (proj + ple) * jnp.asarray(2.0 ** -0.5, x0.dtype)

        # AltUp stream init: project and rescale to the active magnitude.
        target = jnp.sqrt(
            jnp.square(x0.astype(jnp.float32)).mean(-1, keepdims=True))
        streams = [x0]
        for i in range(1, N):
            s = x0 @ gp["altup_projections"][i - 1]["kernel"]
            mag = jnp.sqrt(jnp.maximum(
                jnp.square(s.astype(jnp.float32)).mean(-1, keepdims=True),
                1e-5))
            streams.append((s * (target / mag)).astype(x0.dtype))

        new_caches: List[jax.Array] = []
        step_caches: Dict[str, jax.Array] = {}
        for i, lp in enumerate(params["layers"]):
            alt = lp["altup"]
            # predict
            modalities = self._router_modalities(alt, streams[active])
            coefs = (modalities @ alt["prediction_coefs"]["kernel"]
                     ).reshape(T, N, N)
            hst = jnp.stack(streams, axis=-1)            # [T, H, N]
            pred = jnp.einsum("thp,tip->thi", hst, coefs)
            preds = [pred[..., j] + streams[j] for j in range(N)]

            ap = preds[active]
            ap_normed = rms_norm(ap, lp["input_layernorm"]["weight"], eps)
            laurel = lp["laurel"]
            lr = (ap_normed @ laurel["linear_left"]["kernel"]) \
                @ laurel["linear_right"]["kernel"]
            laurel_out = ap_normed + rms_norm(
                lr, laurel["post_laurel_norm"]["weight"], eps)

            shared_cache = None
            if i in self.kv_share_src:
                shared_cache = step_caches[c.layer_type(i)]
            attn_out, kv = self._g3n_attention(
                lp, ap_normed, positions, kv_caches[i], attn_metadata,
                i, shared_cache)
            if i not in self.kv_share_src:
                step_caches[c.layer_type(i)] = kv
            new_caches.append(kv)
            attn_out = rms_norm(
                attn_out, lp["post_attention_layernorm"]["weight"], eps)
            attn_laurel = ((ap + attn_out) + laurel_out) \
                * jnp.asarray(2.0 ** -0.5, x0.dtype)

            h = rms_norm(attn_laurel,
                         lp["pre_feedforward_layernorm"]["weight"], eps)
            ffw = self._g3n_mlp(lp, h, i)
            ffw = rms_norm(
                ffw, lp["post_feedforward_layernorm"]["weight"], eps)
            activated = attn_laurel + ffw

            # correct
            modalities = self._router_modalities(alt, activated)
            ccoefs = (modalities @ alt["correction_coefs"]["kernel"]
                      ).astype(jnp.float32) + 1.0       # [T, N]
            innovation = activated - preds[active]
            corrected = [
                preds[j] + (innovation.astype(jnp.float32)
                            * ccoefs[:, j:j + 1]).astype(x0.dtype)
                for j in range(N)]

            first = corrected[active]
            if self.altup_correct_scale:
                first = first * alt["correct_output_scale"]
            g = jax.nn.gelu(
                (first @ lp["per_layer_input_gate"]["kernel"]
                 ).astype(jnp.float32), approximate=True).astype(x0.dtype)
            g = g * per_layer[:, i]
            g = g @ lp["per_layer_projection"]["kernel"]
            g = rms_norm(g, lp["post_per_layer_input_norm"]["weight"],
                         eps)
            streams = [corrected[0]] + [corrected[j] + g
                                        for j in range(1, N)]

        # Unembed: rescale streams 1..N-1 to stream-0 magnitude, mean.
        target = jnp.sqrt(jnp.square(
            streams[0].astype(jnp.float32)).mean(-1, keepdims=True))
        outs = [streams[0]]
        for i in range(1, N):
            s = streams[i] @ gp["altup_unembed_projections"][i - 1]["kernel"]
            mag = jnp.sqrt(jnp.maximum(
                jnp.square(s.astype(jnp.float32)).mean(-1, keepdims=True),
                1e-5))
            outs.append((s * (target / mag)).astype(x0.dtype))
        hidden = sum(o.astype(jnp.float32) for o in outs) / N
        hidden = rms_norm(hidden.astype(x0.dtype),
                          params["norm"]["weight"], eps)
        return hidden, new_caches

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        H = c.hidden_size
        L = c.num_hidden_layers
        P = self.h_per_layer
        N = self.n_altup
        nprng = np.random.default_rng(823 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               self.dtype)

        def one(n):
            return {"weight": jnp.ones((n,), self.dtype)}

        for i, layer in enumerate(params["layers"]):
            I = self.inter_sizes[i]
            layer["mlp"] = {"gate": {"kernel": dense((H, I))},
                            "up": {"kernel": dense((H, I))},
                            "down": {"kernel": dense((I, H))}}
            layer["altup"] = {
                "correct_output_scale": jnp.zeros((H,), self.dtype),
                "correction_coefs": {"kernel": dense((N, N))},
                "prediction_coefs": {"kernel": dense((N, N * N))},
                "modality_router": {"kernel": dense((H, N))},
                "router_norm": one(H)}
            layer["laurel"] = {
                "linear_left": {"kernel": dense((H, self.laurel_rank))},
                "linear_right": {"kernel": dense((self.laurel_rank, H))},
                "post_laurel_norm": one(H)}
            layer["per_layer_input_gate"] = {"kernel": dense((H, P))}
            layer["per_layer_projection"] = {"kernel": dense((P, H))}
            layer["post_per_layer_input_norm"] = one(H)
        params["g3n"] = {
            "embed_per_layer": {
                "weight": dense((self.vocab_per_layer, L * P))},
            "per_layer_model_projection": {"kernel": dense((H, L * P))},
            "per_layer_projection_norm": one(P),
            "altup_projections": [
                {"kernel": dense((H, H))} for _ in range(N - 1)],
            "altup_unembed_projections": [
                {"kernel": dense((H, H))} for _ in range(N - 1)],
        }
        return params

    # ---- weights -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        import re
        L = self.config.num_hidden_layers
        N = self.n_altup
        side: Dict[str, Dict] = {"layers": [{} for _ in range(L)]}
        g3n: Dict[str, object] = {
            "altup_projections": [None] * (N - 1),
            "altup_unembed_projections": [None] * (N - 1)}
        t = lambda a: jnp.asarray(np.ascontiguousarray(np.asarray(a).T),  # noqa: E731
                                  self.dtype)
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731

        def filter_stream():
            for name, w in weights:
                # HF re-keys text-only checkpoints under language_model.
                # (and its regex mangles per_layer_model_projection).
                name = name.replace(
                    "per_layer_model.language_model_projection",
                    "per_layer_model_projection")
                name = name.removeprefix("model.")
                name = name.removeprefix("language_model.")
                stripped = name
                if m := re.match(r"layers\.(\d+)\.(.+)", stripped):
                    i, leaf = int(m.group(1)), m.group(2)
                    lp = side["layers"][i]
                    if m2 := re.match(r"altup\.(.+)", leaf):
                        node = lp.setdefault("altup", {})
                        sub = m2.group(1)
                        if sub == "correct_output_scale":
                            node["correct_output_scale"] = v(w)
                        elif sub == "router_norm.weight":
                            node["router_norm"] = {"weight": v(w)}
                        elif m3 := re.match(
                                r"(correction_coefs|prediction_coefs|"
                                r"modality_router)\.weight", sub):
                            node[m3.group(1)] = {"kernel": t(w)}
                        continue
                    if m2 := re.match(r"laurel\.(.+)", leaf):
                        node = lp.setdefault("laurel", {})
                        sub = m2.group(1)
                        if sub == "post_laurel_norm.weight":
                            node["post_laurel_norm"] = {"weight": v(w)}
                        elif m3 := re.match(
                                r"(linear_left|linear_right)\.weight",
                                sub):
                            node[m3.group(1)] = {"kernel": t(w)}
                        continue
                    if m2 := re.match(r"(per_layer_input_gate|"
                                      r"per_layer_projection)\.weight",
                                      leaf):
                        lp[m2.group(1)] = {"kernel": t(w)}
                        continue
                    if m2 := re.match(r"mlp\.(gate|up|down)_proj\.weight",
                                      leaf):
                        # Per-layer FFN widths + sparsity want the gate
                        # separate — keep gemma3n MLPs unfused.
                        lp.setdefault("mlp", {})[m2.group(1)] = {
                            "kernel": t(w)}
                        continue
                    if leaf == "post_per_layer_input_norm.weight":
                        lp["post_per_layer_input_norm"] = {"weight": v(w)}
                        continue
                    if m2 := re.match(r"(pre_feedforward_layernorm|"
                                      r"post_feedforward_layernorm)"
                                      r"\.weight", leaf):
                        lp[m2.group(1)] = {"weight": v(w)}
                        continue
                    yield name, w
                elif stripped == "embed_tokens_per_layer.weight":
                    g3n["embed_per_layer"] = {"weight": v(w)}
                elif stripped == "per_layer_model_projection.weight":
                    g3n["per_layer_model_projection"] = {"kernel": t(w)}
                elif stripped == "per_layer_projection_norm.weight":
                    g3n["per_layer_projection_norm"] = {"weight": v(w)}
                elif m := re.match(
                        r"(altup_projections|altup_unembed_projections)"
                        r"\.(\d+)\.weight", stripped):
                    g3n[m.group(1)][int(m.group(2))] = {"kernel": t(w)}
                else:
                    yield name, w

        # Bypass GemmaModel.load_weights: Gemma3nRMSNorm applies its
        # weight DIRECTLY (no zero-centered +1 fold, unlike Gemma 2/3).
        from lvllm_tpu.models.qwen3 import Qwen3Model
        params = Qwen3Model.load_weights(self, filter_stream())
        for i, lp in enumerate(side["layers"]):
            params["layers"][i].update(lp)
        params["g3n"] = g3n
        return params
