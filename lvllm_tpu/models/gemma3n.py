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

    def _embed_special(self, params, input_ids, x0):
        """Hook: the MM wrapper replaces vision/audio hard-token rows
        with the modality embedders' embeddings."""
        return x0

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
        x0 = self._embed_special(params, input_ids, x0)
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


# ---------------------------------------------------------------------------
# Gemma 3n multimodal wrapper: USM conformer audio tower + modality
# embedders. The vision tower is timm MobileNetV5 in both HF and the
# reference (reference: gemma3n_mm.py vision_tower via timm) — absent
# timm, image soft tokens are rejected with a clear error while audio
# and vision/audio HARD tokens (embedder vocab ranges) work fully.
# ---------------------------------------------------------------------------


def _g3n_norm(x, weight, eps=1e-6):
    """Gemma3nRMSNorm: weight applied directly (no +1)."""
    return rms_norm(x, weight, eps)


def _cum_group_norm(x, weight, eps):
    """Cumulative group norm over time (HF Gemma3nAudioCumulativeGroup
    Norm, maskless path): per-step stats accumulate over (freq, chan);
    each step's squared deviation uses its own cumulative mean."""
    xf = x.astype(jnp.float32)                      # [B, T, F, C]
    B, T, F, C = xf.shape
    sum_t = xf.sum(axis=(2, 3), keepdims=True)
    cum_sum = jnp.cumsum(sum_t, axis=1)
    cnt = jnp.arange(1, T + 1, dtype=jnp.float32).reshape(1, T, 1, 1) \
        * (F * C)
    mean = cum_sum / cnt
    sq = jnp.square(xf - mean).sum(axis=(2, 3), keepdims=True)
    var = jnp.cumsum(sq, axis=1) / cnt
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(
        jnp.float32)
    return y.astype(x.dtype)


@register_model("Gemma3nForConditionalGeneration")
class Gemma3nMMModel(Gemma3nModel):

    is_multimodal = True
    mm_dynamic = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        ac = vc.get("audio") or {}
        self.a_hidden = ac.get("hidden_size", 1536)
        self.a_feat = ac.get("input_feat_size", 128)
        self.a_layers = ac.get("conf_num_hidden_layers", 12)
        self.a_heads = ac.get("conf_num_attention_heads", 8)
        self.a_chunk = ac.get("conf_attention_chunk_size", 12)
        self.a_past = max(0, ac.get("conf_attention_context_left", 13)
                          - 1)
        self.a_fut = ac.get("conf_attention_context_right", 0)
        self.a_cap = ac.get("conf_attention_logit_cap", 50.0)
        self.a_kernel = ac.get("conf_conv_kernel_size", 5)
        self.a_reduction = ac.get("conf_reduction_factor", 4)
        self.a_res_weight = ac.get("conf_residual_weight", 0.5)
        self.a_clip = ac.get("gradient_clipping", 1e10)
        self.a_eps = ac.get("rms_norm_eps", 1e-6)
        self.sscp_channels = list(ac.get("sscp_conv_channel_size",
                                         (128, 32)))
        self.sscp_kernels = [tuple(k) for k in ac.get(
            "sscp_conv_kernel_size", ((3, 3), (3, 3)))]
        self.sscp_strides = [tuple(s) for s in ac.get(
            "sscp_conv_stride_size", ((2, 2), (2, 2)))]
        self.sscp_eps = ac.get("sscp_conv_group_norm_eps", 1e-3)
        self.audio_vocab_offset = ac.get("vocab_offset", 262272)
        self.audio_vocab_size = ac.get("vocab_size", 128)
        ve = vc.get("vision_embedder") or {}
        self.vision_vocab_offset = ve.get("vocab_offset", 262144)
        self.vision_vocab_size = ve.get("vocab_size", 128)
        self.vision_hidden = ve.get("hidden_size", 2048)
        self.audio_token_id = vc.get("audio_token_id", 262273)
        self.audio_soft_tokens = vc.get("audio_soft_tokens_per_image",
                                        188)
        # Frequency dim through the SSCP stack (freq pad fixed (1,1)).
        f = self.a_feat
        for (kh, kw), (sh, sw) in zip(self.sscp_kernels,
                                      self.sscp_strides):
            f = (f + 2 - kw) // sw + 1
        self.sscp_f_out = f

    @property
    def mm_token_ids(self) -> Tuple[int, ...]:
        return (self.config.image_token_id or 262145,
                self.audio_token_id)

    # ---- modality embedders ------------------------------------------------

    def _embedder_soft(self, ep, x):
        h = _g3n_norm(x, ep["soft_embedding_norm"]["weight"], self.a_eps)
        h = h @ ep["embedding_projection"]["kernel"]
        return _rms_noscale(h, self.a_eps)

    def _embedder_hard(self, ep, ids):
        h = ep["embedding"]["weight"][ids]
        h = _g3n_norm(h, ep["hard_embedding_norm"]["weight"], self.a_eps)
        h = h @ ep["embedding_projection"]["kernel"]
        return _rms_noscale(h, self.a_eps)

    def _embed_special(self, params, input_ids, x0):
        """Vision/audio HARD tokens (embedder vocab ranges) take the
        modality embedders' rows (HF Gemma3nModel.forward)."""
        mm = params["mm"]
        vis = (input_ids >= self.vision_vocab_offset) & \
            (input_ids < self.audio_vocab_offset)
        aud = input_ids >= self.audio_vocab_offset
        vis_ids = jnp.where(
            vis, input_ids - self.vision_vocab_offset,
            self.vision_vocab_size - 1)
        aud_ids = jnp.where(
            aud, input_ids - self.audio_vocab_offset,
            self.audio_vocab_size - 1)
        x0 = jnp.where(vis[:, None],
                       self._embedder_hard(mm["embed_vision"], vis_ids)
                       .astype(x0.dtype), x0)
        x0 = jnp.where(aud[:, None],
                       self._embedder_hard(mm["embed_audio"], aud_ids)
                       .astype(x0.dtype), x0)
        return x0

    # ---- audio tower -------------------------------------------------------

    def _sscp(self, ap, mel):
        """[B, T, F] -> [B, T_sub, hidden]."""
        x = mel[:, None].astype(jnp.float32)        # [B, 1, T, F]
        for i, node in enumerate(ap["sscp"]):
            (kh, kw), (sh, sw) = self.sscp_kernels[i], self.sscp_strides[i]
            x = jnp.pad(x, ((0, 0), (0, 0), (0, kh - 1), (1, 1)))
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(node["conv"]["kernel"], jnp.float32),
                (sh, sw), [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = jnp.transpose(x, (0, 2, 3, 1))      # [B, T, F, C]
            x = _cum_group_norm(x, node["norm"]["weight"], self.sscp_eps)
            x = jax.nn.relu(x)
            x = jnp.transpose(x, (0, 3, 1, 2))
        B, C, T, F = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, T, F * C)
        return x @ ap["sub_proj"]["kernel"]

    def _audio_attention(self, lp, x, pad_mask):
        """HF Gemma3nAudioAttention: chunked local attention with
        sinusoidal relative-position logits and tanh soft cap."""
        B, T, D = x.shape
        N = self.a_heads
        H = D // N
        W = self.a_chunk
        ctx = W + self.a_past + self.a_fut
        q = (x @ lp["q_proj"]["kernel"]).reshape(B, T, N, H)
        k = (x @ lp["k_proj"]["kernel"]).reshape(B, T, N, H)
        v = (x @ lp["v_proj"]["kernel"]).reshape(B, T, N, H)
        q_scale = (H ** -0.5) / float(np.log(2.0))
        q = q * q_scale * jax.nn.softplus(lp["per_dim_scale"])

        U = -(-T // W)
        padq = U * W - T

        def blocks(a):                              # [B, T, ...] -> [B,U,W,...]
            a = jnp.pad(a, ((0, 0), (0, padq)) +
                        ((0, 0),) * (a.ndim - 2))
            return a.reshape((B, U, W) + a.shape[2:])

        def context(a):                             # [B, T, ...] -> [B,U,ctx,...]
            a = jnp.pad(a, ((0, 0),
                            (self.a_past, self.a_fut + W - 1)) +
                        ((0, 0),) * (a.ndim - 2))
            return jnp.stack([a[:, u * W:u * W + ctx]
                              for u in range(U)], axis=1)

        qb = blocks(q)                              # [B,U,W,N,H]
        kb = context(k)                             # [B,U,ctx,N,H]
        vb = context(v)
        valid = context((~pad_mask).astype(jnp.float32)) > 0.5  # [B,U,ctx]

        # Local causal window mask [W, ctx].
        lower = jnp.tril(jnp.ones((ctx, W), bool), 0).T
        upper = jnp.tril(jnp.ones((W, ctx), bool),
                         self.a_past + self.a_fut)
        local_ok = lower & upper

        term_ac = jnp.einsum("buwnh,bucnh->bnuwc", qb, kb)
        # Sinusoidal relative positions [past .. -fut], projected.
        span = self.a_past + self.a_fut + 1
        pos = np.arange(self.a_past, -self.a_fut - 1, -1,
                        dtype=np.float32)
        half = D // 2
        inv = np.exp(np.arange(half) *
                     -(math.log(1e4) / max(half - 1, 1)))
        scaled = pos[:, None] * inv[None, :]
        timing = np.concatenate([np.sin(scaled), np.cos(scaled)],
                                axis=-1)            # [span, D]
        sin_emb = (jnp.asarray(timing) @ lp["pos_proj"]["kernel"]
                   ).reshape(span, N, H)
        term_bd = jnp.einsum("buwnh,fnh->bnuwf", qb, sin_emb)
        # Relative shift [B,N,U,W,span] -> [B,N,U,W,ctx].
        pad_last = (ctx + 1) - span
        tb = jnp.pad(term_bd,
                     ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad_last)))
        tb = tb.reshape(B, N, U, W * (ctx + 1))[:, :, :, :W * ctx]
        term_bd = tb.reshape(B, N, U, W, ctx)

        logits = term_ac + term_bd
        logits = jnp.tanh(logits / self.a_cap) * self.a_cap
        ok = valid[:, None, :, None, :] & local_ok[None, None, None]
        logits = jnp.where(ok, logits,
                           jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bnuwc,bucnh->buwnh",
                         probs.astype(vb.dtype), vb)
        return out.reshape(B, U * W, N, H)[:, :T]

    def _audio_ffw(self, node, x):
        r = x
        x = jnp.clip(x, -self.a_clip, self.a_clip)
        x = _g3n_norm(x, node["pre_layer_norm"]["weight"], self.a_eps)
        x = jax.nn.silu(x @ node["ffw_layer_1"]["kernel"])
        x = x @ node["ffw_layer_2"]["kernel"]
        x = jnp.clip(x, -self.a_clip, self.a_clip)
        x = _g3n_norm(x, node["post_layer_norm"]["weight"], self.a_eps)
        return r + x * self.a_res_weight

    def _audio_lconv(self, node, x):
        r = x
        x = _g3n_norm(x, node["pre_layer_norm"]["weight"], self.a_eps)
        x = x @ node["linear_start"]["kernel"]
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)                   # GLU
        x = jnp.transpose(x, (0, 2, 1))
        x = jnp.pad(x, ((0, 0), (0, 0), (self.a_kernel - 1, 0)))
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(node["dw_conv"]["kernel"]), (1,),
            [(0, 0)], feature_group_count=self.a_hidden,
            dimension_numbers=("NCT", "OIT", "NCT"))
        x = jnp.transpose(x, (0, 2, 1))
        x = jnp.clip(x, -self.a_clip, self.a_clip)
        x = _g3n_norm(x, node["conv_norm"]["weight"], self.a_eps)
        x = jax.nn.silu(x)
        return (x @ node["linear_end"]["kernel"]) + r

    def _audio_tower(self, ap, mel, pad_mask):
        """mel [B, T, F], pad_mask [B, T] (True = padded) ->
        (states [B, T_out, hidden], out_pad_mask [B, T_out])."""
        h = self._sscp(ap, mel)
        t_sub = h.shape[1]
        stride = int(np.prod([s[0] for s in self.sscp_strides]))
        idx = np.minimum(np.arange(t_sub) * stride,
                         pad_mask.shape[1] - 1)
        mask = pad_mask[:, idx]
        for lp in ap["layers"]:
            h = self._audio_ffw(lp["ffw_layer_start"], h)
            a_in = h
            a = jnp.clip(h, -self.a_clip, self.a_clip)
            a = _g3n_norm(a, lp["attention"]["pre_attn_norm"]["weight"],
                          self.a_eps)
            a = self._audio_attention(lp["attention"], a, mask)
            a = a.reshape(a.shape[0], a.shape[1], -1) \
                @ lp["attention"]["post"]["kernel"]
            a = jnp.clip(a, -self.a_clip, self.a_clip)
            h = a_in + _g3n_norm(
                a, lp["attention"]["post_norm"]["weight"], self.a_eps)
            h = self._audio_lconv(
                lp["lconv1d"], h * (~mask)[:, :, None].astype(h.dtype))
            h = self._audio_ffw(lp["ffw_layer_end"], h)
            h = jnp.clip(h, -self.a_clip, self.a_clip)
            h = _g3n_norm(h, lp["norm"]["weight"], self.a_eps)
        if self.a_reduction > 1:
            h = h[:, ::self.a_reduction]
            mask = mask[:, ::self.a_reduction]
        h = h * (~mask)[:, :, None].astype(h.dtype)
        return h, mask

    # ---- mm encode ---------------------------------------------------------

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        if mm_data.get("pixel_values") is not None:
            raise ValueError(
                "Gemma3n image soft tokens need the timm MobileNetV5 "
                "tower (not available in this image); audio and hard "
                "vision tokens are supported")
        mm = params["mm"]
        feats = np.asarray(mm_data["input_features"], np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        fmask = mm_data.get("input_features_mask")
        fmask = (np.asarray(fmask, bool) if fmask is not None
                 else np.ones(feats.shape[:2], bool))   # True = valid
        h, out_pad = self._audio_tower(mm["audio"], jnp.asarray(feats),
                                       jnp.asarray(~fmask))
        soft = self._embedder_soft(mm["embed_audio"], h)
        pad_emb = self._embedder_hard(
            mm["embed_audio"],
            jnp.asarray([self.audio_vocab_size - 1]))[0]
        soft = jnp.where(np.asarray(out_pad)[:, :, None], pad_emb, soft)
        B, S, H = soft.shape
        extra = self.audio_soft_tokens - S
        if extra > 0:
            soft = jnp.concatenate(
                [soft, jnp.broadcast_to(pad_emb, (B, extra, H))], axis=1)
        elif extra < 0:
            soft = soft[:, :self.audio_soft_tokens]
        return np.asarray(soft, np.float32).reshape(-1, H)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        nprng = np.random.default_rng(829 + self.config.seed)
        A = self.a_hidden
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               self.dtype)

        def one(n):
            return {"weight": jnp.ones((n,), self.dtype)}

        def embedder(hidden, vocab):
            return {"embedding": {"weight": dense((vocab, hidden))},
                    "hard_embedding_norm": one(hidden),
                    "soft_embedding_norm": one(hidden),
                    "embedding_projection": {"kernel": dense((hidden,
                                                              H))}}

        sscp = []
        cin = 1
        for i, cout in enumerate(self.sscp_channels):
            kh, kw = self.sscp_kernels[i]
            sscp.append({"conv": {"kernel": dense((cout, cin, kh, kw))},
                         "norm": one(cout)})
            cin = cout
        layers = []
        for _ in range(self.a_layers):
            layers.append({
                "ffw_layer_start": {
                    "pre_layer_norm": one(A),
                    "ffw_layer_1": {"kernel": dense((A, 4 * A))},
                    "ffw_layer_2": {"kernel": dense((4 * A, A))},
                    "post_layer_norm": one(A)},
                "ffw_layer_end": {
                    "pre_layer_norm": one(A),
                    "ffw_layer_1": {"kernel": dense((A, 4 * A))},
                    "ffw_layer_2": {"kernel": dense((4 * A, A))},
                    "post_layer_norm": one(A)},
                "attention": {
                    "pre_attn_norm": one(A),
                    "q_proj": {"kernel": dense((A, A))},
                    "k_proj": {"kernel": dense((A, A))},
                    "v_proj": {"kernel": dense((A, A))},
                    "per_dim_scale": jnp.zeros((A // self.a_heads,),
                                               self.dtype),
                    "pos_proj": {"kernel": dense((A, A))},
                    "post": {"kernel": dense((A, A))},
                    "post_norm": one(A)},
                "lconv1d": {
                    "pre_layer_norm": one(A),
                    "linear_start": {"kernel": dense((A, 2 * A))},
                    "dw_conv": {"kernel": dense((A, 1, self.a_kernel))},
                    "conv_norm": one(A),
                    "linear_end": {"kernel": dense((A, A))}},
                "norm": one(A)})
        params["mm"] = {
            "audio": {"sscp": sscp,
                      "sub_proj": {"kernel": dense(
                          (self.sscp_channels[-1] * self.sscp_f_out,
                           A))},
                      "layers": layers},
            "embed_audio": embedder(A, self.audio_vocab_size),
            "embed_vision": embedder(self.vision_hidden,
                                     self.vision_vocab_size),
        }
        return params

    # ---- weights -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        import re
        mm: Dict[str, Dict] = {
            "audio": {"sscp": [{} for _ in self.sscp_channels],
                      "layers": [{} for _ in range(self.a_layers)]},
            "embed_audio": {}, "embed_vision": {}}
        t = lambda a: jnp.asarray(np.ascontiguousarray(np.asarray(a).T),  # noqa: E731
                                  self.dtype)
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731

        def embedder_put(node, rest, w):
            if rest == "embedding.weight":
                node["embedding"] = {"weight": v(w)}
            elif m := re.match(r"(hard_embedding_norm|"
                               r"soft_embedding_norm)\.weight", rest):
                node[m.group(1)] = {"weight": v(w)}
            elif rest == "embedding_projection.weight":
                node["embedding_projection"] = {"kernel": t(w)}

        def tower_put(rest, w):
            ad = mm["audio"]
            if m := re.match(r"subsample_conv_projection\.conv_(\d)\."
                             r"conv\.weight", rest):
                ad["sscp"][int(m.group(1))]["conv"] = {"kernel": v(w)}
            elif m := re.match(r"subsample_conv_projection\.conv_(\d)\."
                               r"norm\.weight", rest):
                ad["sscp"][int(m.group(1))]["norm"] = {"weight": v(w)}
            elif rest == "subsample_conv_projection.input_proj_linear" \
                    ".weight":
                ad["sub_proj"] = {"kernel": t(w)}
            elif m := re.match(r"conformer\.(\d+)\.(.+)", rest):
                lp = ad["layers"][int(m.group(1))]
                leaf = m.group(2)
                if m2 := re.match(r"(ffw_layer_start|ffw_layer_end)\."
                                  r"(.+)", leaf):
                    node = lp.setdefault(m2.group(1), {})
                    sub = m2.group(2)
                    if m3 := re.match(r"(pre_layer_norm|post_layer_norm)"
                                      r"\.weight", sub):
                        node[m3.group(1)] = {"weight": v(w)}
                    elif m3 := re.match(r"(ffw_layer_1|ffw_layer_2)\."
                                        r"weight", sub):
                        node[m3.group(1)] = {"kernel": t(w)}
                elif leaf.startswith("attention."):
                    node = lp.setdefault("attention", {})
                    sub = leaf.removeprefix("attention.")
                    if m3 := re.match(r"(pre_attn_norm|post_norm)\."
                                      r"weight", sub):
                        node[m3.group(1)] = {"weight": v(w)}
                    elif m3 := re.match(r"attn\.(q_proj|k_proj|v_proj)\."
                                        r"weight", sub):
                        node[m3.group(1)] = {"kernel": t(w)}
                    elif sub == "attn.per_dim_scale":
                        node["per_dim_scale"] = v(w)
                    elif sub == "attn.relative_position_embedding." \
                            "pos_proj.weight":
                        node["pos_proj"] = {"kernel": t(w)}
                    elif sub == "post.weight":
                        node["post"] = {"kernel": t(w)}
                elif leaf.startswith("lconv1d."):
                    node = lp.setdefault("lconv1d", {})
                    sub = leaf.removeprefix("lconv1d.")
                    if m3 := re.match(r"(pre_layer_norm|conv_norm)\."
                                      r"weight", sub):
                        node[m3.group(1)] = {"weight": v(w)}
                    elif m3 := re.match(r"(linear_start|linear_end)\."
                                        r"weight", sub):
                        node[m3.group(1)] = {"kernel": t(w)}
                    elif sub == "depthwise_conv1d.weight":
                        node["dw_conv"] = {"kernel": v(w)}
                elif leaf == "norm.weight":
                    lp["norm"] = {"weight": v(w)}

        def filter_stream():
            for name, w in weights:
                inner = name.removeprefix("model.")
                if inner.startswith("audio_tower."):
                    tower_put(inner.removeprefix("audio_tower."), w)
                elif inner.startswith("embed_audio."):
                    embedder_put(mm["embed_audio"],
                                 inner.removeprefix("embed_audio."), w)
                elif inner.startswith("embed_vision."):
                    embedder_put(mm["embed_vision"],
                                 inner.removeprefix("embed_vision."), w)
                elif inner.startswith("vision_tower."):
                    continue    # timm MobileNetV5 — not supported
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["mm"] = mm
        return params
