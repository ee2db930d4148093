"""DeepSeek V2/V3 family — MLA attention + (optionally) group-routed MoE.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
deepseek_v2.py`` + the MLA stack (``layers/attention/mla_attention.py``);
HF numerics reference: transformers ``modeling_deepseek_v2``. Shares the
embedding/FFN/MoE machinery with the unified Qwen3Model; overrides the
attention path with absorbed-MLA over a latent KV cache (``ops/mla.py``)
and the interleaved DeepSeek rope convention.

Extra per-layer params (replacing self_attn q/k/v/o):
  self_attn.q_proj.kernel [H, Hq*(dn+dr)]            (lite; q_lora_rank=None)
  — or — q_a_proj.kernel [H, q_lora], q_a_norm.weight, q_b_proj.kernel
  self_attn.kv_a_proj.kernel [H, Dc+dr]
  self_attn.kv_a_norm.weight [Dc]
  self_attn.w_uk [Hq, dn, Dc]   (absorbed key expansion)
  self_attn.w_uv [Hq, dv, Dc]   (absorbed value expansion)
  self_attn.o_proj.kernel [Hq*dv, H]
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
from lvllm_tpu.ops.mla import mla_attention, write_mla_cache
from lvllm_tpu.ops.rope import apply_rope_interleaved, compute_cos_sin_cache
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class DeepseekModel(Qwen3Model):

    # MLA rides the DCP path too: the latent cache is a 1-head paged cache
    # (k-plane = c_kv‖k_pe, v-plane = c_kv), so page-interleaved partial
    # attention + LSE merge applies unchanged (reference: MLA DCP
    # allgather merge, mla_attention.py:745-770).
    dcp_compatible = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        self.scale = (c.qk_nope_head_dim + c.qk_rope_head_dim) ** -0.5
        self.cos_sin = compute_cos_sin_cache(
            c.qk_rope_head_dim, c.max_position_embeddings, c.rope_theta,
            c.rope_scaling, dtype=jnp.float32)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        H = c.num_attention_heads
        dn, dr, dv = c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        Dc = c.kv_lora_rank
        nprng = np.random.default_rng(1234 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        for layer in params["layers"]:
            attn: Dict[str, Any] = {
                "kv_a_proj": {"kernel": dense((c.hidden_size, Dc + dr))},
                "kv_a_norm": {"weight": jnp.ones((Dc,), self.dtype)},
                "w_uk": dense((H, dn, Dc)),
                "w_uv": dense((H, dv, Dc)),
                "o_proj": {"kernel": dense((H * dv, c.hidden_size))},
            }
            if c.q_lora_rank:
                attn["q_a_proj"] = {"kernel": dense(
                    (c.hidden_size, c.q_lora_rank))}
                attn["q_a_norm"] = {"weight": jnp.ones((c.q_lora_rank,),
                                                       self.dtype)}
                attn["q_b_proj"] = {"kernel": dense(
                    (c.q_lora_rank, H * (dn + dr)))}
            else:
                attn["q_proj"] = {"kernel": dense(
                    (c.hidden_size, H * (dn + dr)))}
            layer["self_attn"] = attn
        return params

    # ---- attention ---------------------------------------------------------

    def _attention(self, lp: Params, x: jax.Array, positions: jax.Array,
                   kv_cache: jax.Array, md: AttentionMetadata,
                   lora=None, token_adapter=None, layer_idx: int = 0
                   ) -> Tuple[jax.Array, jax.Array]:
        c = self.config
        H = c.num_attention_heads
        dn, dr, dv = c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        Dc = c.kv_lora_rank
        T = x.shape[0]
        attn = lp["self_attn"]

        if "q_proj" in attn:
            q = x @ attn["q_proj"]["kernel"]
        else:
            qa = rms_norm(x @ attn["q_a_proj"]["kernel"],
                          attn["q_a_norm"]["weight"], c.rms_norm_eps)
            q = qa @ attn["q_b_proj"]["kernel"]
        q = q.reshape(T, H, dn + dr)
        if c.mla_scale_q_lora:
            # LongcatFlash LoRA output scaling (uniform over nope+rope).
            q = q * c.mla_scale_q_lora
        q_nope, q_pe = q[..., :dn], q[..., dn:]

        ckv_pe = x @ attn["kv_a_proj"]["kernel"]          # [T, Dc+dr]
        c_kv = rms_norm(ckv_pe[:, :Dc], attn["kv_a_norm"]["weight"],
                        c.rms_norm_eps)
        if c.mla_scale_kv_lora:
            # Scaling the latent directly == HF's scale-before-kv_b (both
            # K-nope and V come from kv_b of the scaled latent; k_pe is
            # NOT scaled).
            c_kv = c_kv * c.mla_scale_kv_lora
        k_pe = ckv_pe[:, Dc:][:, None, :]                 # [T, 1, dr]

        if c.mla_rope_interleaved:
            q_pe, k_pe = apply_rope_interleaved(q_pe, k_pe, positions,
                                                self.cos_sin)
        else:
            from lvllm_tpu.ops.rope import apply_rope
            q_pe, k_pe = apply_rope(q_pe, k_pe, positions, self.cos_sin)
        k_pe = k_pe[:, 0, :]

        # Absorb q_nope into latent space: q_lat[h] = W_uk[h] @ q_nope[h].
        q_lat = jnp.einsum("thd,hdc->thc", q_nope.astype(jnp.float32),
                           attn["w_uk"].astype(jnp.float32))

        if md.dcp_slot_mapping is not None:
            # DCP-MLA: the latent planes are ordinary 1-head K/V rows, so
            # the generic page-interleaved partial-attention + LSE merge
            # serves MLA directly; q = q_lat‖q_pe‖0 dots against the
            # k-plane, the v-plane returns c_kv (sliced below).
            from lvllm_tpu.ops.context_parallel import dcp_write_and_attend
            Dpad = kv_cache.shape[-1]
            pad = Dpad - Dc - dr
            k_plane = jnp.concatenate(
                [c_kv, k_pe] +
                ([jnp.zeros((T, pad), c_kv.dtype)] if pad else []),
                axis=-1)[:, None, :]
            v_plane = jnp.concatenate(
                [c_kv, jnp.zeros((T, Dpad - Dc), c_kv.dtype)],
                axis=-1)[:, None, :]
            q_cat = jnp.concatenate(
                [q_lat.astype(x.dtype), q_pe] +
                ([jnp.zeros((T, H, pad), x.dtype)] if pad else []),
                axis=-1)
            ctx_pad, kv_cache = dcp_write_and_attend(
                q_cat, k_plane, v_plane, kv_cache, md.block_table,
                positions, md.query_start_loc, md.dcp_slot_mapping,
                self.mesh, self.scale)
            ctx = ctx_pad[..., :Dc]                       # [T, H, Dc]
        else:
            kv_cache = write_mla_cache(kv_cache, c_kv, k_pe,
                                       md.slot_mapping)
            ctx = mla_attention(
                q_lat.astype(x.dtype), q_pe, kv_cache, md.block_table,
                md.query_start_loc, md.seq_lens, scale=self.scale,
                kv_lora_rank=Dc)                          # [T, H, Dc]
        out = jnp.einsum("thc,hvc->thv", ctx.astype(jnp.float32),
                         attn["w_uv"].astype(jnp.float32))
        out = out.reshape(T, H * dv).astype(x.dtype)
        out = out @ attn["o_proj"]["kernel"]
        return out, kv_cache

    # ---- weight loading ----------------------------------------------------

    # Mistral-Large-3 checkpoints are DeepseekV3 math under mistral-format
    # names (reference: models/mistral_large_3.py remapping table).
    _MISTRAL_REMAP = [
        (re.compile(r"layers\.(\d+)\.attention_norm\.weight"),
         r"model.layers.\1.input_layernorm.weight"),
        (re.compile(r"layers\.(\d+)\.attention\.wq_a\.(\w+)"),
         r"model.layers.\1.self_attn.q_a_proj.\2"),
        (re.compile(r"layers\.(\d+)\.attention\.q_a_norm\.weight"),
         r"model.layers.\1.self_attn.q_a_layernorm.weight"),
        (re.compile(r"layers\.(\d+)\.attention\.wq_b\.(\w+)"),
         r"model.layers.\1.self_attn.q_b_proj.\2"),
        (re.compile(r"layers\.(\d+)\.attention\.wq\.(\w+)"),
         r"model.layers.\1.self_attn.q_proj.\2"),
        (re.compile(r"layers\.(\d+)\.attention\.wkv_a_with_mqa\.(\w+)"),
         r"model.layers.\1.self_attn.kv_a_proj_with_mqa.\2"),
        (re.compile(r"layers\.(\d+)\.attention\.kv_a_norm\.weight"),
         r"model.layers.\1.self_attn.kv_a_layernorm.weight"),
        (re.compile(r"layers\.(\d+)\.attention\.wkv_b\.(\w+)"),
         r"model.layers.\1.self_attn.kv_b_proj.\2"),
        (re.compile(r"layers\.(\d+)\.attention\.wo\.(\w+)"),
         r"model.layers.\1.self_attn.o_proj.\2"),
        (re.compile(r"layers\.(\d+)\.ffn_norm\.weight"),
         r"model.layers.\1.post_attention_layernorm.weight"),
        (re.compile(r"layers\.(\d+)\.feed_forward\.w1\.(\w+)"),
         r"model.layers.\1.mlp.gate_proj.\2"),
        (re.compile(r"layers\.(\d+)\.feed_forward\.w2\.(\w+)"),
         r"model.layers.\1.mlp.down_proj.\2"),
        (re.compile(r"layers\.(\d+)\.feed_forward\.w3\.(\w+)"),
         r"model.layers.\1.mlp.up_proj.\2"),
        (re.compile(r"layers\.(\d+)\.gate\.weight"),
         r"model.layers.\1.mlp.gate.weight"),
        (re.compile(r"layers\.(\d+)\.gate\.bias"),
         r"model.layers.\1.mlp.gate.e_score_correction_bias"),
        (re.compile(r"layers\.(\d+)\.shared_experts\.w1\.(\w+)"),
         r"model.layers.\1.mlp.shared_experts.gate_proj.\2"),
        (re.compile(r"layers\.(\d+)\.shared_experts\.w2\.(\w+)"),
         r"model.layers.\1.mlp.shared_experts.down_proj.\2"),
        (re.compile(r"layers\.(\d+)\.shared_experts\.w3\.(\w+)"),
         r"model.layers.\1.mlp.shared_experts.up_proj.\2"),
        (re.compile(r"layers\.(\d+)\.experts\.(\d+)\.w1\.(\w+)"),
         r"model.layers.\1.mlp.experts.\2.gate_proj.\3"),
        (re.compile(r"layers\.(\d+)\.experts\.(\d+)\.w2\.(\w+)"),
         r"model.layers.\1.mlp.experts.\2.down_proj.\3"),
        (re.compile(r"layers\.(\d+)\.experts\.(\d+)\.w3\.(\w+)"),
         r"model.layers.\1.mlp.experts.\2.up_proj.\3"),
        (re.compile(r"norm\.weight"), "model.norm.weight"),
        (re.compile(r"tok_embeddings\.weight"),
         "model.embed_tokens.weight"),
        (re.compile(r"output\.weight"), "lm_head.weight"),
    ]

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]) -> Params:
        c = self.config
        H = c.num_attention_heads
        dn, dv = c.qk_nope_head_dim, c.v_head_dim

        if c.architecture == "MistralLarge3ForCausalLM":
            def remap_mistral(stream):
                for name, w in stream:
                    for pat, repl in self._MISTRAL_REMAP:
                        if pat.fullmatch(name):
                            name = pat.sub(repl, name)
                            break
                    yield name, w
            weights = remap_mistral(weights)

        def translate():
            for name, w in weights:
                stripped = name.removeprefix("model.")
                m = re.match(r"layers\.(\d+)\.self_attn\.(.+)", stripped)
                if m is None:
                    yield name, w
                    continue
                i, rest = m.group(1), m.group(2)
                if rest == "kv_b_proj.weight":
                    # [H*(dn+dv), Dc] → absorbed w_uk [H, dn, Dc] and
                    # w_uv [H, dv, Dc].
                    wb = w.reshape(H, dn + dv, -1)
                    self._pending.setdefault(int(i), {})["w_uk"] = \
                        wb[:, :dn, :]
                    self._pending[int(i)]["w_uv"] = wb[:, dn:, :]
                elif rest == "kv_a_proj_with_mqa.weight":
                    yield f"model.layers.{i}.self_attn.__kv_a__", w
                elif rest == "kv_a_layernorm.weight":
                    yield f"model.layers.{i}.self_attn.__kv_a_norm__", w
                elif rest == "q_a_layernorm.weight":
                    yield f"model.layers.{i}.self_attn.__q_a_norm__", w
                elif rest in ("q_proj.weight", "q_a_proj.weight",
                              "q_b_proj.weight", "o_proj.weight"):
                    yield f"model.layers.{i}.self_attn.__{rest}__", w
                else:
                    yield name, w

        self._pending: Dict[int, Dict[str, np.ndarray]] = {}
        params = None
        # Base loader handles embed/norm/mlp/moe; attention tensors tagged
        # __*__ are collected and placed below.
        tagged: Dict[Tuple[int, str], np.ndarray] = {}

        def filter_stream():
            for name, w in translate():
                m = re.match(r"model\.layers\.(\d+)\.self_attn\.__(.+)__",
                             name)
                if m:
                    tagged[(int(m.group(1)), m.group(2))] = w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())

        for i, layer in enumerate(params["layers"]):
            attn = layer["self_attn"]
            def put(key, value, transpose=True):
                arr = jnp.asarray(value.T if transpose else value, self.dtype)
                return arr
            if (i, "q_proj.weight") in tagged:
                attn["q_proj"]["kernel"] = put("q", tagged[(i, "q_proj.weight")])
            if (i, "q_a_proj.weight") in tagged:
                attn["q_a_proj"]["kernel"] = put("qa", tagged[(i, "q_a_proj.weight")])
                attn["q_a_norm"]["weight"] = jnp.asarray(
                    tagged[(i, "q_a_norm")], self.dtype)
                attn["q_b_proj"]["kernel"] = put("qb", tagged[(i, "q_b_proj.weight")])
            attn["kv_a_proj"]["kernel"] = put("kva", tagged[(i, "kv_a")])
            attn["kv_a_norm"]["weight"] = jnp.asarray(
                tagged[(i, "kv_a_norm")], self.dtype)
            attn["o_proj"]["kernel"] = put("o", tagged[(i, "o_proj.weight")])
            pend = self._pending.get(i, {})
            if "w_uk" in pend:
                attn["w_uk"] = jnp.asarray(pend["w_uk"], self.dtype)
                attn["w_uv"] = jnp.asarray(pend["w_uv"], self.dtype)
        return params
