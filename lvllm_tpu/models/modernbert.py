"""ModernBERT encoder family (embeddings + classification).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
modernbert.py`` (ModernBertModel, ModernBertForSequenceClassification) /
HF ``modeling_modernbert.py``: pre-norm encoder with RoPE (no absolute
positions), alternating GLOBAL attention (every
``global_attn_every_n_layers``-th layer, rope theta 160k) and LOCAL
sliding-window attention (theta 10k, window = local_attention // 2 per
side), GeGLU MLP (``act(Wi_first_half) * Wi_second_half``), layer 0's
attention norm is Identity. Bidirectional within each ragged segment —
serves the embedding/score paths like bert.py.
"""

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.bert import BertModel
from lvllm_tpu.models.model_base import Params
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.ops.rope import apply_rope, compute_cos_sin_cache


class ModernBertModel(BertModel):

    is_encoder_only = True
    default_pooling = "cls"
    is_classifier = False
    token_level = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        self.global_every = int(getattr(
            c, "global_attn_every_n_layers", 3) or 3)
        self.window = int(getattr(c, "local_attention", 128) or 128) // 2
        self.cos_sin_global = compute_cos_sin_cache(
            self.head_dim, c.max_position_embeddings,
            getattr(c, "global_rope_theta", 160000.0), None,
            dtype=jnp.float32)
        self.cos_sin_local = compute_cos_sin_cache(
            self.head_dim, c.max_position_embeddings,
            getattr(c, "local_rope_theta", 10000.0), None,
            dtype=jnp.float32)

    def init_params(self, rng) -> Params:
        c = self.config
        seed = rng if isinstance(rng, int) else 0
        nprng = np.random.default_rng(seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        H, D = c.hidden_size, self.head_dim
        I = c.intermediate_size
        params: Params = {
            "embed": {"weight": dense((c.vocab_size, H))},
            "embed_norm": {"weight": jnp.ones((H,), self.dtype)},
            "final_norm": {"weight": jnp.ones((H,), self.dtype)},
            "layers": [],
        }
        for i in range(c.num_hidden_layers):
            layer = {
                "wqkv": {"kernel": dense((H, 3 * c.num_attention_heads
                                          * D))},
                "wo": {"kernel": dense((c.num_attention_heads * D, H))},
                "mlp_norm": {"weight": jnp.ones((H,), self.dtype)},
                "wi": {"kernel": dense((H, 2 * I))},
                "wo_mlp": {"kernel": dense((I, H))},
            }
            if i != 0:
                layer["attn_norm"] = {"weight": jnp.ones((H,), self.dtype)}
            params["layers"].append(layer)
        if self.is_classifier:
            n = max(int(getattr(c, "num_labels", 2) or 2), 1)
            params["head_dense"] = {"kernel": dense((H, H))}
            params["head_norm"] = {"weight": jnp.ones((H,), self.dtype)}
            params["classifier"] = {"kernel": dense((H, n)),
                                    "bias": jnp.zeros((n,), self.dtype)}
        return params

    def _norm(self, node, x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.square(xf - mu).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.config.rms_norm_eps)
        return (y * node["weight"].astype(jnp.float32)).astype(x.dtype)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_metadata, **_):
        c = self.config
        md = attn_metadata
        T = input_ids.shape[0]
        x = params["embed"]["weight"][input_ids].astype(self.dtype)
        x = self._norm(params["embed_norm"], x)

        qsl = md.query_start_loc
        R = md.seq_lens.shape[0]
        tok = jnp.arange(T, dtype=jnp.int32)
        req = jnp.clip(jnp.searchsorted(qsl, tok, side="right") - 1,
                       0, R - 1)
        valid = tok < qsl[-1]
        same = (req[:, None] == req[None, :]) & valid[None, :] & \
            valid[:, None]
        same = same | (tok[:, None] == tok[None, :])
        # Local layers: |pos_i - pos_j| <= window, within the segment.
        dist = jnp.abs(positions[:, None].astype(jnp.int32)
                       - positions[None, :].astype(jnp.int32))
        local_mask = same & (dist <= self.window)

        Hq, D = c.num_attention_heads, self.head_dim
        for i, lp in enumerate(params["layers"]):
            is_global = (i % self.global_every) == 0
            h = self._norm(lp["attn_norm"], x) if "attn_norm" in lp else x
            qkv = (h @ lp["wqkv"]["kernel"]).reshape(T, 3, Hq, D)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            cs = self.cos_sin_global if is_global else self.cos_sin_local
            q, k = apply_rope(q, k, positions, cs)
            mask = same if is_global else local_mask
            scores = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                                k.astype(jnp.float32)) * self.scale
            scores = jnp.where(mask[None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("hts,shd->thd", probs,
                             v.astype(jnp.float32)).astype(self.dtype)
            x = x + out.reshape(T, Hq * D) @ lp["wo"]["kernel"]

            h = self._norm(lp["mlp_norm"], x)
            wi = h @ lp["wi"]["kernel"]
            inp, gate = jnp.split(wi, 2, axis=-1)
            y = (jax.nn.gelu(inp.astype(jnp.float32), approximate=False)
                 * gate.astype(jnp.float32)).astype(self.dtype)
            x = x + y @ lp["wo_mlp"]["kernel"]
        return self._norm(params["final_norm"], x), kv_caches

    def classify(self, params, hidden, qsl):
        if self.token_level:
            h = hidden
        else:
            pooling = getattr(self.config, "classifier_pooling", "cls")
            if pooling == "mean":
                # mean over each segment (HF attention-mask mean).
                T = hidden.shape[0]
                R = qsl.shape[0] - 1
                tok = jnp.arange(T, dtype=jnp.int32)
                req = jnp.clip(
                    jnp.searchsorted(qsl, tok, side="right") - 1, 0, R - 1)
                in_seg = (tok >= qsl[req]) & (tok < qsl[req + 1])
                oh = ((req[:, None] == jnp.arange(R)[None, :])
                      & in_seg[:, None]).astype(jnp.float32)
                h = (jnp.einsum("th,tr->rh", hidden.astype(jnp.float32),
                                oh) / jnp.maximum(oh.sum(0), 1)[:, None]
                     ).astype(self.dtype)
            else:
                h = hidden[qsl[:-1]]
        h = jax.nn.gelu((h @ params["head_dense"]["kernel"]
                         ).astype(jnp.float32), approximate=False)
        h = self._norm(params["head_norm"], h.astype(self.dtype))
        return (h @ params["classifier"]["kernel"]
                + params["classifier"]["bias"]).astype(jnp.float32)

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        params = self.init_params(0)
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), self.dtype)  # noqa: E731
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731
        for name, w in weights:
            name = name.removeprefix("model.").removeprefix("modernbert.")
            if name == "embeddings.tok_embeddings.weight":
                params["embed"]["weight"] = v(w)
            elif name == "embeddings.norm.weight":
                params["embed_norm"]["weight"] = v(w)
            elif name == "final_norm.weight":
                params["final_norm"]["weight"] = v(w)
            elif name == "head.dense.weight":
                if "head_dense" in params:
                    params["head_dense"]["kernel"] = t(w)
            elif name == "head.norm.weight":
                if "head_norm" in params:
                    params["head_norm"]["weight"] = v(w)
            elif name == "classifier.weight":
                if "classifier" in params:
                    params["classifier"]["kernel"] = t(w)
            elif name == "classifier.bias":
                if "classifier" in params:
                    params["classifier"]["bias"] = v(w)
            elif name.startswith("layers."):
                parts = name.split(".")
                i = int(parts[1])
                if i >= len(params["layers"]):
                    continue
                layer = params["layers"][i]
                rest = ".".join(parts[2:])
                if rest == "attn.Wqkv.weight":
                    layer["wqkv"]["kernel"] = t(w)
                elif rest == "attn.Wo.weight":
                    layer["wo"]["kernel"] = t(w)
                elif rest == "mlp.Wi.weight":
                    layer["wi"]["kernel"] = t(w)
                elif rest == "mlp.Wo.weight":
                    layer["wo_mlp"]["kernel"] = t(w)
                elif rest == "mlp_norm.weight":
                    layer["mlp_norm"]["weight"] = v(w)
                elif rest == "attn_norm.weight" and "attn_norm" in layer:
                    layer["attn_norm"]["weight"] = v(w)
        return params


class ModernBertClassifierModel(ModernBertModel):
    is_classifier = True


class ModernBertTokenClassifierModel(ModernBertClassifierModel):
    token_level = True


register_model("ModernBertModel")(ModernBertModel)
register_model("ModernBertForSequenceClassification")(
    ModernBertClassifierModel)
register_model("ModernBertForTokenClassification")(
    ModernBertTokenClassifierModel)
