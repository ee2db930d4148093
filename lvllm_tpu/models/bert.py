"""Encoder-only embedding model families: BERT / RoBERTa / XLM-R / GTE.

Behavioral reference: ``/root/reference/vllm/model_executor/models/bert.py``
(BertModel → BertEmbeddingModel with pooler), ``roberta.py`` (position ids
offset past padding_idx), ``bert_with_rope.py`` (GTE "NewModel": rotary
positions + gated MLP). These serve the `/v1/embeddings` / LLM.embed path
(PoolingRunner); there is no KV cache or causal decoding — attention is
bidirectional within each ragged segment.

Post-LN transformer (original BERT ordering): x = LN(x + Attn(x));
x = LN(x + FFN(x)).
"""

from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.ops.rope import apply_rope, compute_cos_sin_cache


class BertModel:
    """Bidirectional encoder for embedding serving."""

    is_encoder_only = True
    default_pooling = "cls"
    dcp_compatible = False

    def __init__(self, config: ModelConfig):
        self.config = config
        self.mesh = None
        self.dtype = (jnp.bfloat16 if config.dtype == "bfloat16"
                      else jnp.float32)
        self.head_dim = config.head_dim
        self.scale = self.head_dim ** -0.5
        self.cos_sin = None
        if config.encoder_rope:
            self.cos_sin = compute_cos_sin_cache(
                self.head_dim, config.max_position_embeddings,
                config.rope_theta, config.rope_scaling, dtype=jnp.float32)

    # ---- cache shims (generation machinery expects these; encoder-only
    # models never decode, so the cache is a minimal placeholder) ----------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        from lvllm_tpu.core.kv_cache_spec import FullAttentionSpec
        c = self.config
        return FullAttentionSpec(c.num_key_value_heads, c.head_dim,
                                 kv_dtype)

    def kv_cache_specs(self, kv_dtype):
        return [self.kv_cache_spec(i, kv_dtype)
                for i in range(self.config.num_hidden_layers)]

    def make_layer_cache(self, layer_idx, num_blocks, block_size, dtype,
                         max_reqs):
        return self.kv_cache_spec(layer_idx, dtype).make(
            num_blocks, block_size, max_reqs)

    # ---- init -------------------------------------------------------------

    def init_params(self, rng) -> Params:
        c = self.config
        seed = rng if isinstance(rng, int) else 0
        nprng = np.random.default_rng(seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        def ln():
            return {"weight": jnp.ones((c.hidden_size,), self.dtype),
                    "bias": jnp.zeros((c.hidden_size,), self.dtype)}

        D = self.head_dim
        H = c.hidden_size
        params: Params = {
            "embed": {"weight": dense((c.vocab_size, H))},
            "embed_norm": ln(),
            "layers": [],
        }
        if not c.encoder_rope:
            params["pos_embed"] = {"weight": dense(
                (c.max_position_embeddings, H))}
        if c.type_vocab_size:
            params["token_type_embed"] = {"weight": dense(
                (c.type_vocab_size, H))}
        params["pooler"] = {"kernel": dense((H, H)),
                            "bias": jnp.zeros((H,), self.dtype)}
        for _ in range(c.num_hidden_layers):
            layer: Dict[str, Any] = {
                "self_attn": {
                    "q_proj": {"kernel": dense((H, c.num_attention_heads
                                                * D)),
                               "bias": jnp.zeros(
                                   (c.num_attention_heads * D,),
                                   self.dtype)},
                    "k_proj": {"kernel": dense((H, c.num_attention_heads
                                                * D)),
                               "bias": jnp.zeros(
                                   (c.num_attention_heads * D,),
                                   self.dtype)},
                    "v_proj": {"kernel": dense((H, c.num_attention_heads
                                                * D)),
                               "bias": jnp.zeros(
                                   (c.num_attention_heads * D,),
                                   self.dtype)},
                    "o_proj": {"kernel": dense((c.num_attention_heads * D,
                                                H)),
                               "bias": jnp.zeros((H,), self.dtype)},
                },
                "attn_norm": ln(),
                "ffn_norm": ln(),
            }
            if c.encoder_rope and c.mlp_gated:
                layer["mlp"] = {
                    "gate_up": {"kernel": dense((H,
                                                 2 * c.intermediate_size))},
                    "down": {"kernel": dense((c.intermediate_size, H))},
                }
            else:
                layer["mlp"] = {
                    "up": {"kernel": dense((H, c.intermediate_size)),
                           "bias": jnp.zeros((c.intermediate_size,),
                                             self.dtype)},
                    "down": {"kernel": dense((c.intermediate_size, H)),
                             "bias": jnp.zeros((H,), self.dtype)},
                }
            params["layers"].append(layer)
        return params

    # ---- forward ----------------------------------------------------------

    def _ln(self, node, x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.square(xf - mu).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.config.rms_norm_eps)
        return (y * node["weight"].astype(jnp.float32)
                + node["bias"].astype(jnp.float32)).astype(x.dtype)

    def __call__(self, params, input_ids, positions, kv_caches,
                 attn_metadata: AttentionMetadata, **_):
        """Returns (hidden [T, H], kv_caches untouched). Attention is
        bidirectional within each ragged segment of the batch."""
        c = self.config
        md = attn_metadata
        T = input_ids.shape[0]
        x = params["embed"]["weight"][input_ids].astype(self.dtype)
        if "pos_embed" in params:
            pos = positions + c.position_offset
            x = x + params["pos_embed"]["weight"][pos].astype(self.dtype)
        if "token_type_embed" in params:
            x = x + params["token_type_embed"]["weight"][0].astype(
                self.dtype)
        if "task_type_embed" in params:
            # ERNIE task-type embeddings (modeling_ernie.py:115): ids
            # default to 0 at inference.
            x = x + params["task_type_embed"]["weight"][0].astype(
                self.dtype)
        x = self._ln(params["embed_norm"], x)

        # Segment mask: token i attends j iff same request AND j is a real
        # (non-padding) token.
        qsl = md.query_start_loc
        R = md.seq_lens.shape[0]
        tok = jnp.arange(T, dtype=jnp.int32)
        req = jnp.clip(jnp.searchsorted(qsl, tok, side="right") - 1,
                       0, R - 1)
        valid = tok < qsl[-1]
        same = (req[:, None] == req[None, :]) & valid[None, :] & \
            valid[:, None]
        # Padding rows attend exactly themselves: an all-masked softmax
        # row is NaN, and 0 * NaN through the value contraction would
        # poison real rows in the next layer's K/V.
        same = same | (tok[:, None] == tok[None, :])

        Hq, D = c.num_attention_heads, self.head_dim
        for lp in params["layers"]:
            attn = lp["self_attn"]
            q = (x @ attn["q_proj"]["kernel"] + attn["q_proj"]["bias"]
                 ).reshape(T, Hq, D)
            k = (x @ attn["k_proj"]["kernel"] + attn["k_proj"]["bias"]
                 ).reshape(T, Hq, D)
            v = (x @ attn["v_proj"]["kernel"] + attn["v_proj"]["bias"]
                 ).reshape(T, Hq, D)
            if self.cos_sin is not None:
                q, k = apply_rope(q, k, positions, self.cos_sin)
            scores = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                                k.astype(jnp.float32)) * self.scale
            scores = jnp.where(same[None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("hts,shd->thd", probs,
                             v.astype(jnp.float32)).astype(self.dtype)
            out = out.reshape(T, Hq * D) @ attn["o_proj"]["kernel"] + \
                attn["o_proj"]["bias"]
            x = self._ln(lp["attn_norm"], x + out)

            mlp = lp["mlp"]
            if "gate_up" in mlp:
                h = x @ mlp["gate_up"]["kernel"]
                g, u = jnp.split(h, 2, axis=-1)
                y = (jax.nn.silu(g.astype(jnp.float32)) *
                     u.astype(jnp.float32)).astype(self.dtype) @ \
                    mlp["down"]["kernel"]
            else:
                h = x @ mlp["up"]["kernel"] + mlp["up"]["bias"]
                y = jax.nn.gelu(h.astype(jnp.float32),
                                approximate=False).astype(self.dtype) @ \
                    mlp["down"]["kernel"] + mlp["down"]["bias"]
            x = self._ln(lp["ffn_norm"], x + y)
        return x, kv_caches

    def compute_logits(self, params, hidden):
        raise NotImplementedError("encoder-only model has no LM head")

    # ---- weight loading ---------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        """HF BERT/RoBERTa checkpoint mapping (reference:
        models/bert.py load_weights; roberta.py name prefixes)."""
        c = self.config
        params = self.init_params(0)
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), self.dtype)  # noqa: E731
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731
        for name, w in weights:
            for pref in ("bert.", "roberta.", "new.",
                         "ernie."):
                name = name.removeprefix(pref)
            if name == "embeddings.word_embeddings.weight":
                params["embed"]["weight"] = v(w)
            elif name == "embeddings.position_embeddings.weight":
                if "pos_embed" in params:
                    # RoBERTa tables carry padding_idx+1 leading rows that
                    # position_offset skips at lookup time.
                    params["pos_embed"]["weight"] = v(
                        w[:c.max_position_embeddings])
            elif name == "embeddings.token_type_embeddings.weight":
                if "token_type_embed" in params:
                    params["token_type_embed"]["weight"] = v(w)
            elif name == "embeddings.task_type_embeddings.weight":
                params["task_type_embed"] = {"weight": v(w)}
            elif name.startswith("embeddings.LayerNorm."):
                params["embed_norm"][name.split(".")[-1]] = v(w)
            elif name.startswith("pooler.dense."):
                leaf = name.split(".")[-1]
                params["pooler"]["kernel" if leaf == "weight"
                                 else "bias"] = \
                    t(w) if leaf == "weight" else v(w)
            elif name.startswith("encoder.layer."):
                parts = name.split(".")
                i = int(parts[2])
                if i >= len(params["layers"]):
                    continue
                layer = params["layers"][i]
                rest = ".".join(parts[3:])
                amap = {
                    "attention.self.query": ("self_attn", "q_proj"),
                    "attention.self.key": ("self_attn", "k_proj"),
                    "attention.self.value": ("self_attn", "v_proj"),
                    "attention.output.dense": ("self_attn", "o_proj"),
                    "intermediate.dense": ("mlp", "up"),
                    "output.dense": ("mlp", "down"),
                }
                hit = False
                for hf, (grp, slot) in amap.items():
                    if rest == hf + ".weight":
                        layer[grp][slot]["kernel"] = t(w)
                        hit = True
                    elif rest == hf + ".bias":
                        layer[grp][slot]["bias"] = v(w)
                        hit = True
                    if hit:
                        break
                if not hit:
                    if rest.startswith("attention.output.LayerNorm."):
                        layer["attn_norm"][rest.split(".")[-1]] = v(w)
                    elif rest.startswith("output.LayerNorm."):
                        layer["ffn_norm"][rest.split(".")[-1]] = v(w)
        return params


for _arch in ("BertModel", "BertForMaskedLM", "RobertaModel",
              "RobertaForMaskedLM", "XLMRobertaModel", "CamembertModel",
              "NewModel", "GteModel", "GteNewModel"):
    register_model(_arch)(BertModel)


class BertClassifierModel(BertModel):
    """Sequence/token classification heads over the BERT encoder
    (reference: ``models/bert.py`` BertForSequenceClassification,
    ``roberta.py`` RobertaForSequenceClassification — cross-encoder
    scoring/rerank models like ms-marco MiniLM rerankers).

    Two HF head conventions:
    - BERT: pooler (dense+tanh on CLS) → ``classifier`` linear.
    - RoBERTa: ``classifier.dense`` + tanh on CLS → ``classifier.out_proj``
      (no pooler).
    Token classification applies ``classifier`` per token (no pooler).
    """

    is_classifier = True
    head_style = "bert"        # bert | roberta
    token_level = False

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        n = max(int(getattr(c, "num_labels", 2) or 2), 1)
        H = c.hidden_size
        z = lambda *s: jnp.zeros(s, self.dtype)  # noqa: E731
        if self.head_style == "roberta":
            params["cls_dense"] = {"kernel": z(H, H), "bias": z(H)}
        params["classifier"] = {"kernel": z(H, n), "bias": z(n)}
        return params

    def classify(self, params, hidden, qsl):
        """[T, H] hidden → [R, num_labels] (sequence) or [T, labels]
        (token-level) logits in f32."""
        if self.token_level:
            h = hidden
        else:
            cls = hidden[qsl[:-1]]                       # [R, H]
            if self.head_style == "roberta":
                h = jnp.tanh((cls @ params["cls_dense"]["kernel"]
                              + params["cls_dense"]["bias"]
                              ).astype(jnp.float32)).astype(self.dtype)
            else:
                h = jnp.tanh((cls @ params["pooler"]["kernel"]
                              + params["pooler"]["bias"]
                              ).astype(jnp.float32)).astype(self.dtype)
        return (h @ params["classifier"]["kernel"]
                + params["classifier"]["bias"]).astype(jnp.float32)

    def load_weights(self, weights) -> Params:
        passthrough = []
        head = {}
        for name, w in weights:
            if name.startswith("classifier."):
                head[name] = w
            else:
                passthrough.append((name, w))
        params = super().load_weights(iter(passthrough))
        c = self.config
        n = max(int(getattr(c, "num_labels", 2) or 2), 1)
        H = c.hidden_size
        z = lambda *s: jnp.zeros(s, self.dtype)  # noqa: E731
        if self.head_style == "roberta":
            params.setdefault("cls_dense", {"kernel": z(H, H),
                                            "bias": z(H)})
        params.setdefault("classifier", {"kernel": z(H, n), "bias": z(n)})
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), self.dtype)  # noqa: E731
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731
        for name, w in head.items():
            if name == "classifier.weight":
                params["classifier"]["kernel"] = t(w)
            elif name == "classifier.bias":
                params["classifier"]["bias"] = v(w)
            elif name == "classifier.dense.weight":
                params["cls_dense"]["kernel"] = t(w)
            elif name == "classifier.dense.bias":
                params["cls_dense"]["bias"] = v(w)
            elif name == "classifier.out_proj.weight":
                params["classifier"]["kernel"] = t(w)
            elif name == "classifier.out_proj.bias":
                params["classifier"]["bias"] = v(w)
        return params


class RobertaClassifierModel(BertClassifierModel):
    head_style = "roberta"


class BertTokenClassifierModel(BertClassifierModel):
    token_level = True


register_model("BertForSequenceClassification")(BertClassifierModel)
register_model("BertForTokenClassification")(BertTokenClassifierModel)
register_model("RobertaForSequenceClassification")(RobertaClassifierModel)
register_model("XLMRobertaForSequenceClassification")(
    RobertaClassifierModel)
register_model("CamembertForSequenceClassification")(
    RobertaClassifierModel)
# ERNIE 1.0/2.0/3.0 (HF modeling_ernie.py): BERT structure + optional
# task-type embeddings; GTE-New classifier = NewModel + pooler head
# (reference bert_with_rope.py:679).
register_model("ErnieModel")(BertModel)
register_model("ErnieForSequenceClassification")(BertClassifierModel)
register_model("ErnieForTokenClassification")(BertTokenClassifierModel)
register_model("GteNewForSequenceClassification")(BertClassifierModel)
