"""Retrieval-specialized pooling models: SPLADE sparse embeddings,
ColBERT late interaction, and bidirectional-decoder embedders.

Reference: vllm models/bert.py BertSpladeSparseEmbeddingModel (:685),
models/colbert.py (ColBERTModel / ColBERTJinaRobertaModel /
ColBERTModernBertModel), models/llama.py LlamaBidirectional* (:597-606),
models/voyage.py VoyageQwen3BidirectionalEmbedModel, and
models/roberta.py BgeM3EmbeddingModel (:182 — dense embeddings; the
optional sparse_linear.pt / colbert_linear.pt side files are the
reference's secondary weights).
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.models.bert import BertModel
from lvllm_tpu.models.modernbert import ModernBertModel
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.reward import _ScoreHeadMixin

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# SPLADE: BERT + MLM head, pooled as max over log1p(relu(logits)).


class BertSpladeModel(BertModel):
    """BertEmbeddingModel + SPLADE sparse pooling (reference bert.py:685,
    SPLADESparsePooler): logits from the MLM head, activation
    log1p(relu(·)), max over the segment's tokens with the CLS/SEP
    positions masked out. Output is a [V]-sized sparse vector, not
    L2-normalized."""

    pool_normalize = False

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        H = c.hidden_size
        params["mlm"] = {
            "dense": {"kernel": jnp.zeros((H, H), self.dtype),
                      "bias": jnp.zeros((H,), self.dtype)},
            "norm": {"weight": jnp.ones((H,), self.dtype),
                     "bias": jnp.zeros((H,), self.dtype)},
            # decoder weight ties to the input embeddings; only the
            # vocab bias is a free parameter.
            "bias": jnp.zeros((c.vocab_size,), jnp.float32),
        }
        return params

    def pool_hidden(self, params, hidden, input_ids, qsl, seq_lens):
        mlm = params["mlm"]
        x = hidden @ mlm["dense"]["kernel"] + mlm["dense"]["bias"]
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        x = self._ln(mlm["norm"], x.astype(hidden.dtype))
        logits = (x @ params["embed"]["weight"].T).astype(jnp.float32) \
            + mlm["bias"]
        act = jnp.log1p(jax.nn.relu(logits))                  # [T, V]
        T = hidden.shape[0]
        R = seq_lens.shape[0]
        tok = jnp.arange(T)
        req = jnp.clip(jnp.searchsorted(qsl, tok, side="right") - 1,
                       0, R - 1)
        in_seg = (tok >= qsl[req]) & (tok < qsl[req + 1])
        # Mask CLS (first) and SEP (last) positions of each segment.
        interior = in_seg & (tok != qsl[req]) & (tok != qsl[req + 1] - 1)
        act = jnp.where(interior[:, None], act, 0.0)
        one_hot = (req[:, None] == jnp.arange(R)[None, :]) & \
            interior[:, None]
        return jnp.max(
            jnp.where(one_hot.T[:, :, None], act[None], 0.0), axis=1)

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        mlm: Dict[str, np.ndarray] = {}

        def strip():
            for name, w in weights:
                if name.startswith("cls.predictions."):
                    mlm[name.removeprefix("cls.predictions.")] = w
                else:
                    yield name, w

        params = super().load_weights(strip())
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), self.dtype)  # noqa: E731
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731
        node = params["mlm"]
        if "transform.dense.weight" in mlm:
            node["dense"]["kernel"] = t(mlm["transform.dense.weight"])
            node["dense"]["bias"] = v(mlm["transform.dense.bias"])
        if "transform.LayerNorm.weight" in mlm:
            node["norm"]["weight"] = v(mlm["transform.LayerNorm.weight"])
            node["norm"]["bias"] = v(mlm["transform.LayerNorm.bias"])
        for key in ("bias", "decoder.bias"):
            if key in mlm:
                node["bias"] = jnp.asarray(mlm[key], jnp.float32)
                break
        return params


# ---------------------------------------------------------------------------
# ColBERT late interaction: backbone + linear projection, token pooling.


class _ColBERTMixin:
    """Adds the ColBERT projection (reference colbert.py ColBERTMixin):
    intercepts linear.weight / colbert_linear.weight at load and exposes
    token_project for the runner's token-level embed path."""

    token_level_embed = True

    def _colbert_dim(self):
        return self.config.colbert_dim or 128

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        params["colbert"] = {"kernel": jnp.zeros(
            (self.config.hidden_size, self._colbert_dim()), self.dtype)}
        return params

    def token_project(self, params, hidden):
        return hidden @ params["colbert"]["kernel"]

    def load_weights(self, weights) -> Params:
        proj: Dict[str, np.ndarray] = {}

        def strip():
            for name, w in weights:
                if name.endswith(("linear.weight",
                                  "colbert_linear.weight")) and \
                        getattr(w, "ndim", len(getattr(w, "shape", ()))
                                ) == 2:
                    proj["kernel"] = w
                else:
                    yield name, w

        params = super().load_weights(strip())
        if "kernel" in proj:
            params["colbert"] = {"kernel": jnp.asarray(
                np.ascontiguousarray(np.asarray(proj["kernel"]).T),
                self.dtype)}
        return params


class ColBERTModel(_ColBERTMixin, BertModel):
    pass


class ColBERTModernBertModel(_ColBERTMixin, ModernBertModel):
    pass


# ---------------------------------------------------------------------------
# Bidirectional decoder embedders: the whole prompt is a prefix-LM span.


class LlamaBidirectionalModel(Qwen3Model):
    """Llama served as an embedder with the causal mask dropped
    (reference llama.py:603 + LlamaBidirectionalConfig: is_causal=False,
    pooling from config.pooling)."""

    bidirectional = True

    def __init__(self, config):
        super().__init__(config)
        self.default_pooling = config.classifier_pooling or "mean"


class LlamaBidirectionalSequenceClassifier(_ScoreHeadMixin, Qwen3Model):
    bidirectional = True

    def classify(self, params, hidden, qsl):
        if (self.config.classifier_pooling or "mean") != "mean":
            return super().classify(params, hidden, qsl)
        R = qsl.shape[0] - 1
        T = hidden.shape[0]
        tok = jnp.arange(T)
        req = jnp.clip(jnp.searchsorted(qsl, tok, side="right") - 1,
                       0, R - 1)
        in_seg = (tok >= qsl[req]) & (tok < qsl[req + 1])
        one_hot = ((req[:, None] == jnp.arange(R)[None, :]) &
                   in_seg[:, None]).astype(jnp.float32)
        sums = jnp.einsum("th,tr->rh", hidden.astype(jnp.float32),
                          one_hot)
        mean = sums / jnp.maximum(one_hot.sum(0), 1)[:, None]
        return (mean.astype(hidden.dtype) @
                params["classifier"]["kernel"]).astype(jnp.float32)


class VoyageQwen3BidirectionalEmbedModel(Qwen3Model):
    """Qwen3 + bidirectional attention + a linear embedding head applied
    to the pooled hidden (reference voyage.py:21 — the head commutes with
    mean pooling)."""

    bidirectional = True
    default_pooling = "mean"

    def project_pooled(self, params, emb):
        if "embed_head" in params:
            return emb @ params["embed_head"]["kernel"].astype(emb.dtype)
        return emb

    def load_weights(self, weights) -> Params:
        head: Dict[str, np.ndarray] = {}

        def strip():
            for name, w in weights:
                if name in ("linear.weight", "model.linear.weight"):
                    head["kernel"] = w
                else:
                    yield name, w

        params = super().load_weights(strip())
        if "kernel" in head:
            params["embed_head"] = {"kernel": jnp.asarray(
                np.ascontiguousarray(np.asarray(head["kernel"]).T),
                self.dtype)}
        return params


class NomicBertModel(BertModel):
    """nomic-bert-2048 (reference bert_with_rope.py:535): BERT post-norm
    blocks with rotary positions, fused Wqkv, and a swiglu (fc12 = gate,
    fc11 = up) or gelu (fc1) MLP. Names: emb_ln, encoder.layers.N.attn.*,
    norm1/norm2."""

    def load_weights(self, weights) -> Params:
        import re as _re
        params = self.init_params(0)
        t = lambda a: jnp.asarray(  # noqa: E731
            np.ascontiguousarray(np.asarray(a).T), self.dtype)
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731
        gates: Dict[int, Dict[str, np.ndarray]] = {}
        for name, w in weights:
            name = name.removeprefix("bert.")
            if name == "embeddings.word_embeddings.weight":
                params["embed"]["weight"] = v(w)
            elif name == "embeddings.token_type_embeddings.weight":
                if "token_type_embed" in params:
                    params["token_type_embed"]["weight"] = v(w)
            elif m := _re.match(r"emb_ln\.(weight|bias)", name):
                params["embed_norm"][m.group(1)] = v(w)
            elif m := _re.match(r"encoder\.layers\.(\d+)\.(.+)", name):
                i, rest = int(m.group(1)), m.group(2)
                if i >= len(params["layers"]):
                    continue
                layer = params["layers"][i]
                if m2 := _re.match(r"attn\.Wqkv\.(weight|bias)", rest):
                    kind = m2.group(1)
                    parts = np.split(np.asarray(w), 3, axis=0)
                    for j, which in enumerate(("q_proj", "k_proj",
                                               "v_proj")):
                        layer["self_attn"][which][
                            "kernel" if kind == "weight" else "bias"] =                             t(parts[j]) if kind == "weight"                             else v(parts[j])
                elif m2 := _re.match(r"attn\.out_proj\.(weight|bias)",
                                     rest):
                    kind = m2.group(1)
                    layer["self_attn"]["o_proj"][
                        "kernel" if kind == "weight" else "bias"] =                         t(w) if kind == "weight" else v(w)
                elif m2 := _re.match(r"norm1\.(weight|bias)", rest):
                    layer["attn_norm"][m2.group(1)] = v(w)
                elif m2 := _re.match(r"norm2\.(weight|bias)", rest):
                    layer["ffn_norm"][m2.group(1)] = v(w)
                elif m2 := _re.match(r"mlp\.fc(11|12)\.weight", rest):
                    gates.setdefault(i, {})[m2.group(1)] = np.asarray(w)
                elif rest == "mlp.fc1.weight":
                    layer["mlp"]["up"]["kernel"] = t(w)
                elif rest == "mlp.fc1.bias":
                    layer["mlp"]["up"]["bias"] = v(w)
                elif m2 := _re.match(r"mlp\.fc2\.(weight|bias)", rest):
                    kind = m2.group(1)
                    layer["mlp"]["down"][
                        "kernel" if kind == "weight" else "bias"] =                         t(w) if kind == "weight" else v(w)
        for i, parts in gates.items():
            # Fused [gate | up] = [fc12 | fc11] for silu(g) * u.
            layer = params["layers"][i]
            layer["mlp"]["gate_up"] = {"kernel": jnp.asarray(
                np.concatenate([parts["12"], parts["11"]], axis=0).T,
                self.dtype)}
        return params


register_model("NomicBertModel")(NomicBertModel)


register_model("BertSpladeSparseEmbeddingModel")(BertSpladeModel)
# BGE-M3 dense embeddings = XLM-RoBERTa with CLS pooling (reference
# roberta.py:182; the sparse/colbert heads live in side .pt files).
register_model("BgeM3EmbeddingModel")(BertModel)
register_model("HF_ColBERT")(ColBERTModel)
register_model("ColBERTJinaRobertaModel")(ColBERTModel)
register_model("ColBERTModernBertModel")(ColBERTModernBertModel)
register_model("LlamaBidirectionalModel")(LlamaBidirectionalModel)
register_model("LlamaBidirectionalForSequenceClassification")(
    LlamaBidirectionalSequenceClassifier)
register_model("VoyageQwen3BidirectionalEmbedModel")(
    VoyageQwen3BidirectionalEmbedModel)
