"""Reward-model heads over causal decoders.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
qwen2_rm.py`` (Qwen2ForRewardModel / Qwen2ForProcessRewardModel): the
family decoder plus a ``score`` head — Linear(H, H) → ReLU →
Linear(H, num_labels). The PRM variant scores every token (callers pick
the step-separator positions); the RM variant is read at the final token.
Served through the pooling/classify path (engine/pooling.py), not the
generation scheduler.
"""

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model


class Qwen2RewardModel(Qwen3Model):
    """token_level=False → one score at the last token of each segment."""

    is_classifier = True
    token_level = False
    default_pooling = "last"

    def init_params(self, rng):
        params = super().init_params(rng)
        c = self.config
        n = max(int(getattr(c, "num_labels", 1) or 1), 1)
        H = c.hidden_size
        params["score0"] = {"kernel": jnp.zeros((H, H), self.dtype),
                            "bias": jnp.zeros((H,), self.dtype)}
        params["score2"] = {"kernel": jnp.zeros((H, n), self.dtype),
                            "bias": jnp.zeros((n,), self.dtype)}
        return params

    def classify(self, params, hidden, qsl):
        if self.token_level:
            h = hidden
        else:
            h = hidden[jnp.maximum(qsl[1:] - 1, 0)]      # last token
        h = jnp.maximum((h @ params["score0"]["kernel"]
                         + params["score0"]["bias"]).astype(jnp.float32),
                        0.0).astype(self.dtype)
        return (h @ params["score2"]["kernel"]
                + params["score2"]["bias"]).astype(jnp.float32)

    def load_weights(self, weights):
        head = {}

        def passthrough():
            for name, w in weights:
                if name.startswith("score."):
                    head[name] = w
                else:
                    yield name, w

        params = super().load_weights(passthrough())
        c = self.config
        n = max(int(getattr(c, "num_labels", 1) or 1), 1)
        H = c.hidden_size
        params.setdefault("score0",
                          {"kernel": jnp.zeros((H, H), self.dtype),
                           "bias": jnp.zeros((H,), self.dtype)})
        params.setdefault("score2",
                          {"kernel": jnp.zeros((H, n), self.dtype),
                           "bias": jnp.zeros((n,), self.dtype)})
        t = lambda a: jnp.asarray(np.ascontiguousarray(a.T), self.dtype)  # noqa: E731
        v = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731
        for name, w in head.items():
            if name == "score.0.weight":
                params["score0"]["kernel"] = t(w)
            elif name == "score.0.bias":
                params["score0"]["bias"] = v(w)
            elif name == "score.2.weight":
                params["score2"]["kernel"] = t(w)
            elif name == "score.2.bias":
                params["score2"]["bias"] = v(w)
        return params


class Qwen2ProcessRewardModel(Qwen2RewardModel):
    token_level = True


register_model("Qwen2ForRewardModel")(Qwen2RewardModel)
register_model("Qwen2ForProcessRewardModel")(Qwen2ProcessRewardModel)


class InternLM2RewardModel(Qwen3Model):
    """InternLM2 backbone + single bias-free v_head producing per-token
    values (reference internlm2.py:408-438, tok_pooling ALL)."""

    is_classifier = True
    token_level = True
    default_pooling = "last"

    def init_params(self, rng):
        params = super().init_params(rng)
        params["classifier"] = {"kernel": jnp.zeros(
            (self.config.hidden_size, 1), self.dtype)}
        return params

    def classify(self, params, hidden, qsl):
        return (hidden @ params["classifier"]["kernel"]).astype(
            jnp.float32)

    def load_weights(self, weights):
        head = {}

        def passthrough():
            for name, w in weights:
                if name.startswith("v_head."):
                    head[name] = w
                else:
                    yield name, w

        params = super().load_weights(passthrough())
        params.setdefault("classifier", {"kernel": jnp.zeros(
            (self.config.hidden_size, 1), self.dtype)})
        if "v_head.weight" in head:
            params["classifier"]["kernel"] = jnp.asarray(
                np.ascontiguousarray(head["v_head.weight"].T), self.dtype)
        return params


register_model("InternLM2ForRewardModel")(InternLM2RewardModel)


class _ScoreHeadMixin:
    """Single-linear ``score`` head over a causal backbone, pooled at the
    last token (reference: as_seq_cls_model adapters — HF
    GPT2ForSequenceClassification / JambaForSequenceClassification pool
    the last non-pad token through ``score`` without bias)."""

    is_classifier = True
    token_level = False
    default_pooling = "last"

    def init_params(self, rng):
        params = super().init_params(rng)
        c = self.config
        n = max(int(getattr(c, "num_labels", 2) or 2), 1)
        params["classifier"] = {
            "kernel": jnp.zeros((c.hidden_size, n), self.dtype)}
        return params

    def classify(self, params, hidden, qsl):
        h = hidden[jnp.maximum(qsl[1:] - 1, 0)]          # last token
        return (h @ params["classifier"]["kernel"]).astype(jnp.float32)

    def load_weights(self, weights):
        head = {}

        def passthrough():
            for name, w in weights:
                if name.startswith("score."):
                    head[name] = w
                else:
                    # GPT2ForSequenceClassification prefixes the backbone
                    # with "transformer." (the LM checkpoint doesn't).
                    yield name.removeprefix("transformer."), w

        params = super().load_weights(passthrough())
        c = self.config
        n = max(int(getattr(c, "num_labels", 2) or 2), 1)
        params.setdefault("classifier", {
            "kernel": jnp.zeros((c.hidden_size, n), self.dtype)})
        if "score.weight" in head:
            params["classifier"]["kernel"] = jnp.asarray(
                np.ascontiguousarray(head["score.weight"].T), self.dtype)
        return params


class GPT2SequenceClassifier(_ScoreHeadMixin, Qwen3Model):
    pass


register_model("GPT2ForSequenceClassification")(GPT2SequenceClassifier)


def _register_jamba_classifier():
    from lvllm_tpu.models.mamba1 import JambaModel

    class JambaSequenceClassifier(_ScoreHeadMixin, JambaModel):
        pass

    register_model("JambaForSequenceClassification")(
        JambaSequenceClassifier)


_register_jamba_classifier()
