"""Qwen2-Audio: Whisper-architecture audio tower + avg-pool + linear
projector + Qwen2 decoder (audio features spliced at placeholders).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
qwen2_audio.py`` / HF ``modeling_qwen2_audio.py``: the audio tower is a
WhisperEncoder; its states are avg-pooled by 2 along time
(``avg_pooler``, :436), layer-normed, then a single linear maps d_model
into the text space. Unlike Whisper serving (enc-dec cross-attention),
the projected frames are decoder-only inputs at the ``<|AUDIO|>``
placeholder positions — the standard mm-splice path.
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.whisper import (_ln, route_whisper_encoder_weight,
                                      whisper_encoder_states)


@register_model("Qwen2AudioForConditionalGeneration")
class Qwen2AudioModel(Qwen3Model):

    is_multimodal = True
    mm_dynamic = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        ec = config.vision_config or {}    # generic mm-encoder slot
        self.num_mel_bins = ec.get("num_mel_bins", 128)
        self.enc_layers = ec.get("encoder_layers", 4)
        self.enc_heads = ec.get("encoder_attention_heads", 4)
        self.enc_ffn = ec.get("encoder_ffn_dim", 256)
        self.d_model = ec.get("d_model", config.hidden_size)
        self.max_source_positions = ec.get("max_source_positions", 1500)

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        """mm_data: input_features [B, n_mels, T] log-mel. Returns
        projected frames [B * ceil(S/2), H] in placeholder order
        (S = T // 2 conv frames, halved again by the avg pool)."""
        feats = jnp.asarray(np.asarray(mm_data["input_features"],
                                       np.float32))
        if feats.ndim == 2:
            feats = feats[None]
        ep = params["audio"]
        h = whisper_encoder_states(ep, feats, self.enc_heads)
        B, S, D = h.shape
        # HF avg_pooler: AvgPool1d(2, stride=2) over time (drops an odd
        # tail frame).
        S2 = S // 2
        h = h[:, :S2 * 2].reshape(B, S2, 2, D).mean(axis=2)
        h = _ln(h, ep["layer_norm"])
        h = h @ params["audio"]["projector"]["kernel"] + \
            params["audio"]["projector"]["bias"]
        return np.asarray(h.reshape(B * S2, -1), np.float32)

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(787 + self.config.seed)
        D = self.d_model
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def lnn(n=D):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        layers = []
        for _ in range(self.enc_layers):
            layers.append({
                "self_attn_layer_norm": lnn(),
                "final_layer_norm": lnn(),
                "q_proj": {"kernel": dense((D, D)),
                           "bias": jnp.zeros((D,), jnp.float32)},
                "k_proj": {"kernel": dense((D, D))},
                "v_proj": {"kernel": dense((D, D)),
                           "bias": jnp.zeros((D,), jnp.float32)},
                "out_proj": {"kernel": dense((D, D)),
                             "bias": jnp.zeros((D,), jnp.float32)},
                "fc1": {"kernel": dense((D, self.enc_ffn)),
                        "bias": jnp.zeros((self.enc_ffn,), jnp.float32)},
                "fc2": {"kernel": dense((self.enc_ffn, D)),
                        "bias": jnp.zeros((D,), jnp.float32)},
            })
        params["audio"] = {
            "conv1": {"kernel": dense((D, self.num_mel_bins, 3)),
                      "bias": jnp.zeros((D,), jnp.float32)},
            "conv2": {"kernel": dense((D, D, 3)),
                      "bias": jnp.zeros((D,), jnp.float32)},
            "pos_embed": dense((self.max_source_positions, D)),
            "layers": layers,
            "layer_norm": lnn(),
            "projector": {"kernel": dense((D, H)),
                          "bias": jnp.zeros((H,), jnp.float32)},
        }
        return params

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        audio: Dict[str, Any] = {"layers": [
            {} for _ in range(self.enc_layers)]}

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("audio_tower."):
                    route_whisper_encoder_weight(
                        audio, name.removeprefix("audio_tower."), w)
                elif name == "multi_modal_projector.linear.weight":
                    audio.setdefault("projector", {})["kernel"] = \
                        jnp.asarray(np.ascontiguousarray(w.T), jnp.float32)
                elif name == "multi_modal_projector.linear.bias":
                    audio.setdefault("projector", {})["bias"] = \
                        jnp.asarray(w, jnp.float32)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["audio"] = audio
        return params
