"""Voxtral (Mistral audio): Whisper encoder + frame-stacking GELU MLP
projector + Llama/Mistral decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
voxtral.py`` / HF ``modeling_voxtral.py``: encoder last_hidden_state is
reshaped to rows of ``audio_config.intermediate_size`` (stacking
intermediate/d_model consecutive frames per token,
``get_audio_features:450``), then linear_1 → GELU → linear_2 (bias-free)
into the text space; spliced at the audio placeholders.
"""

from typing import Any, Dict, Iterable, Tuple

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen2_audio import Qwen2AudioModel
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.whisper import _ln, whisper_encoder_states


@register_model("VoxtralForConditionalGeneration")
# Realtime variant = the same model behind the streaming entrypoint
# (reference voxtral_realtime.py:215 subclasses the base model).
@register_model("VoxtralRealtimeGeneration")
class VoxtralModel(Qwen2AudioModel):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        ec = config.vision_config or {}
        # VoxtralEncoderConfig uses generic names (hidden_size /
        # num_hidden_layers / num_attention_heads), not Whisper's.
        self.d_model = ec.get("hidden_size", ec.get("d_model", 32))
        self.enc_layers = ec.get("num_hidden_layers",
                                 ec.get("encoder_layers", 4))
        self.enc_heads = ec.get("num_attention_heads",
                                ec.get("encoder_attention_heads", 4))
        self.enc_ffn = ec.get("intermediate_size",
                              ec.get("encoder_ffn_dim", 4 * self.d_model))
        self.enc_intermediate = self.enc_ffn

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        feats = jnp.asarray(np.asarray(mm_data["input_features"],
                                       np.float32))
        if feats.ndim == 2:
            feats = feats[None]
        ep = params["audio"]
        h = whisper_encoder_states(ep, feats, self.enc_heads)
        h = _ln(h, ep["layer_norm"])              # last_hidden_state
        r = self.enc_intermediate // self.d_model
        B, S, D = h.shape
        h = h.reshape(B * (S // r), r * D)
        proj = params["audio"]["projector"]
        import jax
        h = h @ proj["linear_1"]["kernel"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ proj["linear_2"]["kernel"]
        return np.asarray(h, np.float32)

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(789 + self.config.seed)
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        params["audio"]["projector"] = {
            "linear_1": {"kernel": dense((self.enc_intermediate, H))},
            "linear_2": {"kernel": dense((H, H))},
        }
        return params

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        proj: Dict[str, Any] = {}

        def filter_stream():
            for name, w in weights:
                if name.startswith("multi_modal_projector."):
                    rest = name.removeprefix("multi_modal_projector.")
                    lin, kind = rest.rsplit(".", 1)
                    proj.setdefault(lin, {})[
                        "kernel" if kind == "weight" else "bias"] = \
                        jnp.asarray(
                            np.ascontiguousarray(w.T)
                            if kind == "weight" else w, jnp.float32)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["audio"]["projector"] = proj
        return params
