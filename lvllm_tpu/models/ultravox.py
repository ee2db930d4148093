"""Ultravox (fixie.ai): Whisper encoder + frame-stacking SwiGLU
projector + LLM (audio features spliced at placeholders).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
ultravox.py`` (StackAudioFrames:287, UltravoxFeedForwardProjector:308;
trust-remote family, no transformers oracle in this image): encoder
states are stacked by ``stack_factor`` (zero-padded tail), RMS-normed,
then linear_1 -> MulAndSilu (x * silu(gate), halving the width) ->
ln_mid (v0.5+) -> linear_2 [-> ln_post for v0.4], all bias-free.
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm
from lvllm_tpu.models.qwen2_audio import Qwen2AudioModel
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.whisper import _ln, whisper_encoder_states


@register_model("UltravoxModel")
class UltravoxModel(Qwen2AudioModel):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        ec = config.vision_config or {}
        self.stack_factor = int(ec.get("stack_factor", 8))
        self.projector_ln_mid = bool(ec.get("projector_ln_mid", True))

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        feats = jnp.asarray(np.asarray(mm_data["input_features"],
                                       np.float32))
        if feats.ndim == 2:
            feats = feats[None]
        ep = params["audio"]
        h = whisper_encoder_states(ep, feats, self.enc_heads)
        h = _ln(h, ep["layer_norm"])
        B, T, D = h.shape
        sf = self.stack_factor
        T_pad = -(-T // sf) * sf
        if T_pad != T:
            h = jnp.concatenate(
                [h, jnp.zeros((B, T_pad - T, D), h.dtype)], axis=1)
        h = h.reshape(B, T_pad // sf, D * sf)
        proj = ep["projector"]
        h = rms_norm(h, proj["ln_pre"]["weight"], 1e-6)
        h = h @ proj["linear_1"]["kernel"]
        half = h.shape[-1] // 2
        # MulAndSilu: first half x, second half gate.
        h = h[..., :half] * jax.nn.silu(h[..., half:])
        if self.projector_ln_mid and "ln_mid" in proj:
            h = rms_norm(h, proj["ln_mid"]["weight"], 1e-6)
        h = h @ proj["linear_2"]["kernel"]
        if not self.projector_ln_mid and "ln_post" in proj:
            h = rms_norm(h, proj["ln_post"]["weight"], 1e-6)
        return np.asarray(h.reshape(-1, h.shape[-1]), np.float32)

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(801 + self.config.seed)
        D = self.d_model
        sf = self.stack_factor
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        params["audio"]["projector"] = {
            "ln_pre": {"weight": jnp.ones((D * sf,), jnp.float32)},
            "linear_1": {"kernel": dense((D * sf, 2 * H))},
            "ln_mid": {"weight": jnp.ones((H,), jnp.float32)},
            "linear_2": {"kernel": dense((H, H))},
            "ln_post": {"weight": jnp.ones((H,), jnp.float32)},
        }
        return params

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        proj: Dict[str, Any] = {}

        def filter_stream():
            for name, w in weights:
                if name.startswith("multi_modal_projector.") or \
                        name.startswith("projector."):
                    rest = name.split(".", 1)[1]
                    leaf, kind = rest.rsplit(".", 1)
                    if leaf.startswith("ln"):
                        proj.setdefault(leaf, {})["weight"] = jnp.asarray(
                            w, jnp.float32)
                    else:
                        proj.setdefault(leaf, {})["kernel"] = jnp.asarray(
                            np.ascontiguousarray(np.asarray(w).T),
                            jnp.float32)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["audio"]["projector"] = proj
        return params
