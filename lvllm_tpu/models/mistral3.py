"""Mistral3 (Mistral Small 3.1 VLM): Pixtral tower + RMSNorm + 2x2 patch
merger + GELU MLP projector + Mistral decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
mistral3.py`` / HF ``modeling_mistral3.py``: full-sequence Pixtral
features are RMS-normed (text eps), spatially merged
(``spatial_merge_size``² patches unfolded channel-major into one linear
``merging_layer``), then linear_1 → GELU → linear_2 into the text space.
"""

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.llava import LlavaModel
from lvllm_tpu.models.registry import register_model


@register_model("Mistral3ForConditionalGeneration")
class Mistral3Model(LlavaModel):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.is_pixtral = True
        vc = config.vision_config or {}
        self.merge = int(vc.get("spatial_merge_size", 2))

    @property
    def num_image_tokens(self) -> int:
        return (self.image_size // self.patch_size // self.merge) ** 2

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(783 + self.config.seed)
        D = self.v_hidden
        H = self.config.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        params["vision"]["projector"] = {
            "norm": {"weight": jnp.ones((D,), jnp.float32)},
            "merging_layer": {"kernel": dense((D * self.merge ** 2, D))},
            "linear_1": {"kernel": dense((D, H)),
                         "bias": jnp.zeros((H,), jnp.float32)},
            "linear_2": {"kernel": dense((H, H)),
                         "bias": jnp.zeros((H,), jnp.float32)},
        }
        return params

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        from lvllm_tpu.models.vision import pixtral_vision_encode
        feats = pixtral_vision_encode(
            params["vision"], pixel_values, self.patch_size, self.v_heads,
            hidden_act=self.v_act, rope_theta=self.v_rope_theta)
        proj = params["vision"]["projector"]
        eps = self.config.rms_norm_eps
        x = feats.astype(jnp.float32)
        var = jnp.square(x).mean(-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + eps) * proj["norm"]["weight"]
        B, N, D = x.shape
        g = int(round(N ** 0.5))
        m = self.merge
        # HF Mistral3PatchMerger: F.unfold(kernel=m, stride=m) orders the
        # merged feature channel-major: index = c*m*m + ky*m + kx.
        x = x.reshape(B, g // m, m, g // m, m, D)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
        x = x.reshape(B, (g // m) ** 2, D * m * m)
        x = x @ proj["merging_layer"]["kernel"]
        h = x @ proj["linear_1"]["kernel"]
        if "bias" in proj["linear_1"]:
            h = h + proj["linear_1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ proj["linear_2"]["kernel"]
        if "bias" in proj["linear_2"]:
            h = h + proj["linear_2"]["bias"]
        return h

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        proj: Dict[str, Any] = {}

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("multi_modal_projector."):
                    rest = name.removeprefix("multi_modal_projector.")
                    if rest == "norm.weight":
                        proj["norm"] = {
                            "weight": jnp.asarray(w, jnp.float32)}
                    elif rest == "patch_merger.merging_layer.weight":
                        proj["merging_layer"] = {"kernel": jnp.asarray(
                            np.ascontiguousarray(w.T), jnp.float32)}
                    else:
                        lin, kind = rest.rsplit(".", 1)
                        proj.setdefault(lin, {})[
                            "kernel" if kind == "weight" else "bias"] = \
                            jnp.asarray(
                                np.ascontiguousarray(w.T)
                                if kind == "weight" else w, jnp.float32)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"]["projector"] = proj
        return params


@register_model("LightOnOCRForConditionalGeneration")
class LightOnOCRModel(Mistral3Model):
    """LightOnOCR (reference lightonocr.py:134): Mistral3 math under
    model.vision_encoder. / model.vision_projection. checkpoint
    prefixes."""

    def load_weights(self, weights):
        def rename():
            for name, w in weights:
                if name.startswith("model.vision_encoder."):
                    name = ("vision_tower." +
                            name.removeprefix("model.vision_encoder."))
                elif name.startswith("model.vision_projection."):
                    name = ("multi_modal_projector." + name.removeprefix(
                        "model.vision_projection."))
                yield name, w

        return super().load_weights(rename())
