"""CLIP ViT vision tower + multimodal projector (LLaVA-style).

TPU-native counterpart of the reference's vision encoders
(``vllm/model_executor/models/clip.py`` CLIPVisionModel and the LLaVA
family ``llava.py`` multi_modal_projector); numerics follow transformers
``CLIPVisionTransformer`` (pre-LN ViT, quick_gelu MLP, class token,
learned position embeddings).

The encoder is a pure function over a params dict; the patch conv is a
reshape+matmul (each P×P patch flattens onto the MXU — no conv op
needed at stride == kernel). LLaVA's default feature selection taps the
penultimate layer's hidden states (vision_feature_layer = -2) and drops
the CLS token ("default" strategy).
"""

import re
from typing import Tuple, Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _layer_norm(x, w, b, eps=1e-5):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_vision_encode(params: Dict[str, Any], pixel_values: jax.Array,
                       patch_size: int, num_heads: int,
                       feature_layer: int = -2) -> jax.Array:
    """pixel_values [B, 3, S, S] → patch features [B, N_patches, D]
    (CLS dropped; hidden states taken after ``feature_layer`` blocks)."""
    B, C, S, _ = pixel_values.shape
    P = patch_size
    G = S // P
    x = pixel_values.astype(jnp.float32)
    # Patchify: [B, C, G, P, G, P] → [B, G*G, C*P*P] matching the conv
    # kernel flattened as [D, C*P*P].
    x = x.reshape(B, C, G, P, G, P)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, G * G, C * P * P)
    patches = x @ params["patch_embedding"].reshape(
        params["patch_embedding"].shape[0], -1).T          # [B, N, D]
    D = patches.shape[-1]
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, D))
    h = jnp.concatenate([cls, patches], axis=1)             # [B, 1+N, D]
    h = h + params["position_embedding"][None]
    h = _layer_norm(h, params["pre_layernorm"]["weight"],
                    params["pre_layernorm"]["bias"])

    layers: List[Dict[str, Any]] = params["layers"]
    n_run = len(layers) + 1 + feature_layer if feature_layer < 0 \
        else feature_layer
    T = h.shape[1]
    Hd = D // num_heads
    scale = Hd ** -0.5
    for lp in layers[:n_run]:
        res = h
        h = _layer_norm(h, lp["layer_norm1"]["weight"],
                        lp["layer_norm1"]["bias"])
        q = (h @ lp["q_proj"]["kernel"] + lp["q_proj"]["bias"]) * scale
        k = h @ lp["k_proj"]["kernel"] + lp["k_proj"]["bias"]
        v = h @ lp["v_proj"]["kernel"] + lp["v_proj"]["bias"]
        q = q.reshape(B, T, num_heads, Hd)
        k = k.reshape(B, T, num_heads, Hd)
        v = v.reshape(B, T, num_heads, Hd)
        s = jnp.einsum("bthd,bshd->bhts", q, k)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, D)
        h = res + (o @ lp["out_proj"]["kernel"] + lp["out_proj"]["bias"])
        res = h
        h = _layer_norm(h, lp["layer_norm2"]["weight"],
                        lp["layer_norm2"]["bias"])
        h = _quick_gelu(h @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
        h = res + (h @ lp["fc2"]["kernel"] + lp["fc2"]["bias"])
    return h[:, 1:, :]                                      # drop CLS


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _siglip_blocks(params: Dict[str, Any], h: jax.Array,
                   num_heads: int, eps: float) -> jax.Array:
    """Pre-LN SigLIP/SigLIP2 encoder blocks over [B, T, D]."""
    B, T, D = h.shape
    Hd = D // num_heads
    scale = Hd ** -0.5
    for lp in params["layers"]:
        res = h
        h = _layer_norm(h, lp["layer_norm1"]["weight"],
                        lp["layer_norm1"]["bias"], eps)
        q = (h @ lp["q_proj"]["kernel"] + lp["q_proj"]["bias"]) * scale
        k = h @ lp["k_proj"]["kernel"] + lp["k_proj"]["bias"]
        v = h @ lp["v_proj"]["kernel"] + lp["v_proj"]["bias"]
        q = q.reshape(B, T, num_heads, Hd)
        k = k.reshape(B, T, num_heads, Hd)
        v = v.reshape(B, T, num_heads, Hd)
        s = jnp.einsum("bthd,bshd->bhts", q, k)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, D)
        h = res + (o @ lp["out_proj"]["kernel"] + lp["out_proj"]["bias"])
        res = h
        h = _layer_norm(h, lp["layer_norm2"]["weight"],
                        lp["layer_norm2"]["bias"], eps)
        h = _gelu_tanh(h @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
        h = res + (h @ lp["fc2"]["kernel"] + lp["fc2"]["bias"])
    return h


def patchify_chw(pixel_values, patch_size: int):
    """[B, C, S, S] -> ([B, gh*gw, P*P*C], (gh, gw)) in the SigLIP2 naflex
    processor layout (HWC patches in raster order;
    image_processing_siglip2.convert_image_to_patches). jnp-native so it
    traces inside the runner's jitted encode."""
    x = jnp.asarray(pixel_values)
    B, C, H, W = x.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = jnp.transpose(x, (0, 2, 3, 1))               # BHWC
    x = x.reshape(B, gh, P, gw, P, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, gh * gw, P * P * C), (gh, gw)


def siglip2_vision_encode(params: Dict[str, Any], patches: jax.Array,
                          spatial_shape: Tuple[int, int], num_heads: int,
                          eps: float = 1e-6,
                          post_layernorm: bool = True) -> jax.Array:
    """SigLIP2 naflex tower (HF ``Siglip2VisionTransformer``): LINEAR
    patch embedding over pre-patchified inputs [B, L, C*P*P] + learned
    position embeddings bilinearly resized to the image's patch grid,
    then the shared pre-LN blocks. All images in the batch share one
    spatial shape here (uniform-resolution serving path)."""
    h = patches.astype(jnp.float32) @ params["patch_embedding"].T \
        + params["patch_bias"]
    pos = params["position_embedding"]
    P0 = int(round(pos.shape[0] ** 0.5))
    gh, gw = spatial_shape
    grid = pos.reshape(P0, P0, -1)
    if (gh, gw) != (P0, P0):
        grid = jax.image.resize(grid, (gh, gw, grid.shape[-1]),
                                method="bilinear")
    h = h + grid.reshape(1, gh * gw, -1)
    h = _siglip_blocks(params, h, num_heads, eps)
    if not post_layernorm:
        return h
    return _layer_norm(h, params["post_layernorm"]["weight"],
                       params["post_layernorm"]["bias"], eps)


def siglip_vision_encode(params: Dict[str, Any], pixel_values: jax.Array,
                         patch_size: int, num_heads: int,
                         eps: float = 1e-6,
                         post_layernorm: bool = True) -> jax.Array:
    """SigLIP vision tower (HF ``SiglipVisionTransformer``): patch conv with
    bias, learned position embeddings, NO class token, pre-LN blocks with
    gelu_pytorch_tanh MLPs, and a final post layernorm. Returns the full
    patch sequence [B, N, D] (reference:
    ``vllm/model_executor/models/siglip.py``)."""
    B, C, S, _ = pixel_values.shape
    P = patch_size
    G = S // P
    x = pixel_values.astype(jnp.float32)
    x = x.reshape(B, C, G, P, G, P)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, G * G, C * P * P)
    h = x @ params["patch_embedding"].reshape(
        params["patch_embedding"].shape[0], -1).T
    h = h + params["patch_bias"]
    D = h.shape[-1]
    h = h + params["position_embedding"][None]

    h = _siglip_blocks(params, h, num_heads, eps)
    if not post_layernorm:
        # vision_feature_layer = -1 families (AyaVision) read the raw
        # last encoder layer, before the tower's post layernorm.
        return h
    return _layer_norm(h, params["post_layernorm"]["weight"],
                       params["post_layernorm"]["bias"], eps)


def init_siglip_params(rng: np.random.Generator, hidden: int,
                       intermediate: int, num_layers: int, image_size: int,
                       patch_size: int, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init (dummy load format) matching the HF SigLIP structure."""
    n_pos = (image_size // patch_size) ** 2

    def dense(shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(size=shape) * scale, dtype)

    def ln(n=hidden):
        return {"weight": jnp.ones((n,), dtype),
                "bias": jnp.zeros((n,), dtype)}

    layers = []
    for _ in range(num_layers):
        layers.append({
            "layer_norm1": ln(), "layer_norm2": ln(),
            "q_proj": {"kernel": dense((hidden, hidden)),
                       "bias": jnp.zeros((hidden,), dtype)},
            "k_proj": {"kernel": dense((hidden, hidden)),
                       "bias": jnp.zeros((hidden,), dtype)},
            "v_proj": {"kernel": dense((hidden, hidden)),
                       "bias": jnp.zeros((hidden,), dtype)},
            "out_proj": {"kernel": dense((hidden, hidden)),
                         "bias": jnp.zeros((hidden,), dtype)},
            "fc1": {"kernel": dense((hidden, intermediate)),
                    "bias": jnp.zeros((intermediate,), dtype)},
            "fc2": {"kernel": dense((intermediate, hidden)),
                    "bias": jnp.zeros((hidden,), dtype)},
        })
    return {
        "patch_embedding": dense((hidden, 3, patch_size, patch_size)),
        "patch_bias": jnp.zeros((hidden,), dtype),
        "position_embedding": dense((n_pos, hidden)),
        "post_layernorm": ln(),
        "layers": layers,
    }


def load_siglip_weights(vision: Dict[str, Any], rest: str,
                        w: np.ndarray) -> bool:
    """Route one HF ``vision_model.``-relative weight into the params tree
    built by :func:`init_siglip_params`. Returns False for keys the MM path
    doesn't use (e.g. the SigLIP attention-pooling head)."""
    m = re.match(r"encoder\.layers\.(\d+)\.(.+)", rest)
    if m:
        i, leaf = int(m.group(1)), m.group(2)
        lp = vision["layers"][i]
        for hf, ours in (("self_attn.q_proj", "q_proj"),
                         ("self_attn.k_proj", "k_proj"),
                         ("self_attn.v_proj", "v_proj"),
                         ("self_attn.out_proj", "out_proj"),
                         ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2"),
                         ("layer_norm1", "layer_norm1"),
                         ("layer_norm2", "layer_norm2")):
            if leaf == hf + ".weight":
                key = "kernel" if "norm" not in ours else "weight"
                lp.setdefault(ours, {})[key] = jnp.asarray(
                    w.T if key == "kernel" else w, jnp.float32)
                return True
            if leaf == hf + ".bias":
                lp.setdefault(ours, {})["bias"] = jnp.asarray(w, jnp.float32)
                return True
        return False
    if rest == "embeddings.patch_embedding.weight":
        vision["patch_embedding"] = jnp.asarray(w, jnp.float32)
    elif rest == "embeddings.patch_embedding.bias":
        vision["patch_bias"] = jnp.asarray(w, jnp.float32)
    elif rest == "embeddings.position_embedding.weight":
        vision["position_embedding"] = jnp.asarray(w, jnp.float32)
    elif rest.startswith("post_layernorm."):
        vision.setdefault("post_layernorm", {})[rest.split(".")[-1]] = \
            jnp.asarray(w, jnp.float32)
    else:
        return False
    return True


def project_image_features(params: Dict[str, Any],
                           features: jax.Array) -> jax.Array:
    """LLaVA multi_modal_projector: [LayerNorm →] linear → gelu → linear.
    The optional pre_norm covers Bee's projector (reference bee.py:111)."""
    if "pre_norm" in params:
        pn = params["pre_norm"]
        features = _layer_norm(features,
                               pn.get("weight", pn.get("kernel")),
                               pn["bias"], eps=1e-6)
    h = features @ params["linear_1"]["kernel"] + params["linear_1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["linear_2"]["kernel"] + params["linear_2"]["bias"]


def init_vision_params(rng: np.random.Generator, hidden: int,
                       intermediate: int, num_layers: int, image_size: int,
                       patch_size: int, text_hidden: int,
                       dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init (dummy load format) matching the HF structure."""
    n_pos = (image_size // patch_size) ** 2 + 1

    def dense(shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(size=shape) * scale, dtype)

    def ln():
        return {"weight": jnp.ones((hidden,), dtype),
                "bias": jnp.zeros((hidden,), dtype)}

    layers = []
    for _ in range(num_layers):
        layers.append({
            "layer_norm1": ln(), "layer_norm2": ln(),
            "q_proj": {"kernel": dense((hidden, hidden)),
                       "bias": jnp.zeros((hidden,), dtype)},
            "k_proj": {"kernel": dense((hidden, hidden)),
                       "bias": jnp.zeros((hidden,), dtype)},
            "v_proj": {"kernel": dense((hidden, hidden)),
                       "bias": jnp.zeros((hidden,), dtype)},
            "out_proj": {"kernel": dense((hidden, hidden)),
                         "bias": jnp.zeros((hidden,), dtype)},
            "fc1": {"kernel": dense((hidden, intermediate)),
                    "bias": jnp.zeros((intermediate,), dtype)},
            "fc2": {"kernel": dense((intermediate, hidden)),
                    "bias": jnp.zeros((hidden,), dtype)},
        })
    return {
        "patch_embedding": dense((hidden, 3, patch_size, patch_size)),
        "class_embedding": dense((hidden,)),
        "position_embedding": dense((n_pos, hidden)),
        "pre_layernorm": {"weight": jnp.ones((hidden,), dtype),
                          "bias": jnp.zeros((hidden,), dtype)},
        "layers": layers,
        "projector": {
            "linear_1": {"kernel": dense((hidden, text_hidden)),
                         "bias": jnp.zeros((text_hidden,), dtype)},
            "linear_2": {"kernel": dense((text_hidden, text_hidden)),
                         "bias": jnp.zeros((text_hidden,), dtype)},
        },
    }


def pixtral_rope_cos_sin(G: int, head_dim: int,
                         theta: float = 10000.0):
    """Pixtral 2D rotary tables for a G×G patch grid (HF
    PixtralRotaryEmbedding: even-index frequencies take the row stream,
    odd-index the column stream; the half-table duplicates for the
    rotate-half convention). Returns (cos, sin) [G*G, head_dim] f32
    numpy."""
    import numpy as _np
    freqs = 1.0 / (theta ** (_np.arange(0, head_dim, 2,
                                        dtype=_np.float32) / head_dim))
    h = _np.arange(G, dtype=_np.float32)
    w = _np.arange(G, dtype=_np.float32)
    fh = _np.outer(h, freqs[::2])            # [G, head_dim//4]
    fw = _np.outer(w, freqs[1::2])
    emb = _np.concatenate(
        [_np.repeat(fh[:, None, :], G, axis=1),
         _np.repeat(fw[None, :, :], G, axis=0)],
        axis=-1).reshape(G * G, head_dim // 2)
    emb = _np.concatenate([emb, emb], axis=-1)
    return _np.cos(emb), _np.sin(emb)


def pixtral_vision_encode(params: Dict[str, Any], pixel_values: jax.Array,
                          patch_size: int, num_heads: int,
                          hidden_act: str = "silu",
                          rope_theta: float = 10000.0,
                          eps: float = 1e-5) -> jax.Array:
    """Pixtral vision tower (HF ``PixtralVisionModel``): bias-free patch
    conv, pre-RMSNorm, layers of RMSNorm → bias-free attention with 2D
    rope → RMSNorm → gated MLP. Square-tile inputs [B, 3, S, S]; each
    image attends within itself (equivalent to HF's concat +
    block-diagonal mask). Returns [B, N, D]."""
    B, C, S, _ = pixel_values.shape
    P = patch_size
    G = S // P
    x = pixel_values.astype(jnp.float32)
    x = x.reshape(B, C, G, P, G, P)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, G * G, C * P * P)
    h = x @ params["patch_conv"].reshape(
        params["patch_conv"].shape[0], -1).T          # [B, N, D]
    D = h.shape[-1]
    Hd = D // num_heads

    def rms(v, w):
        vf = v.astype(jnp.float32)
        y = vf * jax.lax.rsqrt(
            jnp.mean(jnp.square(vf), axis=-1, keepdims=True) + eps)
        return y * w

    h = rms(h, params["ln_pre"]["weight"])
    import numpy as _np
    cos_np, sin_np = pixtral_rope_cos_sin(G, Hd, rope_theta)
    cos = jnp.asarray(cos_np)[None, :, None, :]       # [1, N, 1, Hd]
    sin = jnp.asarray(sin_np)[None, :, None, :]

    def rot(v):
        half = v.shape[-1] // 2
        rv = jnp.concatenate([-v[..., half:], v[..., :half]], axis=-1)
        return v * cos + rv * sin

    T = h.shape[1]
    scale = Hd ** -0.5
    act = (jax.nn.silu if hidden_act == "silu"
           else (lambda z: jax.nn.gelu(z, approximate=False)))
    for lp in params["layers"]:
        res = h
        hn = rms(h, lp["attention_norm"]["weight"])
        q = rot((hn @ lp["q_proj"]["kernel"]).reshape(B, T, num_heads, Hd))
        k = rot((hn @ lp["k_proj"]["kernel"]).reshape(B, T, num_heads, Hd))
        v = (hn @ lp["v_proj"]["kernel"]).reshape(B, T, num_heads, Hd)
        s = jnp.einsum("bthd,bshd->bhts", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, T, D)
        h = res + o @ lp["o_proj"]["kernel"]
        res = h
        hn = rms(h, lp["ffn_norm"]["weight"])
        g = act(hn @ lp["gate_proj"]["kernel"]) * (hn @ lp["up_proj"]["kernel"])
        h = res + g @ lp["down_proj"]["kernel"]
    return h
