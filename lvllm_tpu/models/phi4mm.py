"""Phi-4-multimodal: navit-SigLIP vision tower + hd-transform crops,
conformer audio encoder, dual gelu-MLP projectors, Phi-3 text decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
phi4mm.py`` / HF ``modeling_phi4_multimodal.py``:
- Phi4MultimodalImageEmbedding: features from vision hidden layer
  ``feature_layer`` (-2), 2x2 avg-pool token compression, per-image
  global + sub-crop arrangement with learned row-extensor tokens, then
  img_projection_up -> gelu -> img_projection_down;
- Phi4MultimodalAudioModel: mean/variance input norm, Nemo conv
  subsampling (3x stride-2), conformer blocks (0.5-weighted macaron
  FFNs, relative-position attention bias ADDED to a 0/1 mask, causal
  GLU conv module), speech vs vision_speech projector pairs;
- text: Phi-3 fused-qkv decoder (models/phi3.py handles the split).

Numerics note: HF marks the vision/audio encoder attentions
``is_causal=True``; under its default sdpa backend a FULL patch mask
turns the vision tower causal (mask=None + is_causal). The original
model and the reference implementation are non-causal encoders — this
implementation is non-causal, matching HF under eager attention.
"""

import math
import re
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.phi3 import Phi3Model
from lvllm_tpu.models.registry import register_model


def _ln(x, node, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"] \
        + node["bias"]


def _lin(x, node):
    y = x @ node["kernel"]
    if "bias" in node:
        y = y + node["bias"]
    return y


def _mha(x, lp, heads, bias=None, out_key="out_proj"):
    """Biased q/k/v/out multi-head attention over [B, T, D]."""
    B, T, D = x.shape
    hd = D // heads
    q = _lin(x, lp["q_proj"]).reshape(B, T, heads, hd)
    k = _lin(x, lp["k_proj"]).reshape(B, T, heads, hd)
    v = _lin(x, lp["v_proj"]).reshape(B, T, heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, D)
    return _lin(o, lp[out_key])


@register_model("Phi4MultimodalForCausalLM")
class Phi4MultimodalModel(Phi3Model):

    is_multimodal = True
    mm_dynamic = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_intermediate = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 448)
        self.patch_size = vc.get("patch_size", 14)
        self.crop_size = vc.get("crop_size", 448)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.feature_layer = vc.get("feature_layer", -2)
        ac = vc.get("audio") or {}
        self.a_hidden = ac.get("hidden_size", 1024)
        self.a_intermediate = ac.get("intermediate_size", 1536)
        self.a_blocks = ac.get("num_blocks", 24)
        self.a_heads = ac.get("num_attention_heads", 16)
        self.a_input = ac.get("input_size", 80)
        self.a_chunk = ac.get("chunk_size", -1)
        self.a_left = ac.get("left_chunk", 18)
        self.time_reduction = ac.get("time_reduction", 8)
        self.nemo_channels = ac.get("nemo_conv_channels", 1024)
        self.nemo_final = ac.get("nemo_final_size", 10)
        self.a_kernel = ac.get("kernel_size", 3)
        self.a_ext_pw = ac.get("ext_pw_out_channel", 1024)
        self.a_dws_out = ac.get("depthwise_separable_out_channel", 1024)
        self.a_dw_mult = ac.get("depthwise_multiplier", 1)
        self.bias_max_distance = ac.get("bias_max_distance", 1000)
        self.bias_symmetric = ac.get("bias_symmetric", False)
        self.downsample_rate = ac.get("downsample_rate", 1)
        self.audio_token_id = ac.get("audio_token_id", 200011)
        self.image_token_id = vc.get("image_token_id",
                                     config.image_token_id)

    @property
    def mm_token_ids(self) -> Tuple[int, ...]:
        return (self.image_token_id, self.audio_token_id)

    # ---- vision tower ------------------------------------------------------

    def _vision_features(self, vp, pixel_values, patch_mask) -> jax.Array:
        """navit SigLIP: bucketized position ids from the per-crop patch
        mask, pre-LN blocks, features from hidden layer ``feature_layer``
        (no post_layernorm on that tap)."""
        B, C, S, _ = pixel_values.shape
        P = self.patch_size
        g = S // P
        D = self.v_hidden
        nside = self.image_size // self.patch_size
        x = np.asarray(pixel_values, np.float32)
        x = x.reshape(B, C, g, P, g, P)
        x = np.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, g * g,
                                                        C * P * P)
        w = np.asarray(vp["patch_conv"]["kernel"], np.float32)
        h = x @ w.reshape(D, -1).T + np.asarray(vp["patch_conv"]["bias"])
        # Bucketized fractional positions (HF Phi4MultimodalVision
        # Embeddings): each crop's valid patch grid maps onto the
        # pretrained nside x nside table.
        boundaries = np.arange(1 / nside, 1.0, 1 / nside)
        pos_ids = np.zeros((B, g * g), np.int64)
        for b in range(B):
            ph = int(patch_mask[b, :, 0].sum())
            pw = int(patch_mask[b, 0, :].sum())
            fh = np.arange(0, 1 - 1e-6, 1 / ph)
            fw = np.arange(0, 1 - 1e-6, 1 / pw)
            bh = np.searchsorted(boundaries, fh, side="right")
            bw = np.searchsorted(boundaries, fw, side="right")
            ids = (bh[:, None] * nside + bw).reshape(-1)
            flat = patch_mask[b].reshape(-1).astype(bool)
            pos_ids[b, flat] = ids
        h = jnp.asarray(h) + jnp.asarray(
            np.asarray(vp["position_embedding"])[pos_ids])
        key_mask = jnp.asarray(
            np.asarray(patch_mask, bool).reshape(B, g * g))
        attn_bias = jnp.where(key_mask[:, None, None, :], 0.0,
                              -jnp.inf)
        taps = [h]
        for lp in vp["layers"]:
            hn = _ln(h, lp["layer_norm1"], self.v_eps)
            h = h + _mha(hn, lp, self.v_heads, bias=attn_bias)
            hn = _ln(h, lp["layer_norm2"], self.v_eps)
            hn = jax.nn.gelu(_lin(hn, lp["fc1"]), approximate=True)
            h = h + _lin(hn, lp["fc2"])
            taps.append(h)
        return taps[self.feature_layer]

    def _image_rows(self, params, mm_data) -> np.ndarray:
        vp = params["vision"]
        pix = np.asarray(
            mm_data.get("image_pixel_values",
                        mm_data.get("pixel_values")), np.float32)
        if pix.ndim == 4:
            pix = pix[None]
        B, C = pix.shape[:2]
        S = pix.shape[-1]
        g = S // self.patch_size
        sizes = mm_data.get("image_sizes")
        sizes = (np.asarray(sizes).reshape(-1, 2) if sizes is not None
                 else np.tile([S, S], (B, 1)))
        mask = mm_data.get("image_attention_mask")
        mask = (np.asarray(mask, bool) if mask is not None
                else np.ones((B, C, g, g), bool))
        feats = self._vision_features(vp, pix.reshape(B * C, 3, S, S),
                                      mask.reshape(B * C, g, g))
        width = int(math.sqrt(feats.shape[1]))
        f = np.asarray(feats, np.float32).reshape(-1, width, width,
                                                  self.v_hidden)
        if width % 2 != 0:
            f = np.pad(f, ((0, 0), (0, 1), (0, 1), (0, 0)),
                       mode="reflect")
            width += 1
        # 2x2 average-pool token compression.
        f = f.reshape(f.shape[0], width // 2, 2, width // 2, 2,
                      self.v_hidden).mean(axis=(2, 4))
        bfs = width // 2
        f = f.reshape(B, C, bfs * bfs, self.v_hidden)
        sub_ext = np.asarray(vp["sub_img_feature_extensor"],
                             np.float32).reshape(1, 1, self.v_hidden)
        glob_ext = np.asarray(vp["global_img_feature_extensor"],
                              np.float32).reshape(1, self.v_hidden)
        rows = []
        for idx in range(B):
            hr = int(sizes[idx][0]) // self.crop_size
            wr = int(sizes[idx][1]) // self.crop_size
            ar = hr * wr
            glob = f[idx, 0].reshape(bfs, bfs, self.v_hidden)
            glob = np.concatenate(
                [glob, np.broadcast_to(sub_ext,
                                       (bfs, 1, self.v_hidden))],
                axis=1).reshape(-1, self.v_hidden)
            sub = f[idx, 1:1 + ar].reshape(hr, wr, bfs, bfs,
                                           self.v_hidden)
            sub = sub.transpose(0, 2, 1, 3, 4).reshape(
                hr * bfs, wr * bfs, self.v_hidden)
            m = mask[idx, 1:1 + ar, 0::2, 0::2].reshape(
                hr, wr, bfs, bfs).transpose(0, 2, 1, 3).reshape(
                    hr * bfs, wr * bfs)
            uh = int(m[:, 0].sum())
            uw = int(m[0, :].sum())
            sub = sub[:uh, :uw]
            sub = np.concatenate(
                [sub, np.broadcast_to(sub_ext, (uh, 1, self.v_hidden))],
                axis=1).reshape(-1, self.v_hidden)
            rows.append(np.concatenate([sub, glob_ext, glob], axis=0))
        out = jnp.asarray(np.concatenate(rows, axis=0))
        out = jax.nn.gelu(_lin(out, vp["img_projection_up"]),
                          approximate=False)
        return np.asarray(_lin(out, vp["img_projection_down"]),
                          np.float32)

    # ---- audio tower -------------------------------------------------------

    def _conv2d(self, x, node, stride, groups=1):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(node["kernel"]),
            window_strides=(stride, stride),
            padding=[(1, 1), (1, 1)], feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW")) \
            + jnp.asarray(node["bias"])[None, :, None, None]

    def _conv1d(self, x, node, pad, groups=1):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(node["kernel"]),
            window_strides=(1,), padding=[(pad, pad)],
            feature_group_count=groups,
            dimension_numbers=("NCT", "OIT", "NCT")) \
            + jnp.asarray(node["bias"])[None, :, None]

    def _audio_states(self, ap, feats) -> jax.Array:
        x = (jnp.asarray(feats) - jnp.asarray(ap["global_mean"])) \
            * jnp.asarray(ap["global_invstd"])
        # Nemo conv subsampling: stride-2 stages over (time, freq).
        h = x[:, None]                          # [B, 1, T, F]
        h = jax.nn.relu(self._conv2d(h, ap["sub_conv"][0], 2))
        for dw, pw in zip(ap["sub_conv"][1::2], ap["sub_conv"][2::2]):
            h = self._conv2d(h, dw, 2, groups=self.nemo_channels)
            h = jax.nn.relu(
                jax.lax.conv_general_dilated(
                    h, jnp.asarray(pw["kernel"]), (1, 1),
                    [(0, 0), (0, 0)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                + jnp.asarray(pw["bias"])[None, :, None, None])
        B, Cc, T, F = h.shape
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(B, T, Cc * F)
        h = _lin(h, ap["sub_out"])
        # Streaming chunk mask (0/1, ADDED to scores like HF — not -inf)
        # plus the relative-position bias.
        mask01 = jnp.asarray(
            self._streaming_mask(T)[None, None], jnp.float32)
        maxd = self.bias_max_distance
        nb = maxd if self.bias_symmetric else 2 * maxd
        rel = np.arange(T)[None, :] - np.arange(T)[:, None]
        rel = np.clip(rel, -maxd, maxd - 1)
        idx = np.abs(rel) if self.bias_symmetric else rel + nb // 2
        bias = jnp.asarray(np.asarray(ap["bias_values"])[idx])
        bias = jnp.transpose(bias, (2, 0, 1))[None]
        score_bias = mask01 + bias
        for lp in ap["layers"]:
            r = h + 0.5 * self._audio_mlp(h, lp["feed_forward_in"])
            hn = _ln(r, lp["layer_norm_att"])
            h = r + _mha(hn, lp, self.a_heads, bias=score_bias,
                         out_key="o_proj")
            h = h + self._audio_conv(h, lp["conv"])
            h = h + 0.5 * self._audio_mlp(h, lp["feed_forward_out"])
            h = _ln(h, lp["layer_norm"])
        return h

    def _streaming_mask(self, T: int) -> np.ndarray:
        if self.a_chunk <= 0:
            return np.ones((T, T), np.float32)
        starts = np.arange(0, T, self.a_chunk)
        start_pad = np.concatenate([[0], starts])
        end_pad = np.concatenate([starts, [T]])
        seq = np.arange(T)
        chunk_of = np.searchsorted(end_pad, seq, side="right")
        left = np.maximum(chunk_of - self.a_left, 0)
        lo = start_pad[left][:, None]
        hi = end_pad[np.minimum(chunk_of, len(starts))][:, None]
        return ((seq[None, :] >= lo) & (seq[None, :] < hi)
                ).astype(np.float32)

    def _audio_mlp(self, x, node):
        hn = _ln(x, node["layer_norm"])
        up = _lin(hn, node["gate_up_proj"])
        u, g = jnp.split(up, 2, axis=-1)
        return _lin(u * jax.nn.silu(g), node["down_proj"])

    def _audio_conv(self, x, node):
        h = _ln(x, node["layer_norm"])
        h = jnp.transpose(h, (0, 2, 1))
        h = self._conv1d(h, node["glu_conv"], 0)
        C = self.a_ext_pw
        out = h[:, :C] + jnp.asarray(node["glu_b1"]).reshape(1, C, 1)
        gate = h[:, C:] + jnp.asarray(node["glu_b2"]).reshape(1, C, 1)
        h = out * jax.nn.silu(gate)
        h = self._conv1d(h, node["dw_conv"], self.a_kernel - 1,
                         groups=C)
        h = self._conv1d(h, node["pw_conv"], 0)
        if self.a_kernel > 1:
            h = h[:, :, :-(self.a_kernel - 1)]
        h = jax.nn.silu(h)
        h = self._conv1d(h, node["ext_pw_conv"], 0)
        return jnp.transpose(h, (0, 2, 1))

    def _audio_rows(self, params, mm_data,
                    vision_mode: bool) -> np.ndarray:
        ap = params["vision"]["audio"]
        feats = np.asarray(
            mm_data.get("audio_input_features",
                        mm_data.get("input_features")), np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        h = self._audio_states(ap, feats)
        which = "vision_speech" if vision_mode else "speech"
        h = jax.nn.gelu(_lin(h, ap[f"up_proj_for_{which}"]),
                        approximate=False)
        h = np.asarray(_lin(h, ap[f"down_proj_for_{which}"]),
                       np.float32)
        sizes = mm_data.get("audio_embed_sizes")
        sizes = (np.asarray(sizes).reshape(-1).tolist()
                 if sizes is not None else [h.shape[1]] * h.shape[0])
        return np.concatenate(
            [h[i, :sizes[i]] for i in range(h.shape[0])], axis=0)

    # ---- merge -------------------------------------------------------------

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        has_img = (mm_data.get("image_pixel_values") is not None or
                   mm_data.get("pixel_values") is not None)
        has_aud = (mm_data.get("audio_input_features") is not None or
                   mm_data.get("input_features") is not None)
        img = self._image_rows(params, mm_data) if has_img else None
        aud = self._audio_rows(params, mm_data, has_img) \
            if has_aud else None
        ids = mm_data.get("_input_ids")
        if ids is None or img is None or aud is None:
            parts = [p for p in (img, aud) if p is not None]
            return np.concatenate(parts, axis=0)
        ids = np.asarray(ids)
        img_pos = ids == self.image_token_id
        aud_pos = ids == self.audio_token_id
        H = img.shape[-1]
        rows = np.zeros((int(img_pos.sum() + aud_pos.sum()), H),
                        np.float32)
        order = np.where(img_pos | aud_pos)[0]
        is_img = img_pos[order]
        rows[is_img] = img
        rows[~is_img] = aud
        return rows

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(811 + self.config.seed)
        D, I = self.v_hidden, self.v_intermediate
        H = self.config.hidden_size
        P = self.patch_size
        nside = self.image_size // P

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        def lin(i, o):
            return {"kernel": dense((i, o)),
                    "bias": jnp.zeros((o,), jnp.float32)}

        vlayers = []
        for _ in range(self.v_layers):
            vlayers.append({
                "layer_norm1": ln(D), "layer_norm2": ln(D),
                "q_proj": lin(D, D), "k_proj": lin(D, D),
                "v_proj": lin(D, D), "out_proj": lin(D, D),
                "fc1": lin(D, I), "fc2": lin(I, D)})
        A, Ai = self.a_hidden, self.a_intermediate
        Cc = self.nemo_channels
        alayers = []
        for _ in range(self.a_blocks):
            alayers.append({
                "feed_forward_in": {"layer_norm": ln(A),
                                    "gate_up_proj": lin(A, 2 * Ai),
                                    "down_proj": lin(Ai, A)},
                "feed_forward_out": {"layer_norm": ln(A),
                                     "gate_up_proj": lin(A, 2 * Ai),
                                     "down_proj": lin(Ai, A)},
                "layer_norm_att": ln(A), "layer_norm": ln(A),
                "q_proj": lin(A, A), "k_proj": lin(A, A),
                "v_proj": lin(A, A), "o_proj": lin(A, A),
                "conv": {
                    "layer_norm": ln(A),
                    "glu_conv": {"kernel": dense(
                        (2 * self.a_ext_pw, A, 1)),
                        "bias": jnp.zeros((2 * self.a_ext_pw,),
                                          jnp.float32)},
                    "glu_b1": jnp.zeros((self.a_ext_pw,), jnp.float32),
                    "glu_b2": jnp.zeros((self.a_ext_pw,), jnp.float32),
                    "dw_conv": {"kernel": dense(
                        (self.a_ext_pw * self.a_dw_mult, 1,
                         self.a_kernel)),
                        "bias": jnp.zeros(
                            (self.a_ext_pw * self.a_dw_mult,),
                            jnp.float32)},
                    "pw_conv": {"kernel": dense(
                        (self.a_dws_out,
                         self.a_ext_pw * self.a_dw_mult, 1)),
                        "bias": jnp.zeros((self.a_dws_out,),
                                          jnp.float32)},
                    "ext_pw_conv": {"kernel": dense(
                        (self.a_ext_pw, A, 1)),
                        "bias": jnp.zeros((self.a_ext_pw,),
                                          jnp.float32)}}})
        sampling_num = int(math.log2(self.time_reduction))
        sub_conv = [{"kernel": dense((Cc, 1, 3, 3)),
                     "bias": jnp.zeros((Cc,), jnp.float32)}]
        for _ in range(sampling_num - 1):
            sub_conv.append({"kernel": dense((Cc, 1, 3, 3)),
                             "bias": jnp.zeros((Cc,), jnp.float32)})
            sub_conv.append({"kernel": dense((Cc, Cc, 1, 1)),
                             "bias": jnp.zeros((Cc,), jnp.float32)})
        nb = (self.bias_max_distance if self.bias_symmetric
              else 2 * self.bias_max_distance)
        params["vision"] = {
            "patch_conv": {"kernel": dense((D, 3, P, P)),
                           "bias": jnp.zeros((D,), jnp.float32)},
            "position_embedding": dense((nside * nside, D)),
            "layers": vlayers,
            "sub_img_feature_extensor": dense((D,)),
            "global_img_feature_extensor": dense((D,)),
            "img_projection_up": lin(D, H),
            "img_projection_down": lin(H, H),
            "audio": {
                "global_mean": jnp.zeros((self.a_input,), jnp.float32),
                "global_invstd": jnp.ones((self.a_input,), jnp.float32),
                "sub_conv": sub_conv,
                "sub_out": lin(Cc * self.nemo_final, A),
                "bias_values": dense((nb, self.a_heads)),
                "layers": alayers,
                "up_proj_for_speech": lin(
                    A * self.downsample_rate, H),
                "down_proj_for_speech": lin(H, H),
                "up_proj_for_vision_speech": lin(
                    A * self.downsample_rate, H),
                "down_proj_for_vision_speech": lin(H, H),
            },
        }
        return params

    # ---- loading -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        sampling_num = int(math.log2(self.time_reduction))
        vision: Dict[str, Any] = {
            "layers": [{} for _ in range(self.v_layers)],
            "audio": {"layers": [{} for _ in range(self.a_blocks)],
                      "sub_conv": [None] * (2 * sampling_num - 1)}}
        t = lambda a: jnp.asarray(np.ascontiguousarray(np.asarray(a).T),  # noqa: E731
                                  jnp.float32)
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

        def lin_put(node, key, kind, w):
            node.setdefault(key, {})[
                "kernel" if kind == "weight" else "bias"] = \
                t(w) if kind == "weight" else v(w)

        def conv_put(node, key, kind, w):
            node.setdefault(key, {})[
                "kernel" if kind == "weight" else "bias"] = v(w)

        def vis_put(rest, w):
            if rest == "embeddings.patch_embedding.weight":
                conv_put(vision, "patch_conv", "weight", w)
            elif rest == "embeddings.patch_embedding.bias":
                conv_put(vision, "patch_conv", "bias", w)
            elif rest == "embeddings.position_embedding.weight":
                vision["position_embedding"] = v(w)
            elif m := re.match(r"encoder\.layers\.(\d+)\.(.+)", rest):
                lp = vision["layers"][int(m.group(1))]
                leaf = m.group(2)
                if m2 := re.match(r"(layer_norm1|layer_norm2)\."
                                  r"(weight|bias)", leaf):
                    lp.setdefault(m2.group(1), {})[m2.group(2)] = v(w)
                elif m2 := re.match(
                        r"self_attn\.(q_proj|k_proj|v_proj|out_proj)\."
                        r"(weight|bias)", leaf):
                    lin_put(lp, m2.group(1), m2.group(2), w)
                elif m2 := re.match(r"mlp\.(fc1|fc2)\.(weight|bias)",
                                    leaf):
                    lin_put(lp, m2.group(1), m2.group(2), w)
            # head.* (attention-pooling classifier head) is unused by
            # the generation path — dropped.

        def audio_put(rest, w):
            ad = vision["audio"]
            if m := re.match(r"encoder\.encoder_embedding\."
                             r"(global_mean|global_invstd)", rest):
                ad[m.group(1)] = v(w)
            elif m := re.match(r"encoder\.embed\.conv\.(\d+)\."
                               r"(weight|bias)", rest):
                seq = int(m.group(1))
                # Sequential indices skip activations: 0, (2,3), (5,6)…
                slot = 0 if seq == 0 else seq - 1 - (seq - 2) // 3
                if ad["sub_conv"][slot] is None:
                    ad["sub_conv"][slot] = {}
                ad["sub_conv"][slot][
                    "kernel" if m.group(2) == "weight" else "bias"] = v(w)
            elif m := re.match(r"encoder\.embed\.out\.(weight|bias)",
                               rest):
                lin_put(ad, "sub_out", m.group(1), w)
            elif rest == "encoder.relative_attention_bias_layer." \
                    "bias_values.weight":
                ad["bias_values"] = v(w)
            elif m := re.match(r"encoder\.encoders\.(\d+)\.(.+)", rest):
                lp = ad["layers"][int(m.group(1))]
                leaf = m.group(2)
                if m2 := re.match(
                        r"(feed_forward_in|feed_forward_out)\.(.+)",
                        leaf):
                    node = lp.setdefault(m2.group(1), {})
                    sub = m2.group(2)
                    if m3 := re.match(r"layer_norm\.(weight|bias)", sub):
                        node.setdefault("layer_norm", {})[
                            m3.group(1)] = v(w)
                    elif m3 := re.match(
                            r"(gate_up_proj|down_proj)\.(weight|bias)",
                            sub):
                        lin_put(node, m3.group(1), m3.group(2), w)
                elif m2 := re.match(
                        r"self_attn\.(q_proj|k_proj|v_proj|o_proj)\."
                        r"(weight|bias)", leaf):
                    lin_put(lp, m2.group(1), m2.group(2), w)
                elif m2 := re.match(
                        r"(layer_norm_att|layer_norm)\.(weight|bias)",
                        leaf):
                    lp.setdefault(m2.group(1), {})[m2.group(2)] = v(w)
                elif leaf.startswith("conv."):
                    node = lp.setdefault("conv", {})
                    sub = leaf.removeprefix("conv.")
                    if m3 := re.match(r"layer_norm\.(weight|bias)", sub):
                        node.setdefault("layer_norm", {})[
                            m3.group(1)] = v(w)
                    elif m3 := re.match(r"glu\.ext_pw_conv_1d\."
                                        r"(weight|bias)", sub):
                        conv_put(node, "glu_conv", m3.group(1), w)
                    elif m3 := re.match(r"glu\.(b1|b2)", sub):
                        node[f"glu_{m3.group(1)}"] = v(
                            np.asarray(w).reshape(-1))
                    elif m3 := re.match(r"dw_sep_conv_1d\.dw_conv\."
                                        r"(weight|bias)", sub):
                        conv_put(node, "dw_conv", m3.group(1), w)
                    elif m3 := re.match(r"dw_sep_conv_1d\.pw_conv\."
                                        r"(weight|bias)", sub):
                        conv_put(node, "pw_conv", m3.group(1), w)
                    elif m3 := re.match(r"ext_pw_conv_1d\."
                                        r"(weight|bias)", sub):
                        conv_put(node, "ext_pw_conv", m3.group(1), w)
            elif m := re.match(
                    r"(up_proj_for_speech|down_proj_for_speech|"
                    r"up_proj_for_vision_speech|"
                    r"down_proj_for_vision_speech)\.(weight|bias)",
                    rest):
                lin_put(ad, m.group(1), m.group(2), w)

        def filter_stream():
            for name, w in weights:
                inner = name.removeprefix("model.")
                if inner.startswith("embed_tokens_extend."):
                    rest = inner.removeprefix("embed_tokens_extend.")
                    if rest.startswith("image_embed."):
                        rest = rest.removeprefix("image_embed.")
                        if rest.startswith("img_processor."):
                            vis_put(rest.removeprefix("img_processor."),
                                    w)
                        elif m := re.match(
                                r"(img_projection_up|"
                                r"img_projection_down)\.(weight|bias)",
                                rest):
                            lin_put(vision, m.group(1), m.group(2), w)
                        elif m := re.match(
                                r"(sub_img_feature_extensor|"
                                r"global_img_feature_extensor)", rest):
                            vision[m.group(1)] = v(
                                np.asarray(w).reshape(-1))
                    elif rest.startswith("audio_embed."):
                        audio_put(rest.removeprefix("audio_embed."), w)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["vision"] = vision
        return params
