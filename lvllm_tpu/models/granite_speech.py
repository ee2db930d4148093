"""IBM GraniteSpeech: CTC conformer encoder + BLIP-2 Q-Former window
projector + Granite decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
granite_speech.py`` / HF ``modeling_granite_speech.py``:
- encoder (GraniteSpeechCTCEncoder): input linear, conformer blocks
  (0.5-weighted macaron FFNs, BLOCK-DIAGONAL attention over
  ``context_size`` chunks with Shaw relative-position logits, GLU conv
  module with eval-mode batch norm, post-LN), and a mid-stack CTC
  re-injection h += out_mid(softmax(out(h))) after layer L/2;
- projector (GraniteSpeechEncoderProjector): windows of
  ``window_size`` frames each cross-attended by
  ``window_size/downsample_rate`` learned queries through a BLIP-2
  Q-Former (models/blip2.py qformer_forward), then a linear into the
  text width;
- decoder: Granite (the audio LoRA shipped with real checkpoints rides
  the generic LoRA machinery, not this module).
"""

import math
import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.blip2 import (_ln, qformer_forward,
                                    route_qformer_weight)
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model


def _lin(x, node):
    y = x @ node["kernel"]
    if "bias" in node:
        y = y + node["bias"]
    return y


@register_model("GraniteSpeechForConditionalGeneration")
class GraniteSpeechModel(Qwen3Model):

    is_multimodal = True
    mm_dynamic = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        ec = vc.get("encoder") or {}
        self.e_input = ec.get("input_dim", 160)
        self.e_layers = ec.get("num_layers", 10)
        self.e_hidden = ec.get("hidden_dim", 1024)
        self.e_ff_mult = ec.get("feedforward_mult", 4)
        self.e_heads = ec.get("num_heads", 8)
        self.e_dim_head = ec.get("dim_head", 128)
        self.e_output = ec.get("output_dim", 42)
        self.e_context = ec.get("context_size", 200)
        self.e_max_pos = ec.get("max_pos_emb", 512)
        self.e_kernel = ec.get("conv_kernel_size", 15)
        self.e_conv_mult = ec.get("conv_expansion_factor", 2)
        pc = vc.get("projector") or {}
        self.q_hidden = pc.get("hidden_size", 1024)
        self.q_heads = pc.get("num_attention_heads", 16)
        self.q_layers = pc.get("num_hidden_layers", 2)
        self.q_intermediate = pc.get("intermediate_size", 4096)
        self.q_eps = pc.get("layer_norm_eps", 1e-12)
        self.cross_freq = pc.get("cross_attention_frequency", 1)
        self.downsample_rate = vc.get("downsample_rate", 5)
        self.window_size = vc.get("window_size", 15)
        self.num_queries = self.window_size // self.downsample_rate

    # ---- encoder -----------------------------------------------------------

    def _conformer_attention(self, lp, x):
        """Block-diagonal chunked attention with Shaw relative-position
        logits (HF GraniteSpeechConformerAttention)."""
        B, T, D = x.shape
        N, Hd = self.e_heads, self.e_dim_head
        C = self.e_context
        x = _ln(x, lp["pre_norm"], 1e-5).astype(jnp.float32)
        nb = -(-T // C)
        rem = T % C
        pad = nb * C - T
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        q = (xp @ lp["to_q"]["kernel"]).reshape(B, nb, C, N, Hd)
        kv = xp @ lp["to_kv"]["kernel"]
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(B, nb, C, N, Hd)
        v = v.reshape(B, nb, C, N, Hd)
        # Shaw: dist[i, j] = clamp(i - j) + max_pos.
        seq = np.arange(C)
        dist = np.clip(seq[:, None] - seq[None, :], -C, C) + \
            self.e_max_pos
        rel = lp["rel_pos_emb"]["weight"][jnp.asarray(dist)]  # [C, C, Hd]
        scale = Hd ** -0.5
        pos_attn = jnp.einsum("bmchd,crd->bmhcr", q, rel) * scale
        if rem > 0:
            # HF masks the pad block outside its valid top-left
            # rem x rem corner (pad rows are sliced off after).
            mask = np.ones((C, C), bool)
            mask[:rem, :rem] = False
            blk = jnp.where(jnp.asarray(mask),
                            -jnp.finfo(jnp.float32).max,
                            pos_attn[:, -1])
            pos_attn = pos_attn.at[:, -1].set(blk)
        scores = jnp.einsum("bmchd,bmkhd->bmhck", q, k) * scale + \
            pos_attn
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bmhck,bmkhd->bmchd", probs, v)
        out = out.reshape(B, nb * C, N * Hd)[:, :T]
        return _lin(out, lp["to_out"])

    def _conformer_conv(self, lp, x):
        x = _ln(x, lp["norm"], 1e-5).astype(jnp.float32)
        x = jnp.transpose(x, (0, 2, 1))                 # [B, D, T]
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(lp["up_conv"]["kernel"], jnp.float32), (1,),
            [(0, 0)], dimension_numbers=("NCT", "OIT", "NCT")) \
            + jnp.asarray(lp["up_conv"]["bias"])[None, :, None]
        a, b = jnp.split(x, 2, axis=1)
        x = a * jax.nn.sigmoid(b)                       # GLU over channels
        k = self.e_kernel
        pad_l = k // 2
        pad_r = pad_l - (k + 1) % 2
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_l, pad_r)))
        inner = self.e_hidden * self.e_conv_mult
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(lp["depth_conv"]["kernel"], jnp.float32),
            (1,), [(0, 0)], feature_group_count=inner,
            dimension_numbers=("NCT", "OIT", "NCT"))
        bn = lp["batch_norm"]
        x = (x - bn["mean"][None, :, None]) * jax.lax.rsqrt(
            bn["var"][None, :, None] + 1e-5) * bn["weight"][None, :, None] \
            + bn["bias"][None, :, None]
        x = jax.nn.silu(x)
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(lp["down_conv"]["kernel"], jnp.float32), (1,),
            [(0, 0)], dimension_numbers=("NCT", "OIT", "NCT")) \
            + jnp.asarray(lp["down_conv"]["bias"])[None, :, None]
        return jnp.transpose(x, (0, 2, 1))

    def _conformer_ff(self, node, x):
        h = _ln(x, node["pre_norm"], 1e-5).astype(jnp.float32)
        h = jax.nn.silu(_lin(h, node["up_proj"]))
        return _lin(h, node["down_proj"])

    def _encoder(self, ep, feats):
        h = _lin(jnp.asarray(feats, jnp.float32), ep["input_linear"])
        for idx, lp in enumerate(ep["layers"], start=1):
            h = 0.5 * self._conformer_ff(lp["ff1"], h) + h
            h = self._conformer_attention(lp, h) + h
            h = self._conformer_conv(lp, h) + h
            h = 0.5 * self._conformer_ff(lp["ff2"], h) + h
            h = _ln(h, lp["post_norm"], 1e-5).astype(jnp.float32)
            if idx == self.e_layers // 2:
                mid = _lin(h, ep["out"])
                h = h + _lin(jax.nn.softmax(mid, axis=-1),
                             ep["out_mid"])
        return h

    # ---- projector + mm ----------------------------------------------------

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        ap = params["audio"]
        feats = np.asarray(mm_data["input_features"], np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        h = self._encoder(ap, feats)                    # [B, T, D]
        B, T, D = h.shape
        W = self.window_size
        nblocks = math.ceil(T / W)
        h = jnp.pad(h, ((0, 0), (0, nblocks * W - T), (0, 0)))
        h = h.reshape(B * nblocks, W, D)
        proj = ap["projector"]
        query = jnp.broadcast_to(proj["query"][None],
                                 (B * nblocks, self.num_queries,
                                  self.q_hidden))
        hq = _ln(query, proj["q_layernorm"], self.q_eps)
        hq = qformer_forward(proj["qlayers"], hq, h, self.q_heads,
                             self.q_eps)
        out = _lin(hq, proj["linear"])
        H = out.shape[-1]
        return np.asarray(out, np.float32).reshape(
            B, nblocks * self.num_queries, H).reshape(-1, H)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        nprng = np.random.default_rng(839 + self.config.seed)
        D = self.e_hidden
        inner = D * self.e_conv_mult
        Dq = self.q_hidden

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(n):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        def lin(i, o):
            return {"kernel": dense((i, o)),
                    "bias": jnp.zeros((o,), jnp.float32)}

        layers = []
        for _ in range(self.e_layers):
            layers.append({
                "ff1": {"pre_norm": ln(D),
                        "up_proj": lin(D, D * self.e_ff_mult),
                        "down_proj": lin(D * self.e_ff_mult, D)},
                "ff2": {"pre_norm": ln(D),
                        "up_proj": lin(D, D * self.e_ff_mult),
                        "down_proj": lin(D * self.e_ff_mult, D)},
                "pre_norm": ln(D),
                "to_q": {"kernel": dense(
                    (D, self.e_heads * self.e_dim_head))},
                "to_kv": {"kernel": dense(
                    (D, 2 * self.e_heads * self.e_dim_head))},
                "to_out": lin(self.e_heads * self.e_dim_head, D),
                "rel_pos_emb": {"weight": dense(
                    (2 * self.e_max_pos + 1, self.e_dim_head))},
                "norm": ln(D),
                "up_conv": {"kernel": dense((2 * inner, D, 1)),
                            "bias": jnp.zeros((2 * inner,),
                                              jnp.float32)},
                "depth_conv": {"kernel": dense(
                    (inner, 1, self.e_kernel))},
                "batch_norm": {"weight": jnp.ones((inner,), jnp.float32),
                               "bias": jnp.zeros((inner,), jnp.float32),
                               "mean": jnp.zeros((inner,), jnp.float32),
                               "var": jnp.ones((inner,), jnp.float32)},
                "down_conv": {"kernel": dense((D, inner, 1)),
                              "bias": jnp.zeros((D,), jnp.float32)},
                "post_norm": ln(D)})
        qlayers = []
        for i in range(self.q_layers):
            layer = {"att": {"query": lin(Dq, Dq), "key": lin(Dq, Dq),
                             "value": lin(Dq, Dq), "out": lin(Dq, Dq),
                             "out_ln": ln(Dq)},
                     "intermediate_query": lin(Dq, self.q_intermediate),
                     "output_query": lin(self.q_intermediate, Dq),
                     "output_query_ln": ln(Dq)}
            if i % self.cross_freq == 0:
                layer["cross"] = {"query": lin(Dq, Dq),
                                  "key": lin(self.e_hidden, Dq),
                                  "value": lin(self.e_hidden, Dq),
                                  "out": lin(Dq, Dq), "out_ln": ln(Dq)}
            qlayers.append(layer)
        params["audio"] = {
            "input_linear": lin(self.e_input, D),
            "layers": layers,
            "out": lin(D, self.e_output),
            "out_mid": lin(self.e_output, D),
            "projector": {
                "query": dense((self.num_queries, Dq)),
                "q_layernorm": ln(Dq),
                "qlayers": qlayers,
                "linear": lin(Dq, self.config.hidden_size)},
        }
        return params

    # ---- weights -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        audio: Dict[str, Any] = {
            "layers": [{} for _ in range(self.e_layers)],
            "projector": {"qlayers": [{}
                                      for _ in range(self.q_layers)]}}
        t = lambda a: jnp.asarray(np.ascontiguousarray(np.asarray(a).T),  # noqa: E731
                                  jnp.float32)
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

        def lin_put(node, key, kind, w):
            node.setdefault(key, {})[
                "kernel" if kind == "weight" else "bias"] = \
                t(w) if kind == "weight" else v(w)

        def enc_put(rest, w):
            if m := re.match(r"(input_linear|out|out_mid)\.(weight|bias)",
                             rest):
                lin_put(audio, m.group(1), m.group(2), w)
            elif m := re.match(r"layers\.(\d+)\.(.+)", rest):
                lp = audio["layers"][int(m.group(1))]
                leaf = m.group(2)
                if m2 := re.match(r"(ff1|ff2)\.(.+)", leaf):
                    node = lp.setdefault(m2.group(1), {})
                    sub = m2.group(2)
                    if m3 := re.match(r"pre_norm\.(weight|bias)", sub):
                        node.setdefault("pre_norm", {})[
                            m3.group(1)] = v(w)
                    elif m3 := re.match(r"(up_proj|down_proj)\."
                                        r"(weight|bias)", sub):
                        lin_put(node, m3.group(1), m3.group(2), w)
                elif m2 := re.match(r"attn\.(.+)", leaf):
                    sub = m2.group(1)
                    if m3 := re.match(r"pre_norm\.(weight|bias)", sub):
                        lp.setdefault("pre_norm", {})[m3.group(1)] = v(w)
                    elif sub == "rel_pos_emb.weight":
                        lp["rel_pos_emb"] = {"weight": v(w)}
                    elif m3 := re.match(r"(to_q|to_kv)\.weight", sub):
                        lp[m3.group(1)] = {"kernel": t(w)}
                    elif m3 := re.match(r"to_out\.(weight|bias)", sub):
                        lin_put(lp, "to_out", m3.group(1), w)
                elif m2 := re.match(r"conv\.(.+)", leaf):
                    sub = m2.group(1)
                    if m3 := re.match(r"norm\.(weight|bias)", sub):
                        lp.setdefault("norm", {})[m3.group(1)] = v(w)
                    elif m3 := re.match(r"(up_conv|down_conv)\."
                                        r"(weight|bias)", sub):
                        lp.setdefault(m3.group(1), {})[
                            "kernel" if m3.group(2) == "weight"
                            else "bias"] = v(w)
                    elif sub == "depth_conv.conv.weight":
                        lp["depth_conv"] = {"kernel": v(w)}
                    elif m3 := re.match(r"batch_norm\.(weight|bias|"
                                        r"running_mean|running_var)",
                                        sub):
                        key = {"running_mean": "mean",
                               "running_var": "var"}.get(m3.group(1),
                                                         m3.group(1))
                        lp.setdefault("batch_norm", {})[key] = v(w)
                elif m2 := re.match(r"post_norm\.(weight|bias)", leaf):
                    lp.setdefault("post_norm", {})[m2.group(1)] = v(w)

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("encoder."):
                    enc_put(name.removeprefix("encoder."), w)
                elif name == "projector.query":
                    audio["projector"]["query"] = v(
                        np.asarray(w).reshape(np.asarray(w).shape[-2:]))
                elif m := re.match(r"projector\.linear\.(weight|bias)",
                                   name):
                    lin_put(audio["projector"], "linear", m.group(1), w)
                elif name.startswith("projector.qformer."):
                    route_qformer_weight(
                        audio["projector"],
                        name.removeprefix("projector.qformer."), w, t, v)
                elif name.startswith("language_model."):
                    yield name.removeprefix("language_model."), w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["audio"] = audio
        return params
