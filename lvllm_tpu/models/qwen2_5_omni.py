"""Qwen2.5-Omni (thinker): windowed Whisper-style audio tower +
Qwen2.5-VL ViT + TMRoPE positions over a Qwen2.5 decoder.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
qwen2_5_omni_thinker.py`` / HF ``modeling_qwen2_5_omni.py`` (the
serving path runs the THINKER only — talker/token2wav produce speech
and are skipped, matching the reference):
- audio (Qwen2_5OmniAudioEncoder): per-audio chunking into 2*n_window
  frames, conv k3 + conv k3/s2 (gelu, masked), Whisper sinusoid
  positions per chunk, block-diagonal attention over chunks, avg-pool
  x2, ln_post + proj;
- vision: the Qwen2.5-VL windowed ViT (models/qwen2_vl.py is_v25);
- TMRoPE (get_rope_index): audio segments take sequential t positions,
  vision takes grid positions with t scaled by position_id_per_seconds;
  use_audio_in_video interleaving is not supported.
"""

import re
from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen2_vl import Qwen2VLModel
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


@register_model("Qwen2_5OmniThinkerForConditionalGeneration")
@register_model("Qwen2_5OmniForConditionalGeneration")
@register_model("Qwen2_5OmniModel")
class Qwen25OmniThinkerModel(Qwen2VLModel):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        vc = config.vision_config or {}
        # The Omni ViT is the Qwen2.5-VL windowed tower (hidden_size /
        # out_hidden_size fields, fullatt_block_indexes, gated MLP).
        self.is_v25 = True
        self.v_hidden = vc.get("hidden_size", 1280)
        self.v_intermediate = vc.get("intermediate_size", 3420)
        self.v_out = vc.get("out_hidden_size", config.hidden_size)
        self.fullatt = tuple(vc.get("fullatt_block_indexes") or ())
        ac = vc.get("audio") or {}
        self.a_dmodel = ac.get("d_model", 1280)
        self.a_heads = ac.get("encoder_attention_heads", 20)
        self.a_layers = ac.get("encoder_layers", 32)
        self.a_ffn = ac.get("encoder_ffn_dim", 5120)
        self.a_mel = ac.get("num_mel_bins", 128)
        self.a_max_pos = ac.get("max_source_positions", 1500)
        self.n_window = ac.get("n_window", 100)
        self.a_out = ac.get("output_dim", config.hidden_size)
        self.audio_token_id = vc.get("audio_token_id", 151646)
        self.audio_start_token_id = vc.get("audio_start_token_id",
                                           151647)
        self.pos_per_second = vc.get("position_id_per_seconds", 25)

    @property
    def mm_token_ids(self) -> Tuple[int, ...]:
        c = self.config
        return (c.image_token_id, c.video_token_id or -1,
                self.audio_token_id)

    # ---- audio tower -------------------------------------------------------

    def _audio_states(self, ap, mel, length: int) -> jax.Array:
        """One audio: mel [F, T] (unpadded) -> [n_tokens, output_dim].
        Chunked per 2*n_window frames; attention is block-diagonal over
        chunks (HF Qwen2_5OmniAudioEncoder.forward)."""
        win = 2 * self.n_window
        D = self.a_dmodel
        chunks = [mel[:, s:s + win] for s in range(0, length, win)]
        lens = [c.shape[1] for c in chunks]
        max_len = max(lens)
        padded = np.zeros((len(chunks), self.a_mel, max_len), np.float32)
        mask = np.zeros((len(chunks), max_len), np.float32)
        for i, c in enumerate(chunks):
            padded[i, :, :lens[i]] = c
            mask[i, :lens[i]] = 1.0
        x = jnp.asarray(padded)
        # conv1 k3 s1 p1 (gelu, masked), conv2 k3 s2 p1 (gelu).
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(ap["conv1"]["kernel"]), (1,), [(1, 1)],
            dimension_numbers=("NCT", "OIT", "NCT")) \
            + jnp.asarray(ap["conv1"]["bias"])[None, :, None]
        x = jax.nn.gelu(x, approximate=False) * mask[:, None, :]
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(ap["conv2"]["kernel"]), (2,), [(1, 1)],
            dimension_numbers=("NCT", "OIT", "NCT")) \
            + jnp.asarray(ap["conv2"]["bias"])[None, :, None]
        x = jnp.transpose(jax.nn.gelu(x, approximate=False), (0, 2, 1))
        T_cnn = x.shape[1]
        # Whisper sinusoid positions, restarting per chunk.
        half = D // 2
        inv = np.exp(-np.log(1e4) / (half - 1) * np.arange(half))
        scaled = np.arange(T_cnn)[:, None] * inv[None]
        pos = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=-1)
        x = x + jnp.asarray(pos, jnp.float32)[None]
        # Valid rows per chunk after the stride-2 conv.
        cnn_lens = [(l - 1) // 2 + 1 for l in lens]
        rows = np.concatenate(
            [i * T_cnn + np.arange(n) for i, n in enumerate(cnn_lens)])
        h = x.reshape(-1, D)[jnp.asarray(rows)]
        seg = np.concatenate(
            [np.full(n, i) for i, n in enumerate(cnn_lens)])
        same = jnp.asarray(seg[:, None] == seg[None, :])
        N, Hd = self.a_heads, D // self.a_heads
        T = h.shape[0]
        for lp in ap["layers"]:
            hn = _ln(h, lp["self_attn_layer_norm"])
            q = _lin(hn, lp["q_proj"]).reshape(T, N, Hd)
            k = _lin(hn, lp["k_proj"]).reshape(T, N, Hd)
            v = _lin(hn, lp["v_proj"]).reshape(T, N, Hd)
            s = jnp.einsum("qhd,khd->hqk", q, k) * (Hd ** -0.5)
            s = jnp.where(same[None], s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", p, v).reshape(T, D)
            h = h + _lin(o, lp["out_proj"])
            hn = _ln(h, lp["final_layer_norm"])
            h = h + _lin(jax.nn.gelu(_lin(hn, lp["fc1"]),
                                     approximate=False), lp["fc2"])
        # Per-audio: avg-pool x2, ln_post, proj. (Single audio here —
        # the whole h belongs to it.)
        n2 = (T // 2) * 2
        h = h[:n2].reshape(-1, 2, D).mean(axis=1)
        h = _ln(h, ap["ln_post"])
        return _lin(h, ap["proj"])

    def _audio_rows(self, params, mm_data) -> np.ndarray:
        ap = params["audio"]
        feats = np.asarray(mm_data["input_features"], np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        fam = mm_data.get("feature_attention_mask")
        lens = (np.asarray(fam).sum(-1).astype(int) if fam is not None
                else [feats.shape[-1]] * feats.shape[0])
        rows = []
        for i in range(feats.shape[0]):
            rows.append(np.asarray(
                self._audio_states(ap, feats[i][:, :lens[i]],
                                   int(lens[i])), np.float32))
        return np.concatenate(rows, axis=0)

    # ---- mm merge ----------------------------------------------------------

    def encode_mm(self, params, mm_data: dict) -> np.ndarray:
        has_vis = mm_data.get("pixel_values") is not None
        has_aud = mm_data.get("input_features") is not None
        vis = super().encode_mm(params, mm_data) if has_vis else None
        aud = self._audio_rows(params, mm_data) if has_aud else None
        ids = mm_data.get("_input_ids")
        if ids is None or vis is None or aud is None:
            parts = [p for p in (vis, aud) if p is not None]
            return np.concatenate(parts, axis=0)
        ids = np.asarray(ids)
        aud_pos = ids == self.audio_token_id
        vis_pos = (ids == self.config.image_token_id) | \
            (ids == self.config.video_token_id)
        rows = np.zeros((int(aud_pos.sum() + vis_pos.sum()),
                         vis.shape[-1]), np.float32)
        order = np.where(aud_pos | vis_pos)[0]
        is_aud = aud_pos[order]
        rows[is_aud] = aud
        rows[~is_aud] = vis
        return rows

    # ---- TMRoPE ------------------------------------------------------------

    def mm_positions(self, prompt_ids, mm_data: dict
                     ) -> Tuple[np.ndarray, int]:
        """Port of HF Qwen2_5OmniThinker.get_rope_index (no
        use_audio_in_video interleaving)."""
        c = self.config
        toks = list(int(t) for t in prompt_ids)
        n = len(toks)
        img_grids = np.asarray(
            mm_data.get("image_grid_thw", np.zeros((0, 3))),
            np.int64).reshape(-1, 3)
        vid_grids = np.asarray(
            mm_data.get("video_grid_thw", np.zeros((0, 3))),
            np.int64).reshape(-1, 3)
        fam = mm_data.get("feature_attention_mask")
        if fam is not None:
            audio_lens = np.asarray(fam).sum(-1).astype(int).tolist()
        elif mm_data.get("input_features") is not None:
            feats = np.asarray(mm_data["input_features"])
            if feats.ndim == 2:
                feats = feats[None]
            audio_lens = [feats.shape[-1]] * feats.shape[0]
        else:
            audio_lens = []
        spg = np.asarray(mm_data.get("second_per_grids",
                                     np.ones(len(vid_grids)))).reshape(-1)
        merge = self.merge
        pos_list: List[np.ndarray] = []

        def st_idx():
            return int(pos_list[-1].max()) + 1 if pos_list else 0

        def text_block(ln):
            if ln > 0:
                base = st_idx()
                pos_list.append(
                    np.broadcast_to(np.arange(ln), (3, ln)) + base)

        def vision_block(grid, t_scale):
            base = st_idx()
            gt, gh, gw = int(grid[0]), int(grid[1]) // merge, \
                int(grid[2]) // merge
            t_index = (np.arange(gt) * t_scale *
                       self.pos_per_second).astype(np.int64)
            t_row = np.repeat(t_index, gh * gw)
            h_row = np.tile(np.repeat(np.arange(gh), gw), gt)
            w_row = np.tile(np.arange(gw), gt * gh)
            pos_list.append(np.stack([t_row, h_row, w_row]) + base)
            return gt * gh * gw

        def count_runs(tok):
            arr = np.asarray(toks) == tok
            return int((arr & ~np.concatenate([[False],
                                               arr[:-1]])).sum())

        audio_nums = sum(t == self.audio_start_token_id
                         for t in toks) or count_runs(
                             self.audio_token_id)
        image_nums = count_runs(c.image_token_id)
        video_nums = count_runs(c.video_token_id)

        st = 0
        image_idx = video_idx = audio_idx = 0
        remain_i, remain_v, remain_a = image_nums, video_nums, audio_nums
        for _ in range(image_nums + video_nums + audio_nums):
            def find(tok, remain):
                try:
                    return toks.index(tok, st) if remain > 0 else n + 1
                except ValueError:
                    return n + 1
            ed_image = find(c.image_token_id, remain_i)
            ed_video = find(c.video_token_id, remain_v)
            ed_audio = find(self.audio_token_id, remain_a)
            min_ed = min(ed_image, ed_video, ed_audio)
            text_block(min_ed - st - 1)
            text_block(1)                       # bos (start marker)
            if min_ed == ed_audio:
                a_len = ((audio_lens[audio_idx] - 1) // 2 + 1 - 2) \
                    // 2 + 1
                base = st_idx()
                pos_list.append(
                    np.broadcast_to(np.arange(a_len), (3, a_len)) + base)
                seg = a_len
                audio_idx += 1
                remain_a -= 1
            elif min_ed == ed_image:
                seg = vision_block(img_grids[image_idx], 1.0)
                image_idx += 1
                remain_i -= 1
            else:
                seg = vision_block(vid_grids[video_idx],
                                   float(spg[video_idx]))
                video_idx += 1
                remain_v -= 1
            text_block(1)                       # eos (end marker)
            st = min_ed - 1 + 1 + seg + 1
        text_block(n - st)
        pos = np.concatenate(pos_list, axis=1).astype(np.int64)
        delta = int(pos.max()) + 1 - n
        return pos, delta

    def num_mm_tokens(self, mm_data: dict) -> List[int]:
        counts = []
        if mm_data.get("pixel_values") is not None:
            counts.extend(super().num_mm_tokens(mm_data))
        fam = mm_data.get("feature_attention_mask")
        if fam is not None:
            for ln in np.asarray(fam).sum(-1).astype(int):
                counts.append(((int(ln) - 1) // 2 + 1 - 2) // 2 + 1)
        elif mm_data.get("input_features") is not None:
            feats = np.asarray(mm_data["input_features"])
            if feats.ndim == 2:
                feats = feats[None]
            ln = feats.shape[-1]
            counts.extend(
                [((ln - 1) // 2 + 1 - 2) // 2 + 1] * feats.shape[0])
        return counts

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Dict:
        params = super().init_params(rng)
        nprng = np.random.default_rng(843 + self.config.seed)
        D = self.a_dmodel

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def ln(nn):
            return {"weight": jnp.ones((nn,), jnp.float32),
                    "bias": jnp.zeros((nn,), jnp.float32)}

        def lin(i, o, bias=True):
            node = {"kernel": dense((i, o))}
            if bias:
                node["bias"] = jnp.zeros((o,), jnp.float32)
            return node

        layers = []
        for _ in range(self.a_layers):
            layers.append({
                "self_attn_layer_norm": ln(D),
                "q_proj": lin(D, D), "k_proj": lin(D, D, bias=False),
                "v_proj": lin(D, D), "out_proj": lin(D, D),
                "final_layer_norm": ln(D),
                "fc1": lin(D, self.a_ffn), "fc2": lin(self.a_ffn, D)})
        params["audio"] = {
            "conv1": {"kernel": dense((D, self.a_mel, 3)),
                      "bias": jnp.zeros((D,), jnp.float32)},
            "conv2": {"kernel": dense((D, D, 3)),
                      "bias": jnp.zeros((D,), jnp.float32)},
            "layers": layers,
            "ln_post": ln(D),
            "proj": lin(D, self.a_out),
        }
        return params

    # ---- weights -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        audio: Dict = {"layers": [{} for _ in range(self.a_layers)]}
        t = lambda a: jnp.asarray(np.ascontiguousarray(np.asarray(a).T),  # noqa: E731
                                  jnp.float32)
        v = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731

        def aud_put(rest, w):
            if m := re.match(r"(conv1|conv2)\.(weight|bias)", rest):
                audio.setdefault(m.group(1), {})[
                    "kernel" if m.group(2) == "weight" else "bias"] = v(w)
            elif m := re.match(r"ln_post\.(weight|bias)", rest):
                audio.setdefault("ln_post", {})[m.group(1)] = v(w)
            elif m := re.match(r"proj\.(weight|bias)", rest):
                audio.setdefault("proj", {})[
                    "kernel" if m.group(1) == "weight" else "bias"] = \
                    t(w) if m.group(1) == "weight" else v(w)
            elif m := re.match(r"layers\.(\d+)\.(.+)", rest):
                lp = audio["layers"][int(m.group(1))]
                leaf = m.group(2)
                if m2 := re.match(r"(self_attn_layer_norm|"
                                  r"final_layer_norm)\.(weight|bias)",
                                  leaf):
                    lp.setdefault(m2.group(1), {})[m2.group(2)] = v(w)
                elif m2 := re.match(r"self_attn\.(q_proj|k_proj|v_proj|"
                                    r"out_proj)\.(weight|bias)", leaf):
                    lp.setdefault(m2.group(1), {})[
                        "kernel" if m2.group(2) == "weight" else
                        "bias"] = t(w) if m2.group(2) == "weight" \
                        else v(w)
                elif m2 := re.match(r"(fc1|fc2)\.(weight|bias)", leaf):
                    lp.setdefault(m2.group(1), {})[
                        "kernel" if m2.group(2) == "weight" else
                        "bias"] = t(w) if m2.group(2) == "weight" \
                        else v(w)

        pend: Dict = {}

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("thinker.")
                if name.startswith(("talker.", "token2wav.")):
                    continue
                if m := re.match(r"visual\.blocks\.(\d+)\.attn\."
                                 r"([qkv])\.(weight|bias)", name):
                    # Omni ships separate q/k/v; fuse into the qwen2vl
                    # qkv layout once all three arrive.
                    key = (m.group(1), m.group(3))
                    pend.setdefault(key, {})[m.group(2)] = np.asarray(w)
                    d = pend[key]
                    if len(d) == 3:
                        fused = np.concatenate(
                            [d["q"], d["k"], d["v"]], axis=0)
                        yield (f"visual.blocks.{key[0]}.attn.qkv."
                               f"{key[1]}", fused)
                    continue
                if name.startswith("audio_tower."):
                    rest = name.removeprefix("audio_tower.")
                    if not rest.startswith(("positional_embedding",
                                            "audio_bos_eos_token")):
                        aud_put(rest, w)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["audio"] = audio
        return params
