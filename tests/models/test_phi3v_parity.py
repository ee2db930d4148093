"""Phi-3-Vision HD transform parity: HF CLIPVisionModel tower oracle
(feature layer -2) + a torch replica of the reference HD 2x2 merge /
newline / projection semantics (vllm phi3v.py:164-300).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402

HID, INTER, LAYERS, HEADS = 32, 64, 3, 2
IMG, PATCH = 28, 14         # grid 2x2 → hd grid 1x1
TH = 48                     # text hidden


def _merge_2x2_torch(x, h_crop, w_crop, g):
    N, _, C = x.shape
    x = x.reshape(N, g, g, C)
    x = x.reshape(N, g // 2, 2, g // 2, 2, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(N, g // 2, g // 2, 4 * C)
    x = x.reshape(h_crop, w_crop, g // 2, g // 2, 4 * C)
    x = x.permute(0, 2, 1, 3, 4).reshape(h_crop * (g // 2),
                                         w_crop * (g // 2), 4 * C)
    return x


def _newline_torch(x, sub_gn):
    H = x.shape[0]
    nl = sub_gn.expand(H, 1, x.shape[-1])
    return torch.cat([x, nl], dim=1).reshape(-1, x.shape[-1])


def test_phi3v_hd_features_parity(tmp_path):
    vcfg = transformers.CLIPVisionConfig(
        hidden_size=HID, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        image_size=IMG, patch_size=PATCH, projection_dim=HID)
    torch.manual_seed(31)
    tower = transformers.CLIPVisionModel(vcfg).eval()
    sd = {"model.vision_embed_tokens.img_processor." + k: v
          for k, v in tower.state_dict().items()
          if not k.startswith("vision_model.post_layernorm")}
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    glb = rnd(1, 1, 4 * HID)
    sub = rnd(1, 1, 1, 4 * HID)
    p0w, p0b = rnd(TH, 4 * HID), rnd(TH)
    p2w, p2b = rnd(TH, TH), rnd(TH)
    sd.update({"model.vision_embed_tokens.glb_GN": glb,
               "model.vision_embed_tokens.sub_GN": sub,
               "model.vision_embed_tokens.img_projection.0.weight": p0w,
               "model.vision_embed_tokens.img_projection.0.bias": p0b,
               "model.vision_embed_tokens.img_projection.2.weight": p2w,
               "model.vision_embed_tokens.img_projection.2.bias": p2b})
    # Minimal Phi-3 text stack.
    tcfg = transformers.Phi3Config(
        vocab_size=96, hidden_size=TH, intermediate_size=64,
        pad_token_id=0,
        num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)
    lm = transformers.AutoModelForCausalLM.from_config(tcfg)
    sd.update(lm.state_dict())
    from safetensors.torch import save_file
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    d = json.loads(tcfg.to_json_string())
    d["architectures"] = ["Phi3VForCausalLM"]
    d["img_processor"] = {"hidden_size": HID, "intermediate_size": INTER,
                          "num_hidden_layers": LAYERS,
                          "num_attention_heads": HEADS,
                          "image_size": IMG, "patch_size": PATCH,
                          "layer_idx": -2}
    (tmp_path / "config.json").write_text(json.dumps(d))

    rng = np.random.default_rng(14)
    # Two crops: global + one sub crop (1x1 HD layout, 672/336-style).
    pix = rng.standard_normal((1, 2, 3, IMG, IMG)).astype(np.float32)
    g = IMG // PATCH
    with torch.no_grad():
        flat = torch.tensor(pix.reshape(2, 3, IMG, IMG))
        hs = tower(flat, output_hidden_states=True).hidden_states[-2]
        feats = hs[:, 1:, :]                      # drop CLS
        glb_hd = _newline_torch(
            _merge_2x2_torch(feats[:1], 1, 1, g), sub[0, 0])
        sub_hd = _newline_torch(
            _merge_2x2_torch(feats[1:2], 1, 1, g), sub[0, 0])
        emb = torch.cat([sub_hd, glb[0], glb_hd], dim=0)
        h1 = torch.nn.functional.gelu(emb @ p0w.T + p0b)
        ref = (h1 @ p2w.T + p2b).float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Phi3VForCausalLM"
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(
        params, jnp.asarray(pix), image_sizes=[[IMG, IMG]]))
    assert ours.shape == ref.shape == (model.num_image_tokens, TH)
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)
