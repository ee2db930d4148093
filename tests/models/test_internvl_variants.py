"""Original-format (trust-remote) InternVL family: InternVLChatModel,
NVLM-D, H2OVL, SkyworkR1V.

Built by converting an HF-format InternVL checkpoint into the original
naming (fused attn.qkv, ls1/ls2, mlp1.*, llm_config) and asserting the
image features and logits match the HF oracle through our full loader.
Reference: vllm intern_vit.py naming, nvlm_d.py:158 (widened bias-free
mlp1), h2ovl.py:154, skyworkr1v.py:153.
"""

import json
import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
from safetensors.torch import load_file, save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from tests.models.test_gemma3_internvl_parity import (  # noqa: E402
    IVL_IMG, _internvl_hf)


def _to_original(t, arch, projector=None):
    """HF-format InternVL state dict → original trust-remote naming."""
    out = {}
    qkv = {}
    for name, w in t.items():
        # HF save_pretrained re-nests composite checkpoints — tolerate
        # both "model.multi_modal_projector.*" and the flat spelling.
        name = name.removeprefix("model.")
        name = "model." + name
        if m := re.match(
                r"model\.vision_tower\.encoder\.layer\.(\d+)\.(.+)", name):
            i, rest = m.group(1), m.group(2)
            p = f"vision_model.encoder.layers.{i}."
            if m2 := re.match(r"attention\.([qkv])_proj\.(weight|bias)",
                              rest):
                qkv.setdefault((i, m2.group(2)), {})[m2.group(1)] = w
            elif m2 := re.match(
                    r"attention\.projection_layer\.(weight|bias)", rest):
                out[p + "attn.proj." + m2.group(1)] = w
            elif m2 := re.match(r"attention\.([qk])_norm\.weight", rest):
                out[p + f"attn.{m2.group(1)}_norm.weight"] = w
            elif rest == "lambda_1":
                out[p + "ls1"] = w
            elif rest == "lambda_2":
                out[p + "ls2"] = w
            elif m2 := re.match(r"layernorm_(before|after)\.(weight|bias)",
                                rest):
                which = "norm1" if m2.group(1) == "before" else "norm2"
                out[p + which + "." + m2.group(2)] = w
            else:
                out[p + rest] = w   # mlp.fc1 / mlp.fc2 keep names
        elif name == "model.vision_tower.embeddings.cls_token":
            out["vision_model.embeddings.class_embedding"] = w
        elif name == \
                "model.vision_tower.embeddings.patch_embeddings" \
                ".projection.weight":
            out["vision_model.embeddings.patch_embedding.weight"] = w
        elif name == \
                "model.vision_tower.embeddings.patch_embeddings" \
                ".projection.bias":
            out["vision_model.embeddings.patch_embedding.bias"] = w
        elif name == "model.vision_tower.embeddings.position_embeddings":
            out["vision_model.embeddings.position_embedding"] = w
        elif m := re.match(r"model\.multi_modal_projector\.(.+)", name):
            rest = m.group(1)
            if projector is not None:
                continue            # replaced by the caller's weights
            slot = {"layer_norm": "mlp1.0", "linear_1": "mlp1.1",
                    "linear_2": "mlp1.3"}[rest.rsplit(".", 1)[0]]
            out[slot + "." + rest.rsplit(".", 1)[1]] = w
        elif name.startswith("model.language_model."):
            out["language_model.model." +
                name.removeprefix("model.language_model.")] = w
        elif name == "model.lm_head.weight":
            out["language_model.lm_head.weight"] = w
        else:
            out[name.removeprefix("model.")] = w
    for (i, kind), parts in qkv.items():
        out[f"vision_model.encoder.layers.{i}.attn.qkv.{kind}"] = \
            torch.cat([parts["q"], parts["k"], parts["v"]], dim=0)
    if projector:
        out.update(projector)
    return out


def _orig_config(arch):
    return {
        "architectures": [arch],
        "llm_config": {
            "architectures": ["Qwen2ForCausalLM"], "vocab_size": 64,
            "hidden_size": 48, "intermediate_size": 96,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "max_position_embeddings": 128,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
            "tie_word_embeddings": False},
        "vision_config": {
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": 14, "qkv_bias": True},
        "downsample_ratio": 0.5, "image_token_id": IVL_IMG}


@pytest.mark.parametrize("arch", ["InternVLChatModel", "H2OVLChatModel",
                                  "SkyworkR1VChatModel"])
def test_original_format_features_match_hf(tmp_path, arch):
    hf = _internvl_hf(tmp_path)
    t = load_file(str(tmp_path / "model.safetensors"))
    ck = tmp_path / "orig"
    ck.mkdir()
    save_file(_to_original(t, arch), str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps(_orig_config(arch)))
    rng = np.random.default_rng(7)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(pixels)).float().numpy()
    mc = load_model_config(str(ck), max_model_len=64, dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               rtol=2e-3, atol=2e-3, err_msg=arch)


def test_nvlm_widened_biasfree_projector(tmp_path):
    hf = _internvl_hf(tmp_path)
    t = load_file(str(tmp_path / "model.safetensors"))
    torch.manual_seed(9)
    ln_w, ln_b = torch.rand(128) + 0.5, torch.randn(128) * 0.05
    l1 = torch.randn(96, 128) * 0.05        # widened to llm_intermediate
    l2 = torch.randn(48, 96) * 0.05
    proj = {"mlp1.0.weight": ln_w, "mlp1.0.bias": ln_b,
            "mlp1.1.weight": l1, "mlp1.3.weight": l2}   # bias-free
    ck = tmp_path / "nvlm"
    ck.mkdir()
    save_file(_to_original(t, "NVLM_D", projector=proj),
              str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps(_orig_config("NVLM_D")))
    rng = np.random.default_rng(8)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    # Oracle: HF tower + HF pixel shuffle semantics + the NVLM head.
    with torch.no_grad():
        vit = hf.model.vision_tower(
            torch.tensor(pixels)).last_hidden_state[:, 1:, :]
        B, N, C = vit.shape
        fs = int(round(N ** 0.5))
        x = vit.reshape(B, fs, fs, C)
        x = x.reshape(B, fs, fs // 2, C * 2).permute(0, 2, 1, 3)
        x = x.reshape(B, fs // 2, fs // 2, C * 4).permute(0, 2, 1, 3)
        x = x.reshape(B, N // 4, C * 4)
        x = torch.nn.functional.layer_norm(x, (128,), ln_w, ln_b)
        x = torch.nn.functional.gelu(x @ l1.T)
        ref = (x @ l2.T).float().numpy()
    mc = load_model_config(str(ck), max_model_len=64, dtype="float32")
    assert mc.vision_config["projector_mid"] == 96
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               rtol=2e-3, atol=2e-3)


def test_eagle2_5_vl_features(tmp_path):
    """SigLIP tower + pixel shuffle + mlp1 (reference eagle2_5_vl.py:225,
    :240-260) vs an HF SiglipVisionModel oracle."""
    vcfg = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14)
    torch.manual_seed(21)
    tower = transformers.SiglipVisionModel(vcfg)
    tower.eval()
    sd = {"vision_model." + k: v
          for k, v in tower.state_dict().items()
          if not k.startswith("vision_model.head.")}
    sd = {k.replace("vision_model.vision_model.", "vision_model."): v
          for k, v in sd.items()}
    ln_w, ln_b = torch.rand(128) + 0.5, torch.randn(128) * 0.05
    l1w, l1b = torch.randn(48, 128) * 0.05, torch.randn(48) * 0.05
    l2w, l2b = torch.randn(48, 48) * 0.05, torch.randn(48) * 0.05
    sd.update({"mlp1.0.weight": ln_w, "mlp1.0.bias": ln_b,
               "mlp1.1.weight": l1w, "mlp1.1.bias": l1b,
               "mlp1.3.weight": l2w, "mlp1.3.bias": l2b})
    # Minimal Qwen2 text side.
    tcfg = transformers.Qwen2Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    lm = transformers.AutoModelForCausalLM.from_config(tcfg)
    sd.update({"language_model." + k: v
               for k, v in lm.state_dict().items()})
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["Eagle2_5_VLForConditionalGeneration"],
        "text_config": json.loads(tcfg.to_json_string()),
        "vision_config": {
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": 14},
        "downsample_ratio": 0.5, "image_token_id": 60}))
    rng = np.random.default_rng(12)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        vit = tower(torch.tensor(pixels)).last_hidden_state
        B, N, C = vit.shape
        fs = int(round(N ** 0.5))
        x = vit.reshape(B, fs, fs, C)
        x = x.reshape(B, fs, fs // 2, C * 2).permute(0, 2, 1, 3)
        x = x.reshape(B, fs // 2, fs // 2, C * 4).permute(0, 2, 1, 3)
        x = x.reshape(B, N // 4, C * 4)
        x = torch.nn.functional.layer_norm(x, (128,), ln_w, ln_b)
        x = torch.nn.functional.gelu(x @ l1w.T + l1b)
        ref = (x @ l2w.T + l2b).float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               rtol=2e-3, atol=2e-3)
