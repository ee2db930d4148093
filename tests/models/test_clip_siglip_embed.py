"""CLIP / SigLIP dual-encoder embedding parity vs transformers
get_text_features / get_image_features (both normalized for cosine
comparability, matching the serving path)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.engine.pooling import PoolingRunner  # noqa: E402
from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402


def _norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True),
                          1e-12)


def _clip_ckpt(tmp_path):
    tc = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2,
        max_position_embeddings=77, eos_token_id=63, bos_token_id=1,
        pad_token_id=0)
    vc = transformers.CLIPVisionConfig(
        hidden_size=40, intermediate_size=80, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14)
    cfg = transformers.CLIPConfig(text_config=tc.to_dict(),
                                  vision_config=vc.to_dict(),
                                  projection_dim=24)
    torch.manual_seed(0)
    hf = transformers.CLIPModel(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    return hf


def _siglip_ckpt(tmp_path):
    tc = transformers.SiglipTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2,
        max_position_embeddings=64)
    vc = transformers.SiglipVisionConfig(
        hidden_size=40, intermediate_size=80, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14)
    cfg = transformers.SiglipConfig(text_config=tc.to_dict(),
                                    vision_config=vc.to_dict())
    torch.manual_seed(0)
    hf = transformers.SiglipModel(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    return hf


@pytest.mark.parametrize("family", ["clip", "siglip"])
def test_text_embeddings_match_hf(tmp_path, family):
    hf = (_clip_ckpt if family == "clip" else _siglip_ckpt)(tmp_path)
    # CLIP pools where HF's legacy rule points: argmax(input_ids) — in
    # real checkpoints EOS is the largest vocab id and ends the prompt,
    # which coincides with our last-token pooling. Use eos=63 here.
    prompts = [[1, 5, 9, 11, 63], [1, 30, 31, 7, 3, 22, 63]]
    pad = max(len(p) for p in prompts)
    ids_t = torch.tensor([p + [0] * (pad - len(p)) for p in prompts])
    mask = torch.tensor([[1] * len(p) + [0] * (pad - len(p))
                         for p in prompts])
    with torch.no_grad():
        if family == "clip":
            ref = hf.get_text_features(input_ids=ids_t,
                                       attention_mask=mask)
        else:
            # SigLIP pools the LAST position; drive unpadded per prompt.
            ref = torch.cat([hf.get_text_features(
                input_ids=torch.tensor([p])) for p in prompts])
    ref = _norm(ref.float().numpy())

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture in ("CLIPModel", "SiglipModel")
    model, params = load_model(mc, "safetensors")
    runner = PoolingRunner(model, params)
    ours = runner.embed(prompts)
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("family", ["clip", "siglip"])
def test_image_embeddings_match_hf(tmp_path, family):
    hf = (_clip_ckpt if family == "clip" else _siglip_ckpt)(tmp_path)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.tensor(pixels))
    ref = ref.float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(params, pixels))
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)
