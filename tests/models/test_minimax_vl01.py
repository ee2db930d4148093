"""MiniMax-VL-01 full-stack parity: HF CLIP tower + projector splice
into HF MiniMaxForCausalLM (inputs_embeds) as the oracle, through our
full loader (reference: vllm models/minimax_vl_01.py).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 90
HID, TH = 32, 64


def test_minimax_vl01_parity(tmp_path):
    tcfg = transformers.MiniMaxConfig(
        vocab_size=128, hidden_size=TH, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"])
    vcfg = transformers.CLIPVisionConfig(
        hidden_size=HID, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=HID)
    torch.manual_seed(41)
    text = transformers.MiniMaxForCausalLM(tcfg).eval()
    tower = transformers.CLIPVisionModel(vcfg).eval()
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    l1w, l1b = rnd(TH, HID), rnd(TH)
    l2w, l2b = rnd(TH, TH), rnd(TH)

    sd = {"language_model." + k: v for k, v in text.state_dict().items()}
    sd.update({"vision_tower." + k: v
               for k, v in tower.state_dict().items()
               if not k.startswith("vision_model.post_layernorm")})
    sd.update({"multi_modal_projector.linear_1.weight": l1w,
               "multi_modal_projector.linear_1.bias": l1b,
               "multi_modal_projector.linear_2.weight": l2w,
               "multi_modal_projector.linear_2.bias": l2b,
               "image_newline": rnd(TH)})
    from safetensors.torch import save_file
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["MiniMaxVL01ForConditionalGeneration"],
        "image_token_index": IMG_TOK,
        "vision_feature_layer": -2,
        "text_config": json.loads(tcfg.to_json_string()),
        "vision_config": json.loads(vcfg.to_json_string())}))

    rng = np.random.default_rng(15)
    pix = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ids = [1, 2] + [IMG_TOK] * 4 + [5, 9]      # 2x2 grid = 4 tokens
    with torch.no_grad():
        hs = tower(torch.tensor(pix),
                   output_hidden_states=True).hidden_states[-2][:, 1:, :]
        feats = torch.nn.functional.gelu(hs @ l1w.T + l1b) @ l2w.T + l2b
        emb = text.get_input_embeddings()(torch.tensor([ids]))
        emb[0, 2:6] = feats[0]
        ref = text(inputs_embeds=emb).logits[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "MiniMaxVL01ForConditionalGeneration"
    assert mc.image_token_id == IMG_TOK
    model, params = load_model(mc, "safetensors")
    feats_ours = np.asarray(model.encode_images(params, jnp.asarray(pix)),
                            np.float32).reshape(-1, TH)
    np.testing.assert_allclose(feats_ours, feats[0].numpy(),
                               rtol=3e-3, atol=3e-3)
    T = len(ids)
    mm_mask = np.asarray([t == IMG_TOK for t in ids])
    mm_embeds = np.zeros((T, TH), np.float32)
    mm_embeds[mm_mask] = feats_ours
    caches = [model.make_layer_cache(i, 8, 32, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(32 + jnp.arange(T)).astype(jnp.int32),
        row_slots=jnp.asarray([0, 1], jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.arange(T), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(ours, ref, rtol=6e-3, atol=6e-3)
