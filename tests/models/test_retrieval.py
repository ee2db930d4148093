"""Retrieval model tests: SPLADE sparse pooling, ColBERT late interaction,
BGE-M3 dense alias, and bidirectional-decoder embedders.

Oracles: HF BertForMaskedLM for SPLADE logits; HF BertModel + an explicit
projection for ColBERT; invariance checks for the bidirectional mask
(position-0 hidden must see future tokens). Reference: vllm
models/bert.py:685, models/colbert.py, models/llama.py:597-606,
models/voyage.py.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
from safetensors.torch import load_file, save_file  # noqa: E402

from lvllm_tpu.engine.pooling import PoolingRunner  # noqa: E402
from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402


def _runner(model_dir):
    mc = load_model_config(model_dir, max_model_len=128, dtype="float32")
    model, params = load_model(mc, "safetensors")
    return PoolingRunner(model, params, block_size=16, max_tokens=512)


def test_splade_parity(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, type_vocab_size=2, hidden_act="gelu")
    torch.manual_seed(3)
    hf = transformers.BertForMaskedLM(cfg)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["BertSpladeSparseEmbeddingModel"]
    (tmp_path / "config.json").write_text(json.dumps(d))

    seqs = [[2, 7, 100, 3, 9, 55], [1, 4, 4, 8]]
    got = _runner(str(tmp_path)).embed(seqs, normalize=False)
    for r, toks in enumerate(seqs):
        with torch.no_grad():
            logits = hf(torch.tensor([toks])).logits[0]
        act = torch.log1p(torch.relu(logits))[1:-1]   # mask CLS/SEP slots
        want = act.max(dim=0).values.float().numpy()
        np.testing.assert_allclose(got[r], want, rtol=3e-3, atol=3e-3,
                                   err_msg=f"splade seq {r}")
    # Sparse: most vocab entries inactive.
    assert (got > 0).mean() < 0.9


def test_colbert_token_embeddings(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, type_vocab_size=2, hidden_act="gelu")
    torch.manual_seed(4)
    hf = transformers.BertModel(cfg)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    # Append the ColBERT projection with HF_ColBERT naming ("bert." +
    # top-level linear.weight).
    t = load_file(str(tmp_path / "model.safetensors"))
    out = {"bert." + k: v for k, v in t.items()}
    lin = torch.randn(32, 64) * 0.1
    out["linear.weight"] = lin
    save_file(out, str(tmp_path / "model.safetensors"))
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["HF_ColBERT"]
    d["dim"] = 32
    (tmp_path / "config.json").write_text(json.dumps(d))

    seqs = [[2, 7, 100, 3], [1, 4, 4, 8, 9]]
    mats = _runner(str(tmp_path)).embed_token_level(seqs)
    assert [m.shape for m in mats] == [(4, 32), (5, 32)]
    for r, toks in enumerate(seqs):
        with torch.no_grad():
            hid = hf(torch.tensor([toks])).last_hidden_state[0]
        want = (hid @ lin.T)
        want = want / want.norm(dim=-1, keepdim=True)
        np.testing.assert_allclose(mats[r], want.float().numpy(),
                                   rtol=3e-3, atol=3e-3,
                                   err_msg=f"colbert seq {r}")


def test_bge_m3_dense_alias(tmp_path):
    cfg = transformers.XLMRobertaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu")
    torch.manual_seed(5)
    hf = transformers.XLMRobertaModel(cfg)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["BgeM3EmbeddingModel"]
    (tmp_path / "config.json").write_text(json.dumps(d))
    seqs = [[0, 7, 100, 2], [0, 4, 4, 8, 2]]
    got = _runner(str(tmp_path)).embed(seqs)          # CLS pooling
    for r, toks in enumerate(seqs):
        with torch.no_grad():
            hid = hf(torch.tensor([toks])).last_hidden_state[0, 0]
        want = hid / hid.norm()
        np.testing.assert_allclose(got[r], want.float().numpy(),
                                   rtol=3e-3, atol=3e-3,
                                   err_msg=f"bge-m3 seq {r}")


def _tiny_llama_ck(tmp_path, arch, extra_cfg=None, extra_weights=None):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(6)
    model = transformers.AutoModelForCausalLM.from_config(cfg)
    model.eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    t = dict(load_file(str(tmp_path / "model.safetensors")))
    t.pop("lm_head.weight", None)
    if extra_weights:
        t.update(extra_weights)
    save_file(t, str(tmp_path / "model.safetensors"))
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = [arch]
    d.update(extra_cfg or {})
    (tmp_path / "config.json").write_text(json.dumps(d))
    return model


def test_llama_bidirectional_sees_future(tmp_path):
    _tiny_llama_ck(tmp_path, "LlamaBidirectionalModel",
                   {"pooling": "avg"})
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    runner = PoolingRunner(model, params, block_size=16, max_tokens=512)
    assert model.default_pooling == "mean"
    a = runner.embed([[5, 9, 20, 33]])
    b = runner.embed([[5, 9, 20, 77]])       # only the LAST token differs
    c = runner.embed([[5, 9, 20, 33]])
    # Deterministic, and the mask is truly bidirectional: a causal mean
    # pool would still differ, but per-token check is stronger.
    np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-6)
    mats_a = np.asarray(runner._fwd(
        params, *runner._batch_args([[5, 9, 20, 33]]),
        np.ones(1, bool), pooling="cls"))
    mats_b = np.asarray(runner._fwd(
        params, *runner._batch_args([[5, 9, 20, 77]]),
        np.ones(1, bool), pooling="cls"))
    # CLS (=first token) embedding must change when a FUTURE token does.
    assert np.abs(mats_a - mats_b).max() > 1e-4
    assert np.abs(a - b).max() > 1e-4


def test_voyage_embed_head(tmp_path):
    lin = torch.randn(24, 64) * 0.1
    _tiny_llama_ck(tmp_path, "VoyageQwen3BidirectionalEmbedModel",
                   {"num_labels": 24}, {"linear.weight": lin})
    runner = _runner(str(tmp_path))
    got = runner.embed([[5, 9, 20, 33], [1, 2]])
    assert got.shape == (2, 24)
    norms = np.linalg.norm(got, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_llama_bidirectional_classifier(tmp_path):
    score = torch.randn(3, 64) * 0.1
    _tiny_llama_ck(tmp_path, "LlamaBidirectionalForSequenceClassification",
                   {"pooling": "avg", "num_labels": 3},
                   {"score.weight": score})
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    runner = PoolingRunner(model, params, block_size=16, max_tokens=512)
    out = runner.classify([[5, 9, 20, 33], [1, 2]])
    assert len(out) == 2 and all(o.shape[-1] == 3 for o in out)
    assert all(np.isfinite(o).all() for o in out)
    # Mean-pooled bidirectional score must react to any token change.
    out2 = runner.classify([[5, 9, 21, 33], [1, 2]])
    assert np.abs(out[0] - out2[0]).max() > 1e-5


# ---------------------------------------------------------------------------
# NomicBert: torch mini-oracle (rotary + post-norm BERT + swiglu MLP;
# reference bert_with_rope.py:535).

def _nomic_oracle(w, tokens, NH=4, D=16, eps=1e-12):
    import torch.nn.functional as F
    T = len(tokens)
    h = w["emb"][tokens] + w["tt"][0][None]

    def ln(x, ww, b):
        return F.layer_norm(x.float(), (x.shape[-1],), ww, b, eps)

    h = ln(h, w["emb_ln_w"], w["emb_ln_b"])
    pos = torch.arange(T)
    half = D // 2
    inv = 1.0 / (1000.0 ** (torch.arange(half).float() / half))
    ang = pos[:, None].float() * inv[None, :]
    cos, sin = torch.cos(ang), torch.sin(ang)

    def rope(x):
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos[:, None] - x2 * sin[:, None],
                          x2 * cos[:, None] + x1 * sin[:, None]], dim=-1)

    for lw in w["layers"]:
        qkv = h @ lw["wqkv"].T + lw["wqkv_b"]
        q, k, v = qkv.split(NH * D, dim=-1)
        q = rope(q.view(T, NH, D))
        k = rope(k.view(T, NH, D))
        v = v.view(T, NH, D)
        att = torch.softmax(
            torch.einsum("qhd,khd->hqk", q, k) * D ** -0.5, dim=-1)
        o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, -1)
        o = o @ lw["out"].T + lw["out_b"]
        h = ln(h + o, lw["n1_w"], lw["n1_b"])
        y = (F.silu(h @ lw["fc12"].T) * (h @ lw["fc11"].T)) @ lw["fc2"].T
        h = ln(h + y, lw["n2_w"], lw["n2_b"])
    return h


def test_nomic_bert_parity_vs_oracle(tmp_path):
    V, H, L, NH, D, I = 96, 64, 2, 4, 16, 96
    torch.manual_seed(17)
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    w = {"emb": rnd(V, H), "tt": rnd(2, H),
         "emb_ln_w": torch.rand(H) + 0.5, "emb_ln_b": rnd(H),
         "layers": []}
    sd = {"embeddings.word_embeddings.weight": w["emb"],
          "embeddings.token_type_embeddings.weight": w["tt"],
          "emb_ln.weight": w["emb_ln_w"], "emb_ln.bias": w["emb_ln_b"]}
    for li in range(L):
        lw = {"wqkv": rnd(3 * H, H), "wqkv_b": rnd(3 * H),
              "out": rnd(H, H), "out_b": rnd(H),
              "n1_w": torch.rand(H) + 0.5, "n1_b": rnd(H),
              "n2_w": torch.rand(H) + 0.5, "n2_b": rnd(H),
              "fc11": rnd(I, H), "fc12": rnd(I, H), "fc2": rnd(H, I)}
        w["layers"].append(lw)
        p = f"encoder.layers.{li}."
        sd[p + "attn.Wqkv.weight"] = lw["wqkv"]
        sd[p + "attn.Wqkv.bias"] = lw["wqkv_b"]
        sd[p + "attn.out_proj.weight"] = lw["out"]
        sd[p + "attn.out_proj.bias"] = lw["out_b"]
        sd[p + "norm1.weight"] = lw["n1_w"]
        sd[p + "norm1.bias"] = lw["n1_b"]
        sd[p + "norm2.weight"] = lw["n2_w"]
        sd[p + "norm2.bias"] = lw["n2_b"]
        sd[p + "mlp.fc11.weight"] = lw["fc11"]
        sd[p + "mlp.fc12.weight"] = lw["fc12"]
        sd[p + "mlp.fc2.weight"] = lw["fc2"]
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["NomicBertModel"],
        "vocab_size": V, "n_embd": H, "n_layer": L, "n_head": NH,
        "n_inner": I, "n_positions": 256, "layer_norm_epsilon": 1e-12,
        "rotary_emb_base": 1000.0, "rotary_emb_fraction": 1.0,
        "type_vocab_size": 2, "activation_function": "swiglu"}))
    seqs = [[2, 7, 80, 3], [1, 4, 4, 8, 9]]
    runner = _runner(str(tmp_path))
    got = runner.embed(seqs)                    # CLS pooled + normalized
    for r, toks in enumerate(seqs):
        with torch.no_grad():
            hs = _nomic_oracle(w, toks)
        want = hs[0] / hs[0].norm()
        np.testing.assert_allclose(got[r], want.float().numpy(),
                                   rtol=3e-3, atol=3e-3,
                                   err_msg=f"nomic seq {r}")
