"""Encoder-only (BERT/RoBERTa) parity vs HuggingFace transformers
(reference strategy: HfRunner-vs-VllmRunner for the embedding families,
SURVEY.md §4; model reference: vllm models/bert.py, roberta.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402


def _our_hidden(model_dir, token_lists):
    mc = load_model_config(model_dir, max_model_len=128, dtype="float32")
    model, params = load_model(mc, "safetensors")
    T = sum(len(t) for t in token_lists)
    R = len(token_lists)
    ids = np.concatenate(token_lists).astype(np.int32)
    pos = np.concatenate([np.arange(len(t)) for t in token_lists])
    qsl = np.cumsum([0] + [len(t) for t in token_lists]).astype(np.int32)
    md = AttentionMetadata(
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray([len(t) for t in token_lists], jnp.int32),
        block_table=jnp.zeros((R, 4), jnp.int32),
        slot_mapping=jnp.zeros(T, jnp.int32))
    kv = [model.make_layer_cache(i, 8, 16, jnp.float32, R)
          for i in range(mc.num_hidden_layers)]
    hidden, _ = model(params, jnp.asarray(ids),
                      jnp.asarray(pos, jnp.int32), kv, md)
    return np.asarray(hidden), qsl, model, params


def test_bert_parity(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, type_vocab_size=2,
        hidden_act="gelu")
    torch.manual_seed(0)
    hf_model = transformers.BertModel(cfg)
    hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)

    seqs = [[2, 7, 100, 3, 9, 55], [1, 4, 4, 8]]
    ours, qsl, _m, _p = _our_hidden(str(tmp_path), seqs)
    for r, toks in enumerate(seqs):
        with torch.no_grad():
            hf = hf_model(torch.tensor([toks])).last_hidden_state[0]
        got = ours[qsl[r]:qsl[r + 1]]
        np.testing.assert_allclose(got, hf.float().numpy(),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"bert seq {r}")


def test_roberta_parity(tmp_path):
    cfg = transformers.RobertaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=130, type_vocab_size=1,
        pad_token_id=1, hidden_act="gelu")
    torch.manual_seed(1)
    hf_model = transformers.RobertaModel(cfg)
    hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)

    seqs = [[0, 7, 100, 3, 2]]
    ours, qsl, _m, _p = _our_hidden(str(tmp_path), seqs)
    with torch.no_grad():
        hf = hf_model(torch.tensor(seqs)).last_hidden_state[0]
    np.testing.assert_allclose(ours[:qsl[1]], hf.float().numpy(),
                               rtol=2e-3, atol=2e-3, err_msg="roberta")


def test_bert_embed_via_llm_api(tmp_path):
    """The public LLM.embed path pools encoder output (CLS by default)."""
    cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, type_vocab_size=2)
    torch.manual_seed(2)
    transformers.BertModel(cfg).save_pretrained(tmp_path,
                                                safe_serialization=True)
    from lvllm_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), max_model_len=128, max_num_seqs=2,
              num_kv_blocks=32, dtype="float32")
    embs = llm.embed([[2, 7, 9, 3], [1, 8, 5]])
    assert embs.shape == (2, 64)
    assert np.allclose(np.linalg.norm(embs, axis=-1), 1.0, atol=1e-5)
    assert not np.allclose(embs[0], embs[1])
