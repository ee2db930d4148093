"""Classification-head and ModernBERT parity vs HuggingFace transformers
(reference: vllm models/bert.py BertForSequenceClassification,
roberta.py classification heads, modernbert.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.engine.pooling import PoolingRunner  # noqa: E402


SEQS = [[2, 7, 100, 3, 9, 55], [1, 4, 4, 8]]


def _our_classify(model_dir, token_lists):
    mc = load_model_config(model_dir, max_model_len=128, dtype="float32")
    model, params = load_model(mc, "safetensors")
    runner = PoolingRunner(model, params)
    return model, runner.classify(token_lists)


def test_bert_sequence_classifier_parity(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, type_vocab_size=2,
        hidden_act="gelu", num_labels=3)
    torch.manual_seed(0)
    hf = transformers.BertForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    _m, got = _our_classify(str(tmp_path), SEQS)
    for r, toks in enumerate(SEQS):
        with torch.no_grad():
            want = hf(torch.tensor([toks])).logits[0].float().numpy()
        np.testing.assert_allclose(got[r], want, rtol=2e-3, atol=2e-3)


def test_roberta_sequence_classifier_parity(tmp_path):
    cfg = transformers.XLMRobertaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu", num_labels=1)   # rerank-style single score
    torch.manual_seed(1)
    hf = transformers.XLMRobertaForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    # Avoid the pad token id (1): HF RoBERTa derives position ids from
    # non-pad positions, so a pad id mid-sequence shifts positions.
    seqs = [[2, 7, 100, 3, 9, 55], [2, 4, 4, 8]]
    _m, got = _our_classify(str(tmp_path), seqs)
    for r, toks in enumerate(seqs):
        with torch.no_grad():
            want = hf(torch.tensor([toks])).logits[0].float().numpy()
        np.testing.assert_allclose(got[r], want, rtol=2e-3, atol=2e-3)


def test_bert_token_classifier_parity(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, type_vocab_size=2,
        hidden_act="gelu", num_labels=5)
    torch.manual_seed(2)
    hf = transformers.BertForTokenClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    _m, got = _our_classify(str(tmp_path), SEQS)
    for r, toks in enumerate(SEQS):
        with torch.no_grad():
            want = hf(torch.tensor([toks])).logits[0].float().numpy()
        np.testing.assert_allclose(got[r], want, rtol=2e-3, atol=2e-3)


def test_modernbert_hidden_parity(tmp_path):
    cfg = transformers.ModernBertConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4,
        max_position_embeddings=256, local_attention=4,
        global_attn_every_n_layers=2, pad_token_id=0)
    torch.manual_seed(3)
    hf = transformers.ModernBertModel(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    from lvllm_tpu.models.model_base import AttentionMetadata
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    for toks in SEQS:
        ids = np.asarray(toks, np.int32)
        md = AttentionMetadata(
            query_start_loc=jnp.asarray([0, len(toks)], jnp.int32),
            seq_lens=jnp.asarray([len(toks)], jnp.int32),
            block_table=jnp.zeros((1, 4), jnp.int32),
            slot_mapping=jnp.zeros(len(toks), jnp.int32))
        kv = [model.make_layer_cache(i, 8, 16, jnp.float32, 1)
              for i in range(mc.num_hidden_layers)]
        hidden, _ = model(params, jnp.asarray(ids),
                          jnp.arange(len(toks), dtype=jnp.int32), kv, md)
        with torch.no_grad():
            want = hf(torch.tensor([toks])).last_hidden_state[0]
        np.testing.assert_allclose(np.asarray(hidden),
                                   want.float().numpy(),
                                   rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("pooling", ["cls", "mean"])
def test_modernbert_classifier_parity(tmp_path, pooling):
    cfg = transformers.ModernBertConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=256, local_attention=4,
        global_attn_every_n_layers=2, pad_token_id=0, num_labels=3,
        classifier_pooling=pooling)
    torch.manual_seed(4)
    hf = transformers.ModernBertForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    _m, got = _our_classify(str(tmp_path), SEQS)
    for r, toks in enumerate(SEQS):
        with torch.no_grad():
            want = hf(torch.tensor([toks])).logits[0].float().numpy()
        np.testing.assert_allclose(got[r], want, rtol=3e-3, atol=3e-3)


def test_qwen2_reward_head():
    """score.0 → ReLU → score.2 head over the decoder (reference
    qwen2_rm.py); no HF mainline class, so verify against a manual
    numpy recomputation of the head on our own hidden states."""
    from lvllm_tpu.config import ModelConfig
    from lvllm_tpu.models.registry import build_model

    mc = ModelConfig(
        model="dummy", architecture="Qwen2ForRewardModel",
        dtype="float32", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
        max_model_len=128, eos_token_id=-1, num_labels=2)
    model = build_model(mc)
    rng = np.random.default_rng(0)
    params = model.init_params(0)
    params["score0"] = {
        "kernel": jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(64), jnp.float32)}
    params["score2"] = {
        "kernel": jnp.asarray(rng.standard_normal((64, 2)), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(2), jnp.float32)}
    runner = PoolingRunner(model, params)
    toks = [[1, 2, 3, 4], [5, 6, 7]]
    got = runner.classify(toks)
    assert got[0].shape == (2,) and got[1].shape == (2,)

    # Manual recomputation from the model's own hidden states.
    from lvllm_tpu.models.model_base import AttentionMetadata
    args = runner._batch_args(toks)
    hidden, _ = model(params, *args[:2],
                      args[6], AttentionMetadata(
                          query_start_loc=args[2], seq_lens=args[3],
                          block_table=args[4], slot_mapping=args[5]))
    h = np.asarray(hidden)
    qsl = np.cumsum([0] + [len(t) for t in toks])
    for r in range(2):
        last = h[qsl[r + 1] - 1]
        z = np.maximum(
            last @ np.asarray(params["score0"]["kernel"])
            + np.asarray(params["score0"]["bias"]), 0.0)
        want = z @ np.asarray(params["score2"]["kernel"]) + \
            np.asarray(params["score2"]["bias"])
        np.testing.assert_allclose(got[r], want, rtol=1e-4, atol=1e-4)


def test_embedding_model_aliases_register():
    from lvllm_tpu.models.registry import get_model_class
    for arch in ("LlamaModel", "MistralModel", "Qwen2Model", "GritLM",
                 "Gemma2Model", "Gemma3TextModel",
                 "InternLM3ForCausalLM", "CwmForCausalLM",
                 "MiMoForCausalLM", "StableLMEpochForCausalLM",
                 "ModernBertModel", "BertForSequenceClassification",
                 "RobertaForSequenceClassification",
                 "XLMRobertaForSequenceClassification",
                 "Qwen2ForRewardModel", "Qwen2ForProcessRewardModel"):
        assert get_model_class(arch) is not None, arch


def test_bare_llama_model_embedding_checkpoint_loads(tmp_path):
    """Embedding conversions (LlamaModel/MistralModel/Qwen2Model) ship
    checkpoints WITHOUT the "model." prefix (e5-mistral style) — the
    loader must map them and the pooling path must produce embeddings."""
    import json

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(0)
    hf = transformers.LlamaModel(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)
    c = json.load(open(tmp_path / "config.json"))
    c["architectures"] = ["LlamaModel"]
    json.dump(c, open(tmp_path / "config.json", "w"))

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    import safetensors.numpy as stn
    sd = stn.load_file(str(tmp_path / "model.safetensors"))
    np.testing.assert_array_equal(
        np.asarray(params["embed"]["weight"]), sd["embed_tokens.weight"])
    runner = PoolingRunner(model, params)
    emb = runner.embed([[1, 2, 3], [4, 5]], pooling="last")
    assert emb.shape == (2, 64)
    assert np.all(np.isfinite(emb))


def test_ernie_sequence_classifier_parity(tmp_path):
    cfg = transformers.ErnieConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, type_vocab_size=2,
        task_type_vocab_size=3, use_task_id=True,
        hidden_act="gelu", num_labels=3)
    torch.manual_seed(3)
    hf = transformers.ErnieForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    _m, got = _our_classify(str(tmp_path), SEQS)
    for r, toks in enumerate(SEQS):
        with torch.no_grad():
            want = hf(torch.tensor([toks])).logits[0].float().numpy()
        np.testing.assert_allclose(got[r], want, rtol=2e-3, atol=2e-3)


def test_gpt2_sequence_classifier_parity(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=512, n_embd=64, n_inner=128, n_layer=2, n_head=4,
        n_positions=128, num_labels=3, pad_token_id=0)
    torch.manual_seed(4)
    hf = transformers.GPT2ForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    _m, got = _our_classify(str(tmp_path), SEQS)
    for r, toks in enumerate(SEQS):
        with torch.no_grad():
            want = hf(torch.tensor([toks])).logits[0].float().numpy()
        np.testing.assert_allclose(got[r], want, rtol=3e-3, atol=3e-3)


def test_new_classifier_archs_register_and_build():
    from lvllm_tpu.models.registry import get_model_class

    for arch in ("JambaForSequenceClassification",
                 "GteNewForSequenceClassification",
                 "ErnieModel", "ErnieForTokenClassification",
                 "GPT2ForSequenceClassification"):
        get_model_class(arch)


def test_jamba_sequence_classifier_parity(tmp_path):
    cfg = transformers.JambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=1,
        num_experts=4, num_experts_per_tok=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_dt_rank=8, use_mamba_kernels=False,
        max_position_embeddings=128, tie_word_embeddings=False,
        num_labels=3, pad_token_id=0)
    torch.manual_seed(5)
    hf = transformers.JambaForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    _m, got = _our_classify(str(tmp_path), SEQS)
    for r, toks in enumerate(SEQS):
        with torch.no_grad():
            want = hf(torch.tensor([toks])).logits[0].float().numpy()
        np.testing.assert_allclose(got[r], want, rtol=3e-3, atol=3e-3)
