"""HF logit parity for ALiBi families (Bloom, MPT) and the ALiBi slope /
attention-bias numerics (SURVEY §2.8 registry breadth; reference:
models/bloom.py, models/mpt.py, models/baichuan.py ALIBI branch)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tests.models.test_hf_parity import (compare, hf_logits,  # noqa: E402
                                         our_logits, save_hf_model)


def test_alibi_slopes_match_hf_bloom():
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor
    from lvllm_tpu.ops.attention import alibi_slopes
    for n in (4, 8, 12, 32, 40, 112):
        attn_mask = torch.ones(1, 5)
        hf = build_alibi_tensor(attn_mask, n, torch.float32)
        # hf[0, h, 0, :] = slope_h * arange → slope is hf[., ., 1].
        hf_slopes = hf.view(1, n, 5)[0, :, 1].numpy()
        ours = np.asarray(alibi_slopes(n))
        np.testing.assert_allclose(ours, hf_slopes, rtol=1e-6,
                                   err_msg=f"n={n}")


def test_bloom_parity(tmp_path):
    cfg = transformers.BloomConfig(
        vocab_size=512, hidden_size=64, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5, tie_word_embeddings=True)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [5, 55, 505, 43, 210, 87, 399, 21]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "bloom")


def test_mpt_parity(tmp_path):
    # NB: HF MptMLP hardcodes 4×d_model and ignores expansion_ratio, so the
    # test keeps the default ratio (all real MPT checkpoints use 4).
    cfg = transformers.MptConfig(
        vocab_size=512, d_model=64, n_layers=2, n_heads=4,
        max_seq_len=256,
        attn_config=transformers.models.mpt.configuration_mpt
        .MptAttentionConfig(alibi=True, clip_qkv=None),
        no_bias=True, tie_word_embeddings=True)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [9, 19, 29, 139, 339, 77, 410]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "mpt")


def test_alibi_attention_oracle():
    """ALiBi bias in the ragged attention reference vs a dense softmax
    computed the HF way (slope * key_pos, shift-invariant equal)."""
    import jax.numpy as jnp
    from lvllm_tpu.ops.attention import (alibi_slopes,
                                         ragged_paged_attention_reference)
    rng = np.random.default_rng(0)
    T, H, D, BS, NB = 7, 4, 16, 4, 8
    q = jnp.asarray(rng.standard_normal((T, H, D), np.float32))
    kv = jnp.asarray(rng.standard_normal((2, NB, BS, H, D), np.float32))
    block_table = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7]], jnp.int32)
    qsl = jnp.asarray([0, T], jnp.int32)
    seq_lens = jnp.asarray([T], jnp.int32)
    slopes = alibi_slopes(H)
    out = ragged_paged_attention_reference(
        q, kv, block_table, qsl, seq_lens, scale=D ** -0.5,
        alibi_slopes=slopes)
    # Dense oracle over the first T cached tokens.
    k = np.asarray(kv[0]).reshape(-1, H, D)[:T]
    v = np.asarray(kv[1]).reshape(-1, H, D)[:T]
    qn = np.asarray(q)
    sl = np.asarray(slopes)
    expected = np.zeros_like(qn)
    for t in range(T):
        for h in range(H):
            s = (qn[t, h] @ k[: t + 1, h].T) * D ** -0.5
            s = s + sl[h] * np.arange(t + 1)   # HF build_alibi_tensor form
            p = np.exp(s - s.max())
            p /= p.sum()
            expected[t, h] = p @ v[: t + 1, h]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5,
                               atol=2e-5)
