"""Zamba2 shared-block hybrid parity vs HF transformers (reference:
vllm models/zamba2.py; HF numerics modeling_zamba2)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tests.models.test_mamba1_jamba_parity import (  # noqa: E402
    _hf_greedy, _our_logits_engine)


def test_zamba2_parity(tmp_path):
    cfg = transformers.Zamba2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4,
        layers_block_type=["mamba", "hybrid", "mamba", "hybrid"],
        num_attention_heads=4, num_key_value_heads=4,
        attention_head_dim=32,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_ngroups=1, mamba_headdim=16, n_mamba_heads=8,
        num_mem_blocks=2, adapter_rank=8,
        use_shared_attention_adapter=True, use_mem_rope=True,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        use_cache=True, tie_word_embeddings=True)
    torch.manual_seed(3)
    hf_model = transformers.Zamba2ForCausalLM(cfg)
    hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    tokens = [1, 5, 9, 200, 3, 77, 40, 23]
    want = _hf_greedy(hf_model, tokens)
    got = _our_logits_engine(str(tmp_path), tokens)
    assert got == want, (got, want)


def test_zamba2_shared_blocks_cycle(tmp_path):
    """Blocks cycle round-robin: with 2 mem blocks and 3 hybrid layers,
    hybrid 0 and 2 share a block while their adapters differ."""
    cfg = transformers.Zamba2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=5,
        layers_block_type=["hybrid", "mamba", "hybrid", "mamba", "hybrid"],
        num_attention_heads=4, num_key_value_heads=4,
        attention_head_dim=32,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_ngroups=1, mamba_headdim=16, n_mamba_heads=8,
        num_mem_blocks=2, adapter_rank=8,
        use_shared_attention_adapter=False, use_mem_rope=False,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=True)
    torch.manual_seed(4)
    hf_model = transformers.Zamba2ForCausalLM(cfg)
    hf_model.eval()
    # HF refuses to safetensors-save cross-layer tied modules; save a
    # deduplicated copy manually (the loader maps both paths to one
    # shared block).
    from safetensors.torch import save_file
    sd = {k: v.clone().contiguous()
          for k, v in hf_model.state_dict().items()}
    import os
    save_file(sd, os.path.join(tmp_path, "model.safetensors"))
    cfg.save_pretrained(tmp_path)
    tokens = [2, 7, 100, 3, 9, 55]
    want = _hf_greedy(hf_model, tokens)
    got = _our_logits_engine(str(tmp_path), tokens)
    assert got == want, (got, want)
