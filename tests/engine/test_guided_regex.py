"""guided_regex structured output (reference: xgrammar/outlines regex
backend): NFA unit behavior + engine-level constrained decoding."""

import re

import numpy as np
import pytest

from lvllm_tpu.structured_output.grammar import RegexGrammar


class CharTokenizer:
    """One token per printable char (id = ord)."""

    eos_token_id = 0

    def encode(self, text):
        return [ord(c) for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(t) for t in ids if 32 <= t < 127)


VOCAB = 128


def _gen(pattern, drive, eos=0):
    """Greedy-drive the grammar with a chooser callback over allowed ids."""
    g = RegexGrammar(pattern, CharTokenizer(), VOCAB, eos_token_id=eos)
    out = []
    for _ in range(32):
        mask = g.allowed_token_mask()
        ids = np.nonzero(mask)[0]
        assert len(ids), "grammar dead-ended"
        tid = drive(ids)
        assert g.advance(int(tid))
        if tid == eos:
            break
        out.append(chr(tid))
    return "".join(out)


def test_regex_literal_and_classes():
    text = _gen(r"ab[0-9]c", lambda ids: ids[-1])  # always pick largest
    assert re.fullmatch(r"ab[0-9]c", text)


def test_regex_alternation_and_quantifiers():
    pat = r"(yes|no)!*"
    for pick in (lambda ids: ids[0], lambda ids: ids[-1]):
        text = _gen(pat, pick)
        assert re.fullmatch(pat, text), text


def test_regex_escapes():
    pat = r"\d\d-\w+\s?"
    text = _gen(pat, lambda ids: ids[0])
    assert re.fullmatch(pat, text), text


def test_regex_rejects_illegal():
    g = RegexGrammar(r"[ab]c", CharTokenizer(), VOCAB, eos_token_id=0)
    assert not g.advance(ord("x"))
    assert g.advance(ord("a"))
    assert not g.advance(0)       # EOS before accept state
    assert g.advance(ord("c"))
    assert g.is_complete
    assert g.advance(0)           # EOS at accept


def test_regex_multichar_tokens():
    class WordTok(CharTokenizer):
        def decode(self, ids, skip_special_tokens=True):
            if ids == [1]:
                return "foo"
            if ids == [2]:
                return "bar"
            return super().decode(ids)

    g = RegexGrammar(r"foo(bar)?", WordTok(), VOCAB, eos_token_id=0)
    mask = g.allowed_token_mask()
    assert mask[1] and not mask[2]       # "foo" legal now, "bar" not
    assert g.advance(1)
    mask = g.allowed_token_mask()
    assert mask[2] and mask[0]           # "bar" or EOS


def test_engine_guided_regex():
    from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
    from lvllm_tpu.engine.llm_engine import LLMEngine
    from lvllm_tpu.sampling_params import SamplingParams

    cfg = EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
            vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=0),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128))
    eng = LLMEngine(cfg, load_format="dummy", tokenizer=CharTokenizer())
    eng.add_request("r0", [1, 2, 3],
                    SamplingParams(temperature=0.0, max_tokens=20,
                                   guided_regex=r"(yes|no)( maybe)?"))
    done = None
    for _ in range(40):
        for o in eng.step():
            if o.finished:
                done = o
        if done:
            break
    assert done is not None
    text = "".join(chr(t) for t in done.outputs[0].token_ids if t != 0)
    assert re.fullmatch(r"(yes|no)( maybe)?", text), text
