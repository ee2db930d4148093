"""guided_grammar (EBNF / Earley) + jump-forward decoding tests
(reference: xgrammar-backed guided_grammar backend and the structured
backends' find_jump_forward_string)."""

import numpy as np

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams
from lvllm_tpu.structured_output.ebnf import EbnfGrammar
from lvllm_tpu.structured_output.grammar import RegexGrammar


class CharTokenizer:
    eos_token_id = 0

    def encode(self, text, add_special_tokens=False):
        return [ord(c) % 128 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(t) for t in ids if t > 0)


def _adv(g, s):
    for c in s:
        assert g.advance(ord(c)), (s, c)


# ---- unit: EBNF parsing + recognition ---------------------------------------

EXPR = r"""
# arithmetic over single digits, GBNF style
root ::= expr
expr ::= term (("+" | "-") term)*
term ::= digit | "(" expr ")"
digit ::= [0-9]
"""


def test_ebnf_accepts_nested_expression():
    g = EbnfGrammar(EXPR, CharTokenizer(), 128, eos_token_id=0)
    _adv(g, "(1+2)-(3+(4-5))")
    assert g.is_complete
    assert g.advance(0)


def test_ebnf_rejects_bad_chars():
    g = EbnfGrammar(EXPR, CharTokenizer(), 128, eos_token_id=0)
    _adv(g, "1+")
    assert not g.advance(ord("+"))   # "1++" invalid
    m = g.allowed_token_mask()
    assert m[ord("2")] and m[ord("(")]
    assert not m[ord("+")] and not m[0]   # not accepting mid-expression


def test_ebnf_mask_and_eos():
    g = EbnfGrammar(EXPR, CharTokenizer(), 128, eos_token_id=0)
    m = g.allowed_token_mask()
    assert m[ord("7")] and m[ord("(")] and not m[ord("+")] and not m[0]
    _adv(g, "7")
    m = g.allowed_token_mask()
    assert m[0]                      # accepting → EOS allowed
    assert m[ord("+")] and m[ord("-")] and not m[ord("8")]


def test_ebnf_lark_syntax_and_nullable():
    g = EbnfGrammar("start: \"a\" maybe \"c\"\nmaybe: \"b\"?",
                    CharTokenizer(), 128, eos_token_id=0)
    _adv(g, "ac")
    assert g.is_complete
    g2 = EbnfGrammar("start: \"a\" maybe \"c\"\nmaybe: \"b\"?",
                     CharTokenizer(), 128, eos_token_id=0)
    _adv(g2, "abc")
    assert g2.is_complete


def test_ebnf_left_recursion():
    g = EbnfGrammar('root ::= root "a" | "a"', CharTokenizer(), 128,
                    eos_token_id=0)
    _adv(g, "aaaa")
    assert g.is_complete


# ---- unit: forced continuations ---------------------------------------------

def test_ebnf_forced_continuation():
    g = EbnfGrammar('root ::= "hello" [0-9] "world"', CharTokenizer(), 128,
                    eos_token_id=0)
    assert g.forced_continuation() == "hello"
    _adv(g, "hello3")
    assert g.forced_continuation() == "world"


def test_regex_forced_continuation():
    g = RegexGrammar(r"ab[0-9]cd", CharTokenizer(), 128, eos_token_id=0)
    assert g.forced_continuation() == "ab"
    _adv(g, "ab7")
    assert g.forced_continuation() == "cd"


# ---- e2e through the engine ---------------------------------------------------

def build_engine():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, max_model_len=128,
        eos_token_id=0, seed=9)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4,
                                         max_model_len=128))
    return LLMEngine(cfg, load_format="dummy", tokenizer=CharTokenizer())


def run(engine, prompt, sp):
    engine.add_request("r0", prompt, sp)
    final, steps = None, 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                final = o
        steps += 1
        assert steps < 200
    return final, steps


def test_guided_grammar_e2e():
    eng = build_engine()
    sp = SamplingParams(temperature=0.8, seed=5, max_tokens=30,
                        guided_grammar=EXPR)
    out, _ = run(eng, "calc", sp)
    text = out.outputs[0].text
    g = EbnfGrammar(EXPR, CharTokenizer(), 128, eos_token_id=0)
    for c in text:
        assert g.advance(ord(c)), text
    if out.outputs[0].finish_reason == "stop":
        assert g.is_complete, text


def test_jump_forward_choice_takes_fewer_steps():
    # A single long choice is fully forced after its first token: the
    # engine appends the rest via jump-forward and computes their KV in
    # one catch-up step instead of one decode step per token.
    choice = "abcdefghijklmnopqrstuvwxyz"
    eng = build_engine()
    sp = SamplingParams(temperature=0.0, max_tokens=40,
                        guided_choice=[choice])
    out, steps = run(eng, "spell", sp)
    assert out.outputs[0].text == choice
    assert steps <= 6, steps      # vs 26+ without jump-forward


def test_jump_forward_grammar_output_matches_plain_masking():
    gram = 'root ::= "print(" [0-9] ")" '
    eng = build_engine()
    sp = SamplingParams(temperature=0.0, max_tokens=20, guided_grammar=gram)
    out, steps = run(eng, "emit code", sp)
    text = out.outputs[0].text
    assert text.startswith("print(") and text.endswith(")")
    assert len(text) == len("print(") + 2
    assert steps <= 8, steps


def test_jump_forward_respects_max_tokens():
    choice = "abcdefghijklmnopqrstuvwxyz"
    eng = build_engine()
    sp = SamplingParams(temperature=0.0, max_tokens=5,
                        guided_choice=[choice])
    out, _ = run(eng, "spell", sp)
    assert out.outputs[0].text == choice[:5]
    assert out.outputs[0].finish_reason == "length"
