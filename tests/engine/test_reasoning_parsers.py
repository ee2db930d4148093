"""Reasoning-parser registry tests (reference: vllm/reasoning/* —
tag conventions per model family)."""

import pytest

from lvllm_tpu.reasoning import get_reasoning_parser


def test_qwen3_tags_emitted_by_model():
    p = get_reasoning_parser("qwen3")
    r, c = p.extract("<think>step by step</think>The answer is 4.")
    assert r == "step by step"
    assert c == "The answer is 4."
    # No reasoning block at all → plain content.
    r, c = p.extract("plain answer")
    assert r is None and c == "plain answer"


def test_deepseek_r1_assumes_started():
    p = get_reasoning_parser("deepseek_r1")
    # Template already opened <think>: bare close tag splits.
    r, c = p.extract("let me think...</think>42")
    assert r == "let me think..." and c == "42"
    # Length-capped mid-reasoning: everything is reasoning.
    r, c = p.extract("unfinished thought")
    assert r == "unfinished thought" and c == ""


def test_minimax_m2_no_start_token():
    p = get_reasoning_parser("minimax_m2")
    r, c = p.extract("reasoning here</think>final")
    assert r == "reasoning here" and c == "final"


def test_mistral_bracket_tokens():
    p = get_reasoning_parser("mistral")
    r, c = p.extract("[THINK]inner monologue[/THINK]réponse")
    assert r == "inner monologue" and c == "réponse"


def test_ernie45_response_wrapper():
    p = get_reasoning_parser("ernie45")
    r, c = p.extract(
        "<think>\nabc\n</think>\n\n<response>\ndef\n</response>\n")
    assert r == "abc" and c == "def"


def test_hunyuan_answer_wrapper():
    p = get_reasoning_parser("hunyuan_a13b")
    r, c = p.extract("thoughts\n</think>\n<answer>final</answer>")
    assert r == "thoughts" and c == "final"


def test_granite_prose_markers():
    p = get_reasoning_parser("granite")
    r, c = p.extract("Here is my thought process: hmm ok "
                     "Here is my response: done.")
    assert r == "hmm ok" and c == "done."
    r, c = p.extract("no markers at all")
    assert r is None and c == "no markers at all"


def test_gptoss_harmony_channels():
    p = get_reasoning_parser("gptoss")
    text = ("<|channel|>analysis<|message|>User asks 2+2.<|end|>"
            "<|start|>assistant<|channel|>final<|message|>4<|return|>")
    r, c = p.extract(text)
    assert r == "User asks 2+2."
    assert c == "4"


def test_identity_passthrough():
    p = get_reasoning_parser("identity")
    r, c = p.extract("<think>x</think>y")
    assert r is None and c == "<think>x</think>y"


def test_unknown_raises():
    with pytest.raises(ValueError):
        get_reasoning_parser("nope")


def test_server_accepts_named_parser():
    from lvllm_tpu.entrypoints.openai_server import OpenAIServer

    class _Dummy:
        pass

    srv = OpenAIServer(_Dummy(), reasoning_parser="deepseek_r1")
    r, c = srv.reasoning_parser.extract("because...</think>yes")
    assert r == "because..." and c == "yes"


def test_registry_covers_reference_names():
    """All 22 reference registry names (vllm/reasoning/__init__.py:22)
    resolve here."""
    from lvllm_tpu.reasoning import get_reasoning_parser
    ref_names = [
        "deepseek_r1", "deepseek_v3", "deepseek_v4", "ernie45", "gemma4",
        "glm45", "openai_gptoss", "granite", "holo2", "hunyuan_a13b",
        "hy_v3", "kimi_k2", "mimo", "minimax_m2",
        "minimax_m2_append_think", "mistral", "nemotron_v3", "olmo3",
        "qwen3", "seed_oss", "step3", "step3p5"]
    for name in ref_names:
        p = get_reasoning_parser(name)
        assert hasattr(p, "extract"), name


def test_gemma4_channel_format():
    from lvllm_tpu.reasoning import get_reasoning_parser
    p = get_reasoning_parser("gemma4")
    r, c = p.extract("<|channel>thought\nlet me think<channel|>The answer.")
    assert r == "let me think"
    assert c == "The answer."
    r, c = p.extract("no thinking here")
    assert r is None and c == "no thinking here"


def test_seed_oss_tags():
    from lvllm_tpu.reasoning import get_reasoning_parser
    p = get_reasoning_parser("seed_oss")
    r, c = p.extract("<seed:think>hmm</seed:think>done")
    assert r == "hmm" and c == "done"


def test_append_think_keeps_content():
    from lvllm_tpu.reasoning import get_reasoning_parser
    p = get_reasoning_parser("minimax_m2_append_think")
    text = "deep thought</think>result"
    r, c = p.extract(text)
    assert r == "deep thought"
    assert c == text  # content retains the think block
