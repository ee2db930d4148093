"""Third wave of tool parsers (reference formats: seed_oss/step3/
minimax_m2/minimax/ernie45/jamba/phi4mini/longcat/olmo3/hunyuan_a13b/
xlam/deepseekv31/granite4/gigachat3/qwen3xml/openai tool_parsers)."""

import json

from lvllm_tpu.tool_parsers import get_tool_parser


def test_seed_oss():
    p = get_tool_parser("seed_oss")
    text = ("Let me look.<seed:tool_call><function=get_weather>"
            "<parameter=city>Paris</parameter>"
            "<parameter=days>3</parameter>"
            "</function></seed:tool_call>")
    content, calls = p.extract(text)
    assert content == "Let me look."
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris", "days": 3}


def test_step3():
    p = get_tool_parser("step3")
    text = ("<｜tool_calls_begin｜><｜tool_call_begin｜>function"
            '<｜tool_sep｜><steptml:invoke name="search">'
            '<steptml:parameter name="q">tpu</steptml:parameter>'
            "</steptml:invoke><｜tool_call_end｜><｜tool_calls_end｜>")
    content, calls = p.extract(text)
    assert content == ""
    assert calls[0].name == "search"
    assert json.loads(calls[0].arguments) == {"q": "tpu"}


def test_minimax_m2():
    p = get_tool_parser("minimax_m2")
    text = ('Sure.<minimax:tool_call><invoke name="lookup">'
            '<parameter name="id">42</parameter></invoke>'
            "</minimax:tool_call>")
    content, calls = p.extract(text)
    assert content == "Sure."
    assert calls[0].name == "lookup"
    assert json.loads(calls[0].arguments) == {"id": 42}


def test_minimax_json_lines():
    p = get_tool_parser("minimax")
    text = ('<tool_calls>\n{"name": "a", "arguments": {"x": 1}}\n'
            '{"name": "b", "arguments": {}}\n</tool_calls>')
    content, calls = p.extract(text)
    assert [c.name for c in calls] == ["a", "b"]
    assert json.loads(calls[0].arguments) == {"x": 1}


def test_ernie45():
    p = get_tool_parser("ernie45")
    text = ('<response>ok</response><tool_call>'
            '{"name": "f", "arguments": {"k": "v"}}</tool_call>')
    content, calls = p.extract(text)
    assert calls[0].name == "f"
    assert json.loads(calls[0].arguments) == {"k": "v"}
    assert "tool_call" not in content


def test_jamba():
    p = get_tool_parser("jamba")
    text = ('hi <tool_calls>[{"name": "f", "arguments": {"a": 1}}]'
            "</tool_calls>")
    content, calls = p.extract(text)
    assert content == "hi"
    assert calls[0].name == "f"


def test_phi4_mini():
    p = get_tool_parser("phi4_mini_json")
    text = 'functools[{"name": "f", "arguments": {"a": 1}}]'
    content, calls = p.extract(text)
    assert calls[0].name == "f"
    assert json.loads(calls[0].arguments) == {"a": 1}


def test_longcat():
    p = get_tool_parser("longcat")
    text = ('<longcat_tool_call>{"name": "f", "arguments": {"a": 1}}'
            "</longcat_tool_call>")
    content, calls = p.extract(text)
    assert calls[0].name == "f"


def test_olmo3():
    p = get_tool_parser("olmo3")
    text = '<function_calls>\nfoo(a=1)\nbar(x="s")\n</function_calls>'
    content, calls = p.extract(text)
    assert [c.name for c in calls] == ["foo", "bar"]
    assert json.loads(calls[1].arguments) == {"x": "s"}
    # Plain prose passes through.
    content, calls = p.extract("no calls here")
    assert calls == [] and content == "no calls here"


def test_hunyuan_a13b():
    p = get_tool_parser("hunyuan_a13b")
    text = ('<answer>done</answer><tool_calls>'
            '[{"name": "f", "arguments": {"a": 1}}]</tool_calls>')
    content, calls = p.extract(text)
    assert calls[0].name == "f"
    assert content == "done"


def test_xlam():
    p = get_tool_parser("xlam")
    content, calls = p.extract('[{"name": "f", "arguments": {"a": 1}}]')
    assert calls[0].name == "f" and content == ""
    content, calls = p.extract(
        'text ```json\n[{"name": "g", "arguments": {}}]\n``` after')
    assert calls[0].name == "g"
    # A plain list is not a tool call.
    content, calls = p.extract("[1, 2]")
    assert calls == []


def test_deepseek_v31():
    p = get_tool_parser("deepseek_v31")
    text = ('<｜tool▁call▁begin｜>get_weather<｜tool▁sep｜>'
            '{"city": "SF"}<｜tool▁call▁end｜>')
    content, calls = p.extract(text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "SF"}


def test_granite4():
    p = get_tool_parser("granite4")
    text = ('<tool_call>{"name": "f", "arguments": {"a": 1}}</tool_call>')
    content, calls = p.extract(text)
    assert calls[0].name == "f"


def test_gigachat3():
    p = get_tool_parser("gigachat3")
    text = ('thinking<|message_sep|>function call<|role_sep|>\n'
            '{"name": "f", "arguments": {"a": 1}}')
    content, calls = p.extract(text)
    assert calls[0].name == "f"
    assert content == "thinking"


def test_qwen3_xml():
    p = get_tool_parser("qwen3_xml")
    text = ('<tool_call><function name="f">'
            '<parameter name="a">1</parameter></function></tool_call>')
    content, calls = p.extract(text)
    assert calls[0].name == "f"
    assert json.loads(calls[0].arguments) == {"a": 1}


def test_openai_harmony():
    p = get_tool_parser("openai")
    text = ("<|channel|>commentary to=functions.get_weather "
            '<|constrain|>json<|message|>{"city": "SF"}<|call|>'
            "<|channel|>final<|message|>The weather is sunny.<|end|>")
    content, calls = p.extract(text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "SF"}
    assert content == "The weather is sunny."
