"""Tool parser family coverage (llama3_json / mistral / deepseek_v3 /
glm4 / qwen3_coder)."""

import json

from lvllm_tpu.tool_parsers import get_tool_parser


def test_llama3_json():
    p = get_tool_parser("llama3_json")
    c, calls = p.extract(
        '<|python_tag|>{"name": "get_weather", "parameters": '
        '{"city": "SF"}}; {"name": "f2", "parameters": {}}')
    assert [t.name for t in calls] == ["get_weather", "f2"]
    assert json.loads(calls[0].arguments) == {"city": "SF"}
    c2, calls2 = p.extract('{"name": "solo", "parameters": {"x": 1}}')
    assert calls2[0].name == "solo" and c2 == ""
    c3, calls3 = p.extract("plain text, no calls")
    assert calls3 == [] and c3 == "plain text, no calls"


def test_mistral():
    p = get_tool_parser("mistral")
    c, calls = p.extract(
        'ok [TOOL_CALLS] [{"name": "a", "arguments": {"k": 2}}]')
    assert c == "ok" and calls[0].name == "a"
    assert json.loads(calls[0].arguments) == {"k": 2}
    assert p.extract("no calls here")[1] == []
    # malformed json → passthrough
    t = "[TOOL_CALLS] [{bad"
    assert p.extract(t) == (t, [])


def test_deepseek_v3():
    p = get_tool_parser("deepseek_v3")
    text = ("pre<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>lookup\n```json\n{\"q\": \"x\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
    c, calls = p.extract(text)
    assert calls[0].name == "lookup"
    assert json.loads(calls[0].arguments) == {"q": "x"}
    assert c == "pre"


def test_glm4():
    p = get_tool_parser("glm4")
    text = ("<tool_call>search\n<arg_key>query</arg_key>"
            "<arg_value>llm</arg_value><arg_key>n</arg_key>"
            "<arg_value>3</arg_value></tool_call>")
    c, calls = p.extract(text)
    assert calls[0].name == "search"
    assert json.loads(calls[0].arguments) == {"query": "llm", "n": 3}
    assert c == ""


def test_qwen3_coder():
    p = get_tool_parser("qwen3_coder")
    text = ("<tool_call><function=run><parameter=cmd>ls -la</parameter>"
            "<parameter=timeout>5</parameter></function></tool_call>")
    c, calls = p.extract(text)
    assert calls[0].name == "run"
    assert json.loads(calls[0].arguments) == {"cmd": "ls -la", "timeout": 5}
