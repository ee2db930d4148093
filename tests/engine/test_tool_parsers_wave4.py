"""Tool parsers wave 4: deepseek_v32/v4 DSML, functiongemma, gemma4,
glm47, granite-20b-fc, hy_v3, step3p5 (reference formats per
vllm/tool_parsers/*_tool_parser.py docstrings)."""

import json

from lvllm_tpu.tool_parsers import get_tool_parser


def _one(parser, text):
    content, calls = get_tool_parser(parser).extract(text)
    return content, calls


def test_deepseek_v32_dsml():
    text = (
        "Let me check.<｜DSML｜function_calls>"
        '<｜DSML｜invoke name="get_weather">'
        '<｜DSML｜parameter name="location" string="true">杭州'
        "</｜DSML｜parameter>"
        '<｜DSML｜parameter name="days" string="false">3</｜DSML｜parameter>'
        "</｜DSML｜invoke>"
        '<｜DSML｜invoke name="get_weather">'
        '<｜DSML｜parameter name="location" string="true">北京'
        "</｜DSML｜parameter>"
        "</｜DSML｜invoke>"
        "</｜DSML｜function_calls>")
    content, calls = _one("deepseek_v32", text)
    assert content == "Let me check."
    assert [c.name for c in calls] == ["get_weather", "get_weather"]
    assert json.loads(calls[0].arguments) == {"location": "杭州", "days": 3}
    assert json.loads(calls[1].arguments) == {"location": "北京"}


def test_deepseek_v4_dsml_tool_calls_wrapper():
    text = ("<｜DSML｜tool_calls>"
            '<｜DSML｜invoke name="f">'
            '<｜DSML｜parameter name="x" string="false">true'
            "</｜DSML｜parameter>"
            "</｜DSML｜invoke>"
            "</｜DSML｜tool_calls>")
    content, calls = _one("deepseek_v4", text)
    assert content == ""
    assert calls[0].name == "f"
    assert json.loads(calls[0].arguments) == {"x": True}


def test_functiongemma():
    text = ("<start_function_call>call:get_weather{location:<escape>"
            "London<escape>}<end_function_call>"
            "<start_function_call>call:get_time{timezone:<escape>UTC"
            "<escape>}<end_function_call>")
    content, calls = _one("functiongemma", text)
    assert [c.name for c in calls] == ["get_weather", "get_time"]
    assert json.loads(calls[0].arguments) == {"location": "London"}
    assert json.loads(calls[1].arguments) == {"timezone": "UTC"}


def test_gemma4_typed_values():
    text = ('<|tool_call>call:complex_function{'
            'location:<|"|>Tokyo, Japan<|"|>,count:42,ratio:0.5,'
            'flag:true,missing:null,'
            'nested:{inner:<|"|>v<|"|>},'
            'items:[<|"|>a<|"|>,<|"|>b<|"|>]}<tool_call|>')
    content, calls = _one("gemma4", text)
    assert calls[0].name == "complex_function"
    assert json.loads(calls[0].arguments) == {
        "location": "Tokyo, Japan", "count": 42, "ratio": 0.5,
        "flag": True, "missing": None, "nested": {"inner": "v"},
        "items": ["a", "b"]}


def test_glm47_inline_name_and_bare_call():
    text = ("<tool_call>get_weather<arg_key>city</arg_key>"
            "<arg_value>Beijing</arg_value></tool_call>")
    content, calls = _one("glm47", text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Beijing"}
    _, calls2 = _one("glm47", "<tool_call>ping</tool_call>")
    assert calls2[0].name == "ping"
    assert json.loads(calls2[0].arguments) == {}


def test_granite_20b_fc():
    text = ('I will call it. <function_call> {"name": "get_weather", '
            '"arguments": {"city": "Boston"}} <function_call> '
            '{"name": "get_time", "arguments": {"tz": "EST"}}')
    content, calls = _one("granite-20b-fc", text)
    assert content == "I will call it."
    assert [c.name for c in calls] == ["get_weather", "get_time"]
    assert json.loads(calls[0].arguments) == {"city": "Boston"}
    assert json.loads(calls[1].arguments) == {"tz": "EST"}


def test_hy_v3():
    text = ("<tool_calls>\n<tool_call>get_weather<tool_sep>\n"
            "<arg_key>city</arg_key>\n<arg_value>Beijing</arg_value>\n"
            "</tool_call>\n"
            "<tool_call>get_current_date<tool_sep></tool_call>\n"
            "</tool_calls>")
    content, calls = _one("hy_v3", text)
    assert content == ""
    assert [c.name for c in calls] == ["get_weather", "get_current_date"]
    assert json.loads(calls[0].arguments) == {"city": "Beijing"}
    assert json.loads(calls[1].arguments) == {}


def test_step3p5_function_grammar():
    text = ("<tool_call><function=get_weather>"
            "<parameter=city>Paris</parameter>"
            "<parameter=days>2</parameter>"
            "</function></tool_call>")
    content, calls = _one("step3p5", text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris", "days": 2}


def test_no_tool_calls_passthrough():
    for name in ("deepseek_v32", "deepseek_v4", "functiongemma", "gemma4",
                 "glm47", "granite-20b-fc", "hy_v3", "step3p5", "mimo",
                 "llama4_json"):
        content, calls = _one(name, "just plain text")
        assert calls == []
        assert content == "just plain text"


def test_granite_20b_fc_parser():
    from lvllm_tpu.tool_parsers import get_tool_parser
    p = get_tool_parser("granite_20b_fc")
    text = ('I will call. <function_call> {"name": "get_weather", '
            '"arguments": {"city": "Paris"}} <function_call> '
            '{"name": "sum", "arguments": {"a": 1, "b": 2}}')
    content, calls = p.extract(text)
    assert content.strip() == "I will call."
    assert [c.name for c in calls] == ["get_weather", "sum"]
    import json as _json
    assert _json.loads(calls[0].arguments) == {"city": "Paris"}
    # No tag -> plain content.
    c2, t2 = p.extract("no tools here")
    assert c2 == "no tools here" and t2 == []
