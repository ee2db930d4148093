"""Tool-call and reasoning output parsers.

Counterpart of the reference's ``vllm/tool_parsers/`` (39 parsers — hermes,
qwen3_coder, kimi_k2, glm47…) and ``vllm/reasoning/`` (22 parsers), scoped
to the formats of the target model families:

- HermesToolParser — ``<tool_call>{json}</tool_call>`` blocks (Qwen/Hermes)
- Llama3JsonToolParser — raw/`<|python_tag|>` JSON calls (llama3_json)
- MistralToolParser — ``[TOOL_CALLS] [...]`` JSON array
- DeepseekV3ToolParser — ``<｜tool▁call▁begin｜>`` fenced-json blocks
- Glm4ToolParser — ``<tool_call>name <arg_key>/<arg_value>`` XML-ish
- Qwen3CoderToolParser — ``<function=...><parameter=...>`` blocks
- ReasoningParser  — ``<think>…</think>`` reasoning extraction (Qwen3/GLM/
  DeepSeek-R1 style)
"""

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON string (OpenAI wire format)
    id: str = field(default_factory=lambda: f"call_{uuid.uuid4().hex[:24]}")

    def to_openai(self) -> dict:
        return {"id": self.id, "type": "function",
                "function": {"name": self.name, "arguments": self.arguments}}


class HermesToolParser:
    """Parses ``<tool_call>{"name": ..., "arguments": ...}</tool_call>``."""

    TOOL_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>",
                         re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        """Returns (content_without_tool_calls, tool_calls)."""
        calls: List[ToolCall] = []
        for m in self.TOOL_RE.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            args = obj.get("arguments", obj.get("parameters", {}))
            if not isinstance(args, str):
                args = json.dumps(args)
            calls.append(ToolCall(name=obj.get("name", ""), arguments=args))
        content = self.TOOL_RE.sub("", text).strip()
        return content, calls


class ReasoningParser:
    """Splits ``<think>…</think>`` into (reasoning_content, content).

    Handles the served-model convention where the opening tag may be part of
    the prompt template (text begins mid-think): a lone closing tag splits
    the text.
    """

    def __init__(self, open_tag: str = "<think>",
                 close_tag: str = "</think>"):
        self.open_tag = open_tag
        self.close_tag = close_tag

    def extract(self, text: str) -> Tuple[Optional[str], str]:
        if self.close_tag not in text:
            if text.lstrip().startswith(self.open_tag):
                # Unfinished reasoning (e.g. length-capped).
                return text.split(self.open_tag, 1)[1].strip(), ""
            return None, text
        head, tail = text.split(self.close_tag, 1)
        if self.open_tag in head:
            head = head.split(self.open_tag, 1)[1]
        reasoning = head.strip()
        return (reasoning or None), tail.strip()


class Llama3JsonToolParser:
    """Llama-3.1 JSON tool calls (reference: tool_parsers/llama_tool_parser
    ``llama3_json``): the model emits a bare JSON object
    ``{"name": ..., "parameters": {...}}``, optionally prefixed with
    ``<|python_tag|>``; multiple calls are ';'-separated."""

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        body = text
        if "<|python_tag|>" in body:
            content, _, body = body.partition("<|python_tag|>")
        elif body.lstrip().startswith("{"):
            content = ""
        else:
            return text, []
        calls: List[ToolCall] = []
        for part in body.split(";"):
            part = part.strip()
            if not part:
                continue
            try:
                obj = json.loads(part)
            except json.JSONDecodeError:
                continue
            args = obj.get("parameters", obj.get("arguments", {}))
            if not isinstance(args, str):
                args = json.dumps(args)
            if obj.get("name"):
                calls.append(ToolCall(name=obj["name"], arguments=args))
        return (content.strip() if calls else text), calls


class MistralToolParser:
    """Mistral ``[TOOL_CALLS] [{"name": ..., "arguments": {...}}, ...]``
    (reference: tool_parsers/mistral_tool_parser)."""

    MARKER = "[TOOL_CALLS]"

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        if self.MARKER not in text:
            return text, []
        content, _, body = text.partition(self.MARKER)
        try:
            arr = json.loads(body.strip())
        except json.JSONDecodeError:
            return text, []
        calls = []
        for obj in arr if isinstance(arr, list) else [arr]:
            args = obj.get("arguments", {})
            if not isinstance(args, str):
                args = json.dumps(args)
            if obj.get("name"):
                calls.append(ToolCall(name=obj["name"], arguments=args))
        return content.strip(), calls


class DeepseekV3ToolParser:
    """DeepSeek V3/R1 blocks (reference: tool_parsers/deepseekv3_tool_
    parser): ``<｜tool▁call▁begin｜>function<｜tool▁sep｜>NAME\n```json\n
    {...}\n```<｜tool▁call▁end｜>`` inside a tool▁calls envelope."""

    BLOCK_RE = re.compile(
        r"<｜tool▁call▁begin｜>.*?<｜tool▁sep｜>(?P<name>[^\n<]+)\s*"
        r"```json\s*(?P<json>\{.*?\})\s*```\s*<｜tool▁call▁end｜>",
        re.DOTALL)
    ENVELOPE_RE = re.compile(
        r"<｜tool▁calls▁begin｜>.*?(<｜tool▁calls▁end｜>|$)", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for m in self.BLOCK_RE.finditer(text):
            try:
                args = json.dumps(json.loads(m.group("json")))
            except json.JSONDecodeError:
                continue
            calls.append(ToolCall(name=m.group("name").strip(),
                                  arguments=args))
        content = self.ENVELOPE_RE.sub("", text).strip()
        return content, calls


class Glm4ToolParser:
    """GLM-4.5 XML-ish blocks (reference: tool_parsers/glm4_moe_tool_
    parser): ``<tool_call>NAME\n<arg_key>K</arg_key><arg_value>V
    </arg_value>...</tool_call>``; values parse as JSON when they look
    like it, else stay strings."""

    BLOCK_RE = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    ARG_RE = re.compile(r"<arg_key>(.*?)</arg_key>\s*"
                        r"<arg_value>(.*?)</arg_value>", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for m in self.BLOCK_RE.finditer(text):
            block = m.group(1).strip()
            name = block.split("\n", 1)[0].split("<arg_key>", 1)[0].strip()
            if not name:
                continue
            args = {}
            for k, v in self.ARG_RE.findall(block):
                v = v.strip()
                try:
                    args[k.strip()] = json.loads(v)
                except json.JSONDecodeError:
                    args[k.strip()] = v
            calls.append(ToolCall(name=name, arguments=json.dumps(args)))
        content = self.BLOCK_RE.sub("", text).strip()
        return content, calls


class Qwen3CoderToolParser:
    """Qwen3-Coder blocks (reference: tool_parsers/qwen3coder_tool_parser):
    ``<tool_call><function=NAME><parameter=KEY>VALUE</parameter>...
    </function></tool_call>``."""

    BLOCK_RE = re.compile(r"<tool_call>\s*<function=([^>]+)>(.*?)"
                          r"</function>\s*</tool_call>", re.DOTALL)
    PARAM_RE = re.compile(r"<parameter=([^>]+)>(.*?)</parameter>",
                          re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for m in self.BLOCK_RE.finditer(text):
            args = {}
            for k, v in self.PARAM_RE.findall(m.group(2)):
                v = v.strip()
                try:
                    args[k] = json.loads(v)
                except json.JSONDecodeError:
                    args[k] = v
            calls.append(ToolCall(name=m.group(1).strip(),
                                  arguments=json.dumps(args)))
        content = self.BLOCK_RE.sub("", text).strip()
        return content, calls


class KimiK2ToolParser:
    """Kimi K2 token-delimited tool sections (reference:
    kimi_k2_tool_parser.py:41-52): ``<|tool_calls_section_begin|>`` wraps
    ``<|tool_call_begin|> functions.NAME:IDX
    <|tool_call_argument_begin|> {json} <|tool_call_end|>`` blocks."""

    _call = re.compile(
        r"<\|tool_call_begin\|>\s*(?P<id>[\w\.\-]+:\d+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(?P<args>.*?)\s*"
        r"<\|tool_call_end\|>", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        if "<|tool_calls_section_begin|>" not in text:
            return text, []
        content, section = text.split("<|tool_calls_section_begin|>", 1)
        calls = []
        for m in self._call.finditer(section):
            name = m.group("id").split(":", 1)[0]
            name = name.removeprefix("functions.")
            calls.append(ToolCall(name=name, arguments=m.group("args")))
        return content.strip(), calls


class PythonicToolParser:
    """Pythonic call-list output (reference: pythonic_tool_parser.py /
    llama4_pythonic): the model emits ``[foo(a=1), bar(x="s")]``."""

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        import ast
        body = text.strip()
        if body.startswith("<|python_start|>"):
            body = body.split("<|python_start|>", 1)[1]
            body = body.split("<|python_end|>", 1)[0].strip()
        if not (body.startswith("[") and body.endswith("]")):
            return text, []
        try:
            tree = ast.parse(body, mode="eval")
        except SyntaxError:
            return text, []
        if not isinstance(tree.body, ast.List):
            return text, []
        calls = []
        for node in tree.body.elts:
            if not (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)):
                return text, []
            try:
                args = {kw.arg: ast.literal_eval(kw.value)
                        for kw in node.keywords}
            except ValueError:
                return text, []
            calls.append(ToolCall(name=node.func.id,
                                  arguments=json.dumps(args)))
        return "", calls


class InternLM2ToolParser:
    """InternLM2 plugin actions (reference: internlm2_tool_parser.py):
    ``<|action_start|><|plugin|>{json}<|action_end|>``."""

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        if "<|action_start|>" not in text:
            return text, []
        content, rest = text.split("<|action_start|>", 1)
        body = rest.removeprefix("<|plugin|>")
        body = body.split("<|action_end|>", 1)[0].strip()
        try:
            obj = json.loads(body)
        except json.JSONDecodeError:
            return text, []
        args = obj.get("parameters", obj.get("arguments", {}))
        return content.strip(), [ToolCall(
            name=obj.get("name", ""), arguments=json.dumps(args))]


class Granite20bFcToolParser:
    """granite-20b-functioncalling (reference:
    granite_20b_fc_tool_parser.py:53): repeated ``<function_call>``
    tags each followed by a {"name", "arguments"} JSON object
    (raw_decode semantics — trailing text after each object belongs to
    the next tag)."""

    BOT = "<function_call>"

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        if self.BOT not in text:
            return text, []
        content = text[:text.find(self.BOT)]
        dec = json.JSONDecoder()
        calls: List[ToolCall] = []
        matches = list(re.finditer(re.escape(self.BOT) + r"\s*", text))
        try:
            for i, m in enumerate(matches):
                end = (matches[i + 1].start()
                       if i + 1 < len(matches) else len(text))
                obj = dec.raw_decode(text[m.end():end])[0]
                calls.append(ToolCall(
                    name=obj.get("name", ""),
                    arguments=json.dumps(obj.get("arguments", {}),
                                         ensure_ascii=False)))
        except (json.JSONDecodeError, ValueError):
            return text, []
        return content, calls


class GraniteToolParser:
    """Granite 3.x JSON-array calls (reference: granite_tool_parser.py:51):
    optional ``<|tool_call|>``/``<tool_call>`` prefix + a JSON array of
    {"name", "arguments"}."""

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        stripped = text.strip().removeprefix("<|tool_call|>") \
            .removeprefix("<tool_call>").lstrip()
        if not stripped.startswith("["):
            return text, []
        try:
            arr = json.loads(stripped)
        except json.JSONDecodeError:
            return text, []
        if not isinstance(arr, list):
            return text, []
        calls = [ToolCall(name=o.get("name", ""),
                          arguments=json.dumps(o.get("arguments", {})))
                 for o in arr if isinstance(o, dict)]
        return "", calls


def _json_or_str(v: str):
    v = v.strip()
    try:
        return json.loads(v)
    except json.JSONDecodeError:
        return v


class SeedOssToolParser:
    """Seed-OSS XML blocks (reference: seed_oss_tool_parser.py:36-55):
    ``<seed:tool_call><function=NAME><parameter=K>V</parameter>...
    </function></seed:tool_call>``."""

    BLOCK_RE = re.compile(r"<seed:tool_call>(.*?)</seed:tool_call>",
                          re.DOTALL)
    FUNC_RE = re.compile(r"<function=([^>\n]+)>(.*?)</function>", re.DOTALL)
    PARAM_RE = re.compile(r"<parameter=([^>\n]+)>(.*?)</parameter>",
                          re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for block in self.BLOCK_RE.finditer(text):
            for name, body in self.FUNC_RE.findall(block.group(1)):
                args = {k.strip(): _json_or_str(v)
                        for k, v in self.PARAM_RE.findall(body)}
                calls.append(ToolCall(name=name.strip(),
                                      arguments=json.dumps(args)))
        return self.BLOCK_RE.sub("", text).strip(), calls


class Step3ToolParser:
    """Step-3 steptml invocations (reference: step3_tool_parser.py:42-67):
    ``<｜tool_calls_begin｜><｜tool_call_begin｜>function<｜tool_sep｜>
    <steptml:invoke name="NAME"><steptml:parameter name="K">V
    </steptml:parameter></steptml:invoke><｜tool_call_end｜>…
    <｜tool_calls_end｜>``."""

    ENVELOPE_RE = re.compile(
        r"<｜tool_calls_begin｜>.*?(?:<｜tool_calls_end｜>|$)", re.DOTALL)
    CALL_RE = re.compile(
        r"<｜tool_call_begin｜>(.*?)<｜tool_call_end｜>", re.DOTALL)
    INVOKE_RE = re.compile(r'<steptml:invoke name="([^"]+)">')
    PARAM_RE = re.compile(
        r'<steptml:parameter name="([^"]+)">([^<]*)</steptml:parameter>')

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for m in self.CALL_RE.finditer(text):
            body = m.group(1)
            if "<｜tool_sep｜>" in body:
                kind, body = body.split("<｜tool_sep｜>", 1)
                if kind.strip() != "function":
                    continue
            nm = self.INVOKE_RE.search(body)
            if not nm:
                continue
            args = {k: _json_or_str(v)
                    for k, v in self.PARAM_RE.findall(body)}
            calls.append(ToolCall(name=nm.group(1),
                                  arguments=json.dumps(args)))
        return self.ENVELOPE_RE.sub("", text).strip(), calls


class MiniMaxM2ToolParser:
    """MiniMax-M2 XML blocks (reference: minimax_m2_tool_parser.py:39-55):
    ``<minimax:tool_call><invoke name="NAME"><parameter name="K">V
    </parameter></invoke></minimax:tool_call>``."""

    BLOCK_RE = re.compile(r"<minimax:tool_call>(.*?)</minimax:tool_call>",
                          re.DOTALL)
    INVOKE_RE = re.compile(r'<invoke name="([^"]+)">(.*?)</invoke>',
                           re.DOTALL)
    PARAM_RE = re.compile(r'<parameter name="([^"]+)">(.*?)</parameter>',
                          re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for block in self.BLOCK_RE.finditer(text):
            for name, body in self.INVOKE_RE.findall(block.group(1)):
                args = {k: _json_or_str(v)
                        for k, v in self.PARAM_RE.findall(body)}
                calls.append(ToolCall(name=name,
                                      arguments=json.dumps(args)))
        return self.BLOCK_RE.sub("", text).strip(), calls


class MiniMaxToolParser:
    """MiniMax-Text JSON-lines blocks (reference:
    minimax_tool_parser.py:45-48,185): ``<tool_calls>`` wraps one JSON
    object per line."""

    BLOCK_RE = re.compile(r"<tool_calls>(.*?)(?:</tool_calls>|$)",
                          re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for block in self.BLOCK_RE.finditer(text):
            for line in block.group(1).splitlines():
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                args = obj.get("arguments", obj.get("parameters", {}))
                if not isinstance(args, str):
                    args = json.dumps(args)
                if obj.get("name"):
                    calls.append(ToolCall(name=obj["name"], arguments=args))
        return self.BLOCK_RE.sub("", text).strip(), calls


class Ernie45ToolParser:
    """ERNIE 4.5 ``<tool_call>{json}</tool_call>`` blocks, with optional
    ``<response>`` wrapper (reference: ernie45_tool_parser.py:41-50)."""

    TOOL_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>",
                         re.DOTALL)
    RESP_RE = re.compile(r"</?response>")

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for m in self.TOOL_RE.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            args = obj.get("arguments", {})
            if not isinstance(args, str):
                args = json.dumps(args)
            if obj.get("name"):
                calls.append(ToolCall(name=obj["name"], arguments=args))
        content = self.TOOL_RE.sub("", text)
        return self.RESP_RE.sub("", content).strip(), calls


class JambaToolParser:
    """Jamba ``<tool_calls>[{...}, ...]</tool_calls>`` JSON array
    (reference: jamba_tool_parser.py:49-50)."""

    BLOCK_RE = re.compile(r"<tool_calls>\s*(\[.*?\])\s*</tool_calls>",
                          re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        m = self.BLOCK_RE.search(text)
        if not m:
            return text, []
        try:
            arr = json.loads(m.group(1))
        except json.JSONDecodeError:
            return text, []
        calls = [ToolCall(name=o.get("name", ""),
                          arguments=json.dumps(o.get("arguments", {})))
                 for o in arr if isinstance(o, dict) and o.get("name")]
        return self.BLOCK_RE.sub("", text).strip(), calls


class Phi4MiniToolParser:
    """Phi-4-mini ``functools[{...}, ...]`` calls (reference:
    phi4mini_tool_parser.py:54-78)."""

    BLOCK_RE = re.compile(r"functools\[(.*?)\]", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        m = self.BLOCK_RE.search(text)
        if not m:
            return text, []
        try:
            arr = json.loads("[" + m.group(1) + "]")
        except json.JSONDecodeError:
            return text, []
        calls = []
        for o in arr:
            if not (isinstance(o, dict) and o.get("name")):
                continue
            args = o.get("arguments", o.get("parameters", {}))
            if not isinstance(args, str):
                args = json.dumps(args)
            calls.append(ToolCall(name=o["name"], arguments=args))
        return self.BLOCK_RE.sub("", text).strip(), calls


class LongcatToolParser:
    """LongCat ``<longcat_tool_call>{json}</longcat_tool_call>``
    (reference: longcat_tool_parser.py:15-19)."""

    TOOL_RE = re.compile(
        r"<longcat_tool_call>\s*(\{.*?\})\s*</longcat_tool_call>",
        re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for m in self.TOOL_RE.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            args = obj.get("arguments", {})
            if not isinstance(args, str):
                args = json.dumps(args)
            if obj.get("name"):
                calls.append(ToolCall(name=obj["name"], arguments=args))
        return self.TOOL_RE.sub("", text).strip(), calls


class Olmo3ToolParser:
    """OLMo-3 pythonic calls, one per line inside ``<function_calls>``
    (reference: olmo3_tool_parser.py:78-90)."""

    BLOCK_RE = re.compile(r"<function_calls>(.*?)</function_calls>",
                          re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        import ast
        m = self.BLOCK_RE.search(text)
        body = m.group(1) if m else text
        lines = [ln.strip() for ln in body.splitlines() if ln.strip()]
        if not lines:
            return text, []
        calls = []
        for ln in lines:
            try:
                node = ast.parse(ln, mode="eval").body
            except SyntaxError:
                return text, []
            if not (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)):
                return text, []
            try:
                args = {kw.arg: ast.literal_eval(kw.value)
                        for kw in node.keywords}
            except ValueError:
                return text, []
            calls.append(ToolCall(name=node.func.id,
                                  arguments=json.dumps(args)))
        content = self.BLOCK_RE.sub("", text).strip() if m else ""
        return content, calls


class HunyuanA13BToolParser:
    """Hunyuan-A13B ``<tool_calls>[{json}]</tool_calls>`` with optional
    ``<answer>`` section (reference: hunyuan_a13b_tool_parser.py:52-66)."""

    BLOCK_RE = re.compile(r"<tool_calls>([\s\S]*?)</tool_calls>", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        m = self.BLOCK_RE.search(text)
        if not m:
            return text, []
        try:
            arr = json.loads(m.group(1))
        except json.JSONDecodeError:
            return text, []
        if isinstance(arr, dict):
            arr = [arr]
        calls = []
        for o in arr:
            if not (isinstance(o, dict) and o.get("name")):
                continue
            args = o.get("arguments", {})
            if not isinstance(args, str):
                args = json.dumps(args)
            calls.append(ToolCall(name=o["name"], arguments=args))
        content = self.BLOCK_RE.sub("", text)
        content = re.sub(r"</?answer>", "", content)
        return content.strip(), calls


class XLAMToolParser:
    """xLAM bare / fenced JSON-array calls (reference:
    xlam_tool_parser.py:96-140): ``[{"name": ..., "arguments": {...}}]``
    possibly inside a ```json fence or after [TOOL_CALLS]."""

    FENCE_RE = re.compile(r"```(?:json)?\s*(\[.*?\])\s*```", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        body, content = None, text
        m = self.FENCE_RE.search(text)
        if m:
            body = m.group(1)
            content = self.FENCE_RE.sub("", text).strip()
        elif "[TOOL_CALLS]" in text:
            content, _, body = text.partition("[TOOL_CALLS]")
            content = content.strip()
        elif text.strip().startswith("["):
            body, content = text.strip(), ""
        if body is None:
            return text, []
        try:
            arr = json.loads(body)
        except json.JSONDecodeError:
            return text, []
        if not isinstance(arr, list):
            return text, []
        calls = []
        for o in arr:
            if not (isinstance(o, dict) and o.get("name")):
                return text, []
            args = o.get("arguments", o.get("parameters", {}))
            if not isinstance(args, str):
                args = json.dumps(args)
            calls.append(ToolCall(name=o["name"], arguments=args))
        return content, calls


class DeepseekV31ToolParser:
    """DeepSeek V3.1 compact blocks (reference:
    deepseekv31_tool_parser.py:40-45): ``<｜tool▁call▁begin｜>NAME
    <｜tool▁sep｜>{args}<｜tool▁call▁end｜>`` — no json fences, no
    per-call "function" type tag."""

    CALL_RE = re.compile(
        r"<｜tool▁call▁begin｜>(?P<name>[^\n<]+?)<｜tool▁sep｜>"
        r"(?P<args>.*?)<｜tool▁call▁end｜>", re.DOTALL)
    ENVELOPE_RE = re.compile(
        r"<｜tool▁calls▁begin｜>.*?(?:<｜tool▁calls▁end｜>|$)", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for m in self.CALL_RE.finditer(text):
            try:
                args = json.dumps(json.loads(m.group("args")))
            except json.JSONDecodeError:
                continue
            calls.append(ToolCall(name=m.group("name").strip(),
                                  arguments=args))
        content = self.ENVELOPE_RE.sub("", text)
        content = self.CALL_RE.sub("", content)
        return content.strip(), calls


class Granite4ToolParser:
    """Granite-4 per-block JSON objects (reference:
    granite4_tool_parser.py:58-80): ``<tool_call>{json}</tool_call>``
    segments, object per block (vs Granite-3's one JSON array)."""

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        return HermesToolParser().extract(text)


class GigaChat3ToolParser:
    """GigaChat-3 function calls (reference: gigachat3_tool_parser.py:29-34):
    ``content<|message_sep|>function call<|role_sep|>\\n{json}`` or
    ``content<|function_call|>{json}``."""

    CALL_RE = re.compile(
        r"(?:function call<\|role_sep\|>\n?|<\|function_call\|>)(.*)",
        re.DOTALL)
    CONTENT_RE = re.compile(r"^(.*?)(?:<\|message_sep\|>|<\|function_call\|>)",
                            re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        m = self.CALL_RE.search(text)
        if not m:
            return text, []
        try:
            obj = json.loads(m.group(1).strip())
        except json.JSONDecodeError:
            return text, []
        if not (isinstance(obj, dict) and obj.get("name")):
            return text, []
        args = obj.get("arguments", {})
        if not isinstance(args, str):
            args = json.dumps(args)
        cm = self.CONTENT_RE.match(text)
        content = cm.group(1).strip() if cm else ""
        return content, [ToolCall(name=obj["name"], arguments=args)]


class Qwen3XmlToolParser:
    """Qwen3 XML-attribute blocks (reference: qwen3xml_tool_parser.py:
    253-260): ``<tool_call><function name="NAME"><parameter name="K">V
    </parameter></function></tool_call>`` — also accepts the
    qwen3_coder ``<function=NAME>`` spelling."""

    BLOCK_RE = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    FUNC_RE = re.compile(
        r'<function(?: name="([^"]+)"|=([^>\n]+))>(.*?)</function>',
        re.DOTALL)
    PARAM_RE = re.compile(
        r'<parameter(?: name="([^"]+)"|=([^>\n]+))>(.*?)</parameter>',
        re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for block in self.BLOCK_RE.finditer(text):
            for n1, n2, body in self.FUNC_RE.findall(block.group(1)):
                args = {(k1 or k2).strip(): _json_or_str(v)
                        for k1, k2, v in self.PARAM_RE.findall(body)}
                calls.append(ToolCall(name=(n1 or n2).strip(),
                                      arguments=json.dumps(args)))
        return self.BLOCK_RE.sub("", text).strip(), calls


class OpenAIToolParser:
    """gpt-oss harmony channels (reference: openai_tool_parser.py:49-90):
    ``<|channel|>commentary to=functions.NAME <|constrain|>json
    <|message|>{args}<|call|>`` tool calls; ``<|channel|>final
    <|message|>text`` carries user-visible content."""

    CALL_RE = re.compile(
        r"<\|channel\|>commentary to=functions\.([\w\.\-]+)"
        r"[^<]*(?:<\|constrain\|>[^<]*)?<\|message\|>(.*?)"
        r"(?:<\|call\|>|$)", re.DOTALL)
    FINAL_RE = re.compile(
        r"<\|channel\|>final<\|message\|>(.*?)(?:<\|end\|>|<\|return\|>|$)",
        re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        if "<|channel|>" not in text:
            return text, []
        calls = []
        for name, args in self.CALL_RE.findall(text):
            args = args.strip()
            try:
                json.loads(args)
            except json.JSONDecodeError:
                continue
            calls.append(ToolCall(name=name, arguments=args))
        fm = self.FINAL_RE.search(text)
        content = fm.group(1).strip() if fm else ""
        return content, calls


class DeepseekV32ToolParser:
    """DeepSeek V3.2 DSML blocks (reference: tool_parsers/
    deepseekv32_tool_parser): ``<｜DSML｜function_calls>`` wrapping
    ``<｜DSML｜invoke name="F">`` with ``<｜DSML｜parameter name="K"
    string="true|false">V</｜DSML｜parameter>`` entries; string="false"
    values parse as JSON scalars."""

    START = "<｜DSML｜function_calls>"
    END = "</｜DSML｜function_calls>"
    INVOKE_RE = re.compile(
        r'<｜DSML｜invoke\s+name="([^"]+)"\s*>(.*?)</｜DSML｜invoke>',
        re.DOTALL)
    PARAM_RE = re.compile(
        r'<｜DSML｜parameter\s+name="([^"]+)"\s+string="(true|false)"\s*>'
        r'(.*?)</｜DSML｜parameter>', re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        if self.START not in text:
            return text, []
        block_re = re.compile(re.escape(self.START) + r"(.*?)" +
                              re.escape(self.END), re.DOTALL)
        calls = []
        for bm in block_re.finditer(text):
            for name, body in self.INVOKE_RE.findall(bm.group(1)):
                args = {}
                for k, is_str, v in self.PARAM_RE.findall(body):
                    if v.lower() == "null":
                        args[k] = None
                    elif is_str == "true":
                        args[k] = v
                    else:
                        args[k] = _json_or_str(v)
                calls.append(ToolCall(name=name, arguments=json.dumps(args)))
        content = block_re.sub("", text).strip()
        return content, calls


class DeepseekV4ToolParser(DeepseekV32ToolParser):
    """DeepSeek V4 (reference: tool_parsers/deepseekv4_tool_parser):
    identical DSML grammar under ``<｜DSML｜tool_calls>``."""

    START = "<｜DSML｜tool_calls>"
    END = "</｜DSML｜tool_calls>"


class FunctionGemmaToolParser:
    """FunctionGemma (reference: tool_parsers/functiongemma_tool_parser):
    ``<start_function_call>call:NAME{k:<escape>v<escape>,...}
    <end_function_call>``."""

    CALL_RE = re.compile(
        r"<start_function_call>call:(\w+)\{(.*?)\}<end_function_call>",
        re.DOTALL)
    ARG_RE = re.compile(r"(\w+):<escape>(.*?)<escape>", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for name, body in self.CALL_RE.findall(text):
            args = {k: _json_or_str(v) for k, v in self.ARG_RE.findall(body)}
            calls.append(ToolCall(name=name, arguments=json.dumps(args)))
        content = self.CALL_RE.sub("", text).strip()
        return content, calls


class Gemma4ToolParser:
    """Gemma 4 (reference: tool_parsers/gemma4_tool_parser):
    ``<|tool_call>call:NAME{key:<|"|>str<|"|>,num:42,nested:{...},
    list:[...]}<tool_call|>`` — strings delimited by ``<|"|>``, bare
    scalars are numbers/bools/null."""

    CALL_RE = re.compile(r"<\|tool_call>call:(\w+)\{(.*?)\}<tool_call\|>",
                         re.DOTALL)
    SD = '<|"|>'

    def _scalar(self, s: str):
        s = s.strip()
        if s == "true":
            return True
        if s == "false":
            return False
        if s.lower() in ("null", "none", "nil"):
            return None
        try:
            return float(s) if "." in s else int(s)
        except ValueError:
            return s

    def _value(self, s: str, i: int):
        """Parse one value at s[i:]; returns (value, next_index)."""
        sd = self.SD
        if s.startswith(sd, i):
            j = s.find(sd, i + len(sd))
            if j < 0:
                return s[i + len(sd):], len(s)
            return s[i + len(sd):j], j + len(sd)
        if s.startswith("{", i):
            obj, j = self._object(s, i + 1)
            return obj, j
        if s.startswith("[", i):
            items = []
            i += 1
            while i < len(s) and s[i] != "]":
                v, i = self._value(s, i)
                items.append(v)
                if i < len(s) and s[i] == ",":
                    i += 1
            return items, i + 1
        j = i
        depth = 0
        while j < len(s) and (depth > 0 or s[j] not in ",}]"):
            depth += s[j] in "{["
            depth -= s[j] in "}]"
            j += 1
        return self._scalar(s[i:j]), j

    def _object(self, s: str, i: int):
        out = {}
        while i < len(s) and s[i] != "}":
            j = s.find(":", i)
            if j < 0:
                break
            key = s[i:j].strip().strip(",")
            v, i = self._value(s, j + 1)
            out[key] = v
            if i < len(s) and s[i] == ",":
                i += 1
        return out, i + 1

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for name, body in self.CALL_RE.findall(text):
            args, _ = self._object(body + "}", 0)
            calls.append(ToolCall(name=name, arguments=json.dumps(args)))
        content = self.CALL_RE.sub("", text).strip()
        return content, calls


class Granite20bFCToolParser:
    """granite-20b-functioncalling (reference: tool_parsers/
    granite_20b_fc_tool_parser): ``<function_call> {"name":..,
    "arguments":{..}}`` repeated, JSON raw-decoded between markers."""

    BOT = "<function_call>"

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        if self.BOT not in text:
            return text, []
        dec = json.JSONDecoder()
        calls = []
        marks = [m.end() for m in re.finditer(re.escape(self.BOT), text)]
        try:
            for i, start in enumerate(marks):
                chunk = text[start:marks[i + 1] - len(self.BOT)
                             if i + 1 < len(marks) else None]
                obj, _ = dec.raw_decode(chunk.strip())
                calls.append(ToolCall(
                    name=obj["name"],
                    arguments=json.dumps(obj.get("arguments", {}))))
        except (json.JSONDecodeError, KeyError):
            return text, []
        content = text[:text.find(self.BOT)].strip()
        return content, calls


class HunyuanV3ToolParser:
    """Hunyuan V3 (reference: tool_parsers/hy_v3_tool_parser):
    ``<tool_calls><tool_call>NAME<tool_sep><arg_key>K</arg_key>
    <arg_value>V</arg_value>...</tool_call>...</tool_calls>``."""

    CALL_RE = re.compile(r"<tool_call>(.*?)<tool_sep>(.*?)</tool_call>",
                         re.DOTALL)
    ARG_RE = re.compile(r"<arg_key>(.*?)</arg_key>\s*"
                        r"<arg_value>(.*?)</arg_value>", re.DOTALL)
    WRAP_RE = re.compile(r"<tool_calls>.*?(</tool_calls>|$)", re.DOTALL)

    def extract(self, text: str) -> Tuple[str, List[ToolCall]]:
        calls = []
        for name, body in self.CALL_RE.findall(text):
            args = {k.strip(): _json_or_str(v.strip())
                    for k, v in self.ARG_RE.findall(body)}
            calls.append(ToolCall(name=name.strip(),
                                  arguments=json.dumps(args)))
        content = self.WRAP_RE.sub("", text).strip()
        return content, calls


_TOOL_PARSERS = {
    "hermes": HermesToolParser,
    "llama3_json": Llama3JsonToolParser,
    "mistral": MistralToolParser,
    "deepseek_v3": DeepseekV3ToolParser,
    "glm4": Glm4ToolParser,
    "glm45": Glm4ToolParser,
    "qwen3_coder": Qwen3CoderToolParser,
    "kimi_k2": KimiK2ToolParser,
    "pythonic": PythonicToolParser,
    "llama4_pythonic": PythonicToolParser,
    "internlm": InternLM2ToolParser,
    "granite": GraniteToolParser,
    "granite_20b_fc": Granite20bFcToolParser,
    "seed_oss": SeedOssToolParser,
    "step3": Step3ToolParser,
    "minimax_m2": MiniMaxM2ToolParser,
    "minimax": MiniMaxToolParser,
    "ernie45": Ernie45ToolParser,
    "jamba": JambaToolParser,
    "phi4_mini_json": Phi4MiniToolParser,
    "longcat": LongcatToolParser,
    "olmo3": Olmo3ToolParser,
    "hunyuan_a13b": HunyuanA13BToolParser,
    "xlam": XLAMToolParser,
    "deepseek_v31": DeepseekV31ToolParser,
    "granite4": Granite4ToolParser,
    "gigachat3": GigaChat3ToolParser,
    "qwen3_xml": Qwen3XmlToolParser,
    "mimo": Qwen3XmlToolParser,
    "openai": OpenAIToolParser,
    "gptoss": OpenAIToolParser,
    "deepseek_v32": DeepseekV32ToolParser,
    "deepseek_v4": DeepseekV4ToolParser,
    "functiongemma": FunctionGemmaToolParser,
    "gemma4": Gemma4ToolParser,
    # GLM-4.7 allows the name inline before <arg_key> (and bare
    # <tool_call>name</tool_call>) — both handled by the GLM-4 parser.
    "glm47": Glm4ToolParser,
    "granite-20b-fc": Granite20bFCToolParser,
    "hy_v3": HunyuanV3ToolParser,
    "llama4_json": Llama3JsonToolParser,
    # Step-3.5 emits the <function=NAME><parameter=K> XML-ish grammar.
    "step3p5": Qwen3CoderToolParser,
}


def get_tool_parser(name: str):
    if name not in _TOOL_PARSERS:
        raise ValueError(f"unknown tool parser {name!r}; "
                         f"available: {sorted(_TOOL_PARSERS)}")
    return _TOOL_PARSERS[name]()
