"""Tool-call and reasoning output parsers.

Counterpart of the reference's ``vllm/tool_parsers/`` (39 parsers — hermes,
qwen3_coder, kimi_k2, glm47…) and ``vllm/reasoning/`` (22 parsers), scoped
to the formats of the target model families:

- HermesToolParser — ``<tool_call>{json}</tool_call>`` blocks (Qwen/Hermes)
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


_TOOL_PARSERS = {"hermes": HermesToolParser}


def get_tool_parser(name: str):
    if name not in _TOOL_PARSERS:
        raise ValueError(f"unknown tool parser {name!r}; "
                         f"available: {sorted(_TOOL_PARSERS)}")
    return _TOOL_PARSERS[name]()
