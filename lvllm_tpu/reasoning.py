"""Reasoning-content parsers.

Counterpart of the reference's ``vllm/reasoning/`` package (22 parsers,
``abs_reasoning_parsers.py`` registry): split a model's raw completion into
(reasoning_content, content). Most models are tag-pair variants of
``<think>…</think>`` differing only in the tag strings and whether the
opening tag is emitted by the model or already part of the prompt template
("assume started" — e.g. DeepSeek-R1's template ends with ``<think>``).

Each parser exposes ``extract(text) -> (reasoning | None, content)``.
"""

import re
from typing import Optional, Tuple

__all__ = ["get_reasoning_parser", "REASONING_PARSERS"]


class TagReasoningParser:
    """Tag-pair reasoning splitter (reference: basic_parsers.py
    BaseThinkingReasoningParser).

    ``assume_started``: treat text with no opening tag as mid-reasoning
    (the chat template already opened the block) — deepseek_r1 semantics.
    """

    def __init__(self, open_tag: str = "<think>",
                 close_tag: str = "</think>",
                 assume_started: bool = False):
        self.open_tag = open_tag
        self.close_tag = close_tag
        self.assume_started = assume_started

    def extract(self, text: str) -> Tuple[Optional[str], str]:
        if self.close_tag not in text:
            if text.lstrip().startswith(self.open_tag):
                # Unfinished reasoning (e.g. length-capped).
                return text.split(self.open_tag, 1)[1].strip(), ""
            if self.assume_started:
                return text.strip() or None, ""
            return None, text
        head, tail = text.split(self.close_tag, 1)
        if self.open_tag in head:
            head = head.split(self.open_tag, 1)[1]
        elif not self.assume_started and self.open_tag not in head:
            # Qwen3-style: a bare close tag without an open tag still
            # terminates reasoning-at-start (reference qwen3 parser keeps
            # everything before </think> as reasoning).
            pass
        reasoning = head.strip()
        return (reasoning or None), tail.strip()


class WrappedAnswerReasoningParser(TagReasoningParser):
    """Tag-pair reasoning plus an answer wrapper stripped from the content
    (reference: ernie45 ``<response>…</response>``, hunyuan_a13b
    ``<answer>…</answer>``)."""

    def __init__(self, answer_open: str, answer_close: str, **kw):
        super().__init__(**kw)
        self.answer_open = answer_open
        self.answer_close = answer_close

    def extract(self, text: str) -> Tuple[Optional[str], str]:
        reasoning, content = super().extract(text)
        if self.answer_open in content:
            content = content.split(self.answer_open, 1)[1]
        if self.answer_close in content:
            content = content.split(self.answer_close, 1)[0]
        return reasoning, content.strip()


class GraniteReasoningParser:
    """IBM Granite prose markers (reference:
    granite_reasoning_parser.py:35-39): "Here is my thought process:" /
    "Here is my response:"."""

    _pat = re.compile(
        r"(?:Here's|Here is) my thought process:(.*?)"
        r"(?:(?:Here's|Here is) my response:(.*)|\Z)", re.DOTALL)

    def extract(self, text: str) -> Tuple[Optional[str], str]:
        m = self._pat.search(text)
        if not m:
            return None, text
        reasoning = (m.group(1) or "").strip()
        content = (m.group(2) or "").strip()
        return (reasoning or None), content


class GptOssReasoningParser:
    """Harmony channel splitter (reference: gptoss_reasoning_parser.py:27):
    reasoning = analysis-channel text, content = final-channel text."""

    _chan = re.compile(
        r"<\|channel\|>(\w+)(?:\s+to=[^<]*)?<\|message\|>(.*?)"
        r"(?:<\|end\|>|<\|return\|>|(?=<\|channel\|>)|\Z)", re.DOTALL)

    def extract(self, text: str) -> Tuple[Optional[str], str]:
        if "<|channel|>" not in text:
            return None, text
        reasoning_parts, content_parts = [], []
        for name, body in self._chan.findall(text):
            if name == "analysis":
                reasoning_parts.append(body.strip())
            elif name == "final":
                content_parts.append(body.strip())
        reasoning = "\n".join(p for p in reasoning_parts if p) or None
        return reasoning, "\n".join(content_parts).strip()


class IdentityReasoningParser:
    """No-op (reference: identity_reasoning_parser.py)."""

    def extract(self, text: str) -> Tuple[Optional[str], str]:
        return None, text


class AppendThinkReasoningParser(TagReasoningParser):
    """Reasoning extracted for reasoning_content while the CONTENT keeps
    the full text including the think block (reference:
    minimax_m2_reasoning_parser.py MiniMaxM2AppendThinkReasoningParser —
    extract_content_ids returns all ids)."""

    def extract(self, text: str) -> Tuple[Optional[str], str]:
        reasoning, _ = super().extract(text)
        return reasoning, text


class Gemma4ReasoningParser(TagReasoningParser):
    """Gemma4 channel-delimited thinking (reference:
    gemma4_reasoning_parser.py): ``<|channel>thought\\n…<channel|>`` wraps
    the reasoning; the ``thought\\n`` role label inside the delimiters is a
    structural artefact and is stripped."""

    def __init__(self):
        super().__init__(open_tag="<|channel>", close_tag="<channel|>",
                         assume_started=False)

    def extract(self, text: str) -> Tuple[Optional[str], str]:
        reasoning, content = super().extract(text)
        if reasoning and reasoning.startswith("thought"):
            reasoning = reasoning[len("thought"):].lstrip("\n").strip() \
                or None
        return reasoning, content


REASONING_PARSERS = {
    # <think> emitted by the model itself.
    "basic": lambda: TagReasoningParser(),
    "qwen3": lambda: TagReasoningParser(),
    "glm45": lambda: TagReasoningParser(),
    "hy_v3": lambda: TagReasoningParser(),
    # template already opened the think block.
    "deepseek_r1": lambda: TagReasoningParser(assume_started=True),
    "deepseek_v3": lambda: TagReasoningParser(assume_started=True),
    "kimi_k2": lambda: TagReasoningParser(assume_started=True),
    "step3": lambda: TagReasoningParser(assume_started=True),
    "minimax_m2": lambda: TagReasoningParser(assume_started=True),
    "mistral": lambda: TagReasoningParser(open_tag="[THINK]",
                                          close_tag="[/THINK]"),
    "ernie45": lambda: WrappedAnswerReasoningParser(
        "<response>", "</response>"),
    "hunyuan_a13b": lambda: WrappedAnswerReasoningParser(
        "<answer>", "</answer>", assume_started=True),
    "granite": GraniteReasoningParser,
    "gptoss": GptOssReasoningParser,
    "openai_gptoss": GptOssReasoningParser,
    "identity": IdentityReasoningParser,
    # Fill to the reference's full 22-name registry
    # (vllm/reasoning/__init__.py:22-113).
    "deepseek_v4": lambda: TagReasoningParser(assume_started=True),
    "holo2": lambda: TagReasoningParser(),           # = glm45 class
    "mimo": lambda: TagReasoningParser(),            # = qwen3 class
    "minimax_m2_append_think": lambda: AppendThinkReasoningParser(
        assume_started=True),
    # nemotron_v3 = deepseek_r1 semantics (the reference adds a
    # chat_template_kwargs-driven swap we have no channel for).
    "nemotron_v3": lambda: TagReasoningParser(assume_started=True),
    "olmo3": lambda: TagReasoningParser(),
    "seed_oss": lambda: TagReasoningParser(open_tag="<seed:think>",
                                           close_tag="</seed:think>"),
    "step3p5": lambda: TagReasoningParser(),
    "gemma4": Gemma4ReasoningParser,
}


def get_reasoning_parser(name: str):
    if name not in REASONING_PARSERS:
        raise ValueError(f"unknown reasoning parser {name!r}; "
                         f"available: {sorted(REASONING_PARSERS)}")
    return REASONING_PARSERS[name]()
