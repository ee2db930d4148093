"""Streaming (incremental) tool-call and reasoning parsing.

Counterpart of the reference's ``extract_tool_calls_streaming``
(``vllm/tool_parsers/abstract_tool_parser.py:138``) and the streaming
reasoning parsers (``vllm/reasoning/``): during SSE streaming the server
must emit OpenAI ``delta.tool_calls`` chunks (call header with id/name,
then incremental ``arguments`` fragments keyed by call index) and
``delta.reasoning_content`` — never leak raw tool/think tags as content.

Design: one :class:`StreamingParseState` per request wraps a *batch*
parser from ``tool_parsers.py``. Content streams with marker holdback (a
text tail that could be the start of a tool marker is withheld until
disambiguated). Once inside the tool region, per-format *partial
extractors* stream the in-progress call's name and argument fragments as
they arrive (hermes/deepseek JSON via a depth scanner;
qwen3_coder/qwen3_xml/glm4/minimax_m2 parameter blocks via incremental
JSON construction). Formats without a partial extractor fall back to
emitting each call's full delta when it completes — still well-formed
OpenAI streaming, just coarser.
"""

import json
import re
import uuid
from typing import Dict, List, Optional, Tuple


def _new_call_id() -> str:
    return f"call_{uuid.uuid4().hex[:24]}"


# ---- partial-JSON scanning --------------------------------------------------

def _json_value_span(s: str, i: int) -> Tuple[int, Optional[int]]:
    """Span of the JSON value starting at (or after whitespace from) s[i].
    Returns (start, end) with end=None while the value is incomplete;
    end is the index one past the value."""
    n = len(s)
    while i < n and s[i] in " \t\r\n":
        i += 1
    if i >= n:
        return i, None
    c = s[i]
    if c == '"':
        j = i + 1
        while j < n:
            if s[j] == "\\":
                j += 2
                continue
            if s[j] == '"':
                return i, j + 1
            j += 1
        return i, None
    if c in "{[":
        depth = 0
        j = i
        in_str = False
        while j < n:
            ch = s[j]
            if in_str:
                if ch == "\\":
                    j += 2
                    continue
                if ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
            elif ch in "{[":
                depth += 1
            elif ch in "}]":
                depth -= 1
                if depth == 0:
                    return i, j + 1
            j += 1
        return i, None
    # number / true / false / null — complete once a delimiter follows.
    j = i
    while j < n and s[j] not in ",}] \t\r\n":
        j += 1
    return i, (j if j < n else None)


def _scan_object_keys(s: str):
    """Iterate (key, value_start, value_end_or_None) over the top-level
    keys of a JSON object text starting at '{'. Stops at the first
    incomplete element."""
    i = s.find("{")
    if i < 0:
        return
    i += 1
    n = len(s)
    while True:
        while i < n and s[i] in " \t\r\n,":
            i += 1
        if i >= n or s[i] == "}":
            return
        if s[i] != '"':
            return
        ks, ke = _json_value_span(s, i)
        if ke is None:
            return
        try:
            key = json.loads(s[ks:ke])
        except json.JSONDecodeError:
            return
        i = ke
        while i < n and s[i] in " \t\r\n":
            i += 1
        if i >= n or s[i] != ":":
            yield key, None, None
            return
        vs, ve = _json_value_span(s, i + 1)
        yield key, vs, ve
        if ve is None:
            return
        i = ve


# ---- per-format partial extractors -----------------------------------------
#
# A partial extractor inspects the text of ONE in-progress (unterminated)
# tool call and returns (name or None, args_text_so_far or None,
# args_complete: bool). ``args_text_so_far`` must be a prefix of the final
# OpenAI ``arguments`` string the extractor will converge to.

def _partial_hermes(region: str):
    """Region after '<tool_call>': a JSON object with name/arguments."""
    name = None
    args_prefix = None
    args_done = False
    for key, vs, ve in _scan_object_keys(region):
        if key == "name" and ve is not None:
            try:
                name = json.loads(region[vs:ve])
            except json.JSONDecodeError:
                return None, None, False
        elif key in ("arguments", "parameters") and vs is not None \
                and vs < len(region):
            if region[vs] == '"':
                # String-typed arguments: only emit once complete (the
                # batch parser passes the decoded string through).
                if ve is not None:
                    try:
                        args_prefix = json.loads(region[vs:ve])
                        args_done = True
                    except json.JSONDecodeError:
                        pass
            else:
                args_prefix = region[vs:ve] if ve is not None \
                    else region[vs:]
                args_done = ve is not None
    return name, args_prefix, args_done


def _partial_deepseek(region: str):
    """Region after '<｜tool▁call▁begin｜>': either
    'function<｜tool▁sep｜>NAME\\n```json\\n{...}' (V3) or
    'NAME<｜tool▁sep｜>{...}' (V3.1)."""
    if "<｜tool▁sep｜>" not in region:
        return None, None, False
    head, rest = region.split("<｜tool▁sep｜>", 1)
    if head.strip() in ("function", "tool"):      # V3 spelling
        name = rest.split("```", 1)[0].strip() if "```" in rest \
            else (rest.split("\n", 1)[0].strip() if "\n" in rest else None)
    else:
        name = head.strip() or None
    j = rest.find("{")
    if j < 0:
        return name, None, False
    _, ve = _json_value_span(rest, j)
    if ve is None:
        return name, rest[j:], False
    return name, rest[j:ve], True


def _param_frags(body: str, param_open_re, param_close: str) -> List[str]:
    """'{"k": v' JSON fragments from completed <parameter> blocks.
    Fragments follow ``json.dumps`` spacing so the concatenation is a
    PREFIX of the batch parser's final ``json.dumps(dict)`` arguments."""
    frags = []
    pos = 0
    while True:
        pm = param_open_re.search(body, pos)
        if not pm:
            break
        end = body.find(param_close, pm.end())
        if end < 0:
            break
        key = next(g for g in pm.groups() if g is not None).strip()
        val = body[pm.end():end].strip()
        try:
            v = json.loads(val)
        except json.JSONDecodeError:
            v = val
        frags.append(json.dumps(key) + ": " + json.dumps(v))
        pos = end + len(param_close)
    return frags


def _make_param_partial(func_open_re, param_open_re, param_close: str,
                        name_from_match):
    """Partial extractor for XML-parameter formats."""

    def partial(region: str):
        m = func_open_re.search(region)
        if not m:
            return None, None, False
        name = name_from_match(m)
        frags = _param_frags(region[m.end():], param_open_re, param_close)
        if not frags:
            return name, None, False
        return name, "{" + ", ".join(frags), False

    return partial


_partial_qwen3_coder = _make_param_partial(
    re.compile(r"<function=([^>\n]+)>"),
    re.compile(r"<parameter=([^>\n]+)>"), "</parameter>",
    lambda m: m.group(1).strip())

_partial_qwen3_xml = _make_param_partial(
    re.compile(r'<function(?: name="([^"]+)"|=([^>\n]+))>'),
    re.compile(r'<parameter(?: name="([^"]+)"|=([^>\n]+))>'), "</parameter>",
    lambda m: (m.group(1) or m.group(2)).strip())


def _partial_minimax_m2(region: str):
    """Region after '<invoke name="': 'NAME">…<parameter name="K">V…'."""
    m = re.match(r'([^"]+)">', region)
    if not m:
        return None, None, False
    frags = _param_frags(region[m.end():],
                         re.compile(r'<parameter name="([^"]+)">'),
                         "</parameter>")
    if not frags:
        return m.group(1).strip(), None, False
    return m.group(1).strip(), "{" + ", ".join(frags), False


def _partial_glm4(region: str):
    """Region after '<tool_call>': 'NAME\\n<arg_key>K</arg_key>
    <arg_value>V</arg_value>…'."""
    if "\n" not in region and "<arg_key>" not in region:
        return None, None, False
    name = region.split("\n", 1)[0].split("<arg_key>", 1)[0].strip()
    if not name:
        return None, None, False
    frags = []
    for km in re.finditer(r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)"
                          r"</arg_value>", region, re.DOTALL):
        val = km.group(2).strip()
        try:
            v = json.loads(val)
        except json.JSONDecodeError:
            v = val
        frags.append(json.dumps(km.group(1).strip()) + ": " + json.dumps(v))
    if not frags:
        return name, None, False
    return name, "{" + ", ".join(frags), False


# Per batch-parser-class streaming profile: tool-region start markers,
# per-call start marker, optional partial extractor.
_PROFILES: Dict[str, dict] = {
    "HermesToolParser": dict(markers=["<tool_call>"],
                             call_marker="<tool_call>",
                             partial=_partial_hermes),
    "Granite4ToolParser": dict(markers=["<tool_call>"],
                               call_marker="<tool_call>",
                               partial=_partial_hermes),
    "Qwen3CoderToolParser": dict(markers=["<tool_call>"],
                                 call_marker="<tool_call>",
                                 partial=_partial_qwen3_coder),
    "Qwen3XmlToolParser": dict(markers=["<tool_call>"],
                               call_marker="<tool_call>",
                               partial=_partial_qwen3_xml),
    "Glm4ToolParser": dict(markers=["<tool_call>"],
                           call_marker="<tool_call>",
                           partial=_partial_glm4),
    "MiniMaxM2ToolParser": dict(markers=["<minimax:tool_call>"],
                                call_marker='<invoke name="',
                                partial=_partial_minimax_m2),
    # (minimax_m2 call_marker is the per-invoke open so multiple invokes
    # per <minimax:tool_call> block each stream separately)
    "MiniMaxToolParser": dict(markers=["<tool_calls>"],
                              call_marker="<tool_calls>", partial=None),
    "DeepseekV3ToolParser": dict(
        markers=["<｜tool▁calls▁begin｜>", "<｜tool▁call▁begin｜>"],
        call_marker="<｜tool▁call▁begin｜>", partial=_partial_deepseek),
    "DeepseekV31ToolParser": dict(
        markers=["<｜tool▁calls▁begin｜>", "<｜tool▁call▁begin｜>"],
        call_marker="<｜tool▁call▁begin｜>", partial=_partial_deepseek),
    "DeepseekV32ToolParser": dict(
        markers=["<｜tool▁calls▁begin｜>", "<｜tool▁call▁begin｜>",
                 "<|tool_calls_begin|>", "<|tool_call_begin|>"],
        call_marker=None, partial=None),
    "DeepseekV4ToolParser": dict(
        markers=["<｜tool▁calls▁begin｜>", "<｜tool▁call▁begin｜>",
                 "<|tool_calls_begin|>", "<|tool_call_begin|>"],
        call_marker=None, partial=None),
    "KimiK2ToolParser": dict(markers=["<|tool_calls_section_begin|>"],
                             call_marker="<|tool_call_begin|>",
                             partial=None),
    "MistralToolParser": dict(markers=["[TOOL_CALLS]"], call_marker=None,
                              partial=None),
    "SeedOssToolParser": dict(markers=["<seed:tool_call>"],
                              call_marker="<seed:tool_call>", partial=None),
    "InternLM2ToolParser": dict(markers=["<|action_start|>"],
                                call_marker="<|action_start|>",
                                partial=None),
    "Ernie45ToolParser": dict(markers=["<tool_call>"],
                              call_marker="<tool_call>",
                              partial=_partial_hermes),
    "LongcatToolParser": dict(markers=["<longcat_tool_call>"],
                              call_marker="<longcat_tool_call>",
                              partial=None),
    "HunyuanA13BToolParser": dict(markers=["<tool_calls>"],
                                  call_marker="<tool_calls>", partial=None),
}


class StreamingToolState:
    """Incremental tool-call extraction over a batch parser.

    ``feed(delta_text)`` returns a list of OpenAI delta payloads:
    ``{"content": str}`` or ``{"tool_calls": [chunk, ...]}`` where each
    chunk follows the streaming convention — the first chunk of call i
    carries id/type/function.name (arguments ""), later chunks carry only
    ``{"index": i, "function": {"arguments": fragment}}``.
    """

    def __init__(self, tool_parser):
        self.parser = tool_parser
        prof = _PROFILES.get(type(tool_parser).__name__, {})
        self.markers: List[str] = prof.get("markers") or []
        self.call_marker: Optional[str] = prof.get("call_marker")
        self.partial = prof.get("partial")
        self.text = ""
        self.content_emitted = 0      # chars of raw text streamed as content
        self.in_tools = False
        self.calls_emitted = 0        # fully emitted (complete) calls
        self.cur_header_sent = False
        self.cur_args_sent = ""
        self.cur_args_done = False    # raw-streamed args reached their end
        self.cur_id: Optional[str] = None
        self.any_calls = False

    # -- helpers ------------------------------------------------------------

    def _holdback(self, pending: str) -> int:
        """Length of the pending tail that could be the start of a marker."""
        best = 0
        for mk in self.markers:
            for L in range(min(len(mk) - 1, len(pending)), 0, -1):
                if pending.endswith(mk[:L]):
                    best = max(best, L)
                    break
        return best

    def _first_marker(self, s: str) -> int:
        idxs = [s.find(mk) for mk in self.markers]
        idxs = [i for i in idxs if i >= 0]
        return min(idxs) if idxs else -1

    def _call_region(self, idx: int) -> Optional[str]:
        """Text after the (idx+1)-th per-call marker, or None."""
        if not self.call_marker:
            return None
        start = -1
        pos = 0
        for _ in range(idx + 1):
            start = self.text.find(self.call_marker, pos)
            if start < 0:
                return None
            pos = start + len(self.call_marker)
        return self.text[start + len(self.call_marker):]

    def _call_chunks(self, idx: int, name: Optional[str],
                     args_fragment: str, new_call: bool) -> List[dict]:
        out = []
        if new_call:
            self.cur_id = _new_call_id()
            out.append({"index": idx, "id": self.cur_id, "type": "function",
                        "function": {"name": name, "arguments": ""}})
        if args_fragment:
            out.append({"index": idx,
                        "function": {"arguments": args_fragment}})
        return out

    # -- main ---------------------------------------------------------------

    def feed(self, delta_text: str, finished: bool = False) -> List[dict]:
        self.text += delta_text
        out: List[dict] = []

        if not self.in_tools:
            pending = self.text[self.content_emitted:]
            mpos = self._first_marker(pending)
            if mpos >= 0:
                if mpos > 0:
                    out.append({"content": pending[:mpos]})
                self.content_emitted += mpos
                self.in_tools = True
            else:
                hold = self._holdback(pending) if not finished else 0
                emit = pending[:len(pending) - hold] if hold else pending
                if emit:
                    out.append({"content": emit})
                    self.content_emitted += len(emit)
                return out

        # Tool region: batch-parse for completed calls, then stream the
        # in-progress call via the partial extractor.
        _, calls = self.parser.extract(self.text)
        while self.calls_emitted < len(calls):
            call = calls[self.calls_emitted]
            if self.cur_header_sent:
                # The streamed partial converges to the completed call:
                # emit the remaining suffix. Raw-JSON streams (hermes /
                # deepseek) may differ textually from the batch parser's
                # normalized dump — when the raw value already closed
                # (cur_args_done) or diverged, emit nothing more (the
                # streamed text is complete, JSON-equivalent).
                full = call.arguments
                if self.cur_args_done:
                    rest = ""
                elif full.startswith(self.cur_args_sent):
                    rest = full[len(self.cur_args_sent):]
                else:
                    # Raw-streamed prefix (model's own spacing) vs the
                    # batch parser's normalized dump: finish from the raw
                    # region instead so the concatenation stays coherent.
                    rest = ""
                    region = self._call_region(self.calls_emitted)
                    if self.partial is not None and region is not None:
                        _n, raw, _d = self.partial(region)
                        if raw and raw.startswith(self.cur_args_sent):
                            rest = raw[len(self.cur_args_sent):]
                chunks = self._call_chunks(self.calls_emitted, None, rest,
                                           new_call=False)
            else:
                chunks = self._call_chunks(self.calls_emitted, call.name,
                                           call.arguments, new_call=True)
            if chunks:
                out.append({"tool_calls": chunks})
            self.any_calls = True
            self.calls_emitted += 1
            self.cur_header_sent = False
            self.cur_args_sent = ""
            self.cur_args_done = False

        if self.partial is not None and not finished:
            region = self._call_region(self.calls_emitted)
            if region is not None:
                name, args, done = self.partial(region)
                chunks = []
                if name and not self.cur_header_sent:
                    chunks += self._call_chunks(self.calls_emitted, name,
                                                "", new_call=True)
                    self.cur_header_sent = True
                if self.cur_header_sent and args:
                    if args.startswith(self.cur_args_sent) and \
                            len(args) > len(self.cur_args_sent):
                        frag = args[len(self.cur_args_sent):]
                        chunks += self._call_chunks(self.calls_emitted,
                                                    None, frag,
                                                    new_call=False)
                        self.cur_args_sent = args
                    if done:
                        self.cur_args_done = True
                if chunks:
                    out.append({"tool_calls": chunks})
        return out

    def finish(self) -> List[dict]:
        """Flush at end-of-stream (emits any complete-but-unstreamed calls
        and trailing content)."""
        return self.feed("", finished=True)


class StreamingReasoningState:
    """Incremental ``<think>…</think>`` splitting.

    Reasoning streams as ``reasoning_content`` deltas; once the close tag
    arrives the remainder streams as plain text (handed to the caller for
    tool parsing). If the response does not open with the think tag and
    ``assume_reasoning_first`` is False, everything is plain text.
    """

    def __init__(self, open_tag: str = "<think>",
                 close_tag: str = "</think>",
                 assume_reasoning_first: bool = False):
        self.open_tag = open_tag
        self.close_tag = close_tag
        self.state = "start"  # start | reason | content
        if assume_reasoning_first:
            self.state = "reason"
        self.buf = ""

    def feed(self, delta_text: str, finished: bool = False
             ) -> List[Tuple[str, str]]:
        """Returns [(kind, text)] with kind in {"reasoning", "content"}."""
        self.buf += delta_text
        out: List[Tuple[str, str]] = []
        while True:
            if self.state == "start":
                s = self.buf.lstrip()
                if s.startswith(self.open_tag):
                    drop = len(self.buf) - len(s) + len(self.open_tag)
                    self.buf = self.buf[drop:]
                    if self.buf.startswith("\n"):
                        self.buf = self.buf[1:]
                    self.state = "reason"
                    continue
                if not finished and len(s) < len(self.open_tag) and \
                        self.open_tag.startswith(s):
                    return out  # could still become the open tag — hold
                self.state = "content"
                continue
            if self.state == "reason":
                idx = self.buf.find(self.close_tag)
                if idx >= 0:
                    if self.buf[:idx]:
                        out.append(("reasoning", self.buf[:idx]))
                    self.buf = self.buf[idx + len(self.close_tag):]
                    if self.buf.startswith("\n"):
                        self.buf = self.buf[1:]
                    self.state = "content"
                    continue
                hold = 0 if finished else self._tag_holdback()
                emit = self.buf[:len(self.buf) - hold] if hold \
                    else self.buf
                if emit:
                    out.append(("reasoning", emit))
                    self.buf = self.buf[len(emit):]
                return out
            # content
            if self.buf:
                out.append(("content", self.buf))
                self.buf = ""
            return out

    def _tag_holdback(self) -> int:
        for L in range(min(len(self.close_tag) - 1, len(self.buf)), 0, -1):
            if self.buf.endswith(self.close_tag[:L]):
                return L
        return 0


class StreamingParseState:
    """Composed per-request streaming state: reasoning splitting feeding
    tool-call extraction. ``feed`` returns OpenAI delta payload dicts with
    any of: content / reasoning_content / tool_calls."""

    def __init__(self, tool_parser=None, reasoning_parser=None,
                 assume_reasoning_first: bool = False):
        self.tools = StreamingToolState(tool_parser) if tool_parser else None
        self.reason = None
        if reasoning_parser is not None:
            self.reason = StreamingReasoningState(
                getattr(reasoning_parser, "open_tag", "<think>"),
                getattr(reasoning_parser, "close_tag", "</think>"),
                assume_reasoning_first)

    @property
    def saw_tool_calls(self) -> bool:
        return bool(self.tools and self.tools.any_calls)

    def feed(self, delta_text: str, finished: bool = False) -> List[dict]:
        parts: List[Tuple[str, str]]
        if self.reason is not None:
            parts = self.reason.feed(delta_text, finished)
        else:
            parts = [("content", delta_text)] if delta_text else []
        out: List[dict] = []
        for kind, text in parts:
            if kind == "reasoning":
                out.append({"reasoning_content": text})
            elif self.tools is not None:
                out.extend(self.tools.feed(text))
            elif text:
                out.append({"content": text})
        if finished and self.tools is not None:
            out.extend(self.tools.finish())
        return out
