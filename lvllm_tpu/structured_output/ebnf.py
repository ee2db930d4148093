"""guided_grammar: self-contained character-level Earley parser over EBNF.

Counterpart of the reference's xgrammar-backed ``guided_grammar`` backend
(``vllm/v1/structured_output/backend_xgrammar.py``) — that library doesn't
exist in this image, so this implements the grammar engine directly:

- EBNF parsing for both GBNF-style (``root ::= expr``) and lark-style
  (``start: expr``) rule syntax: alternation ``|``, grouping ``(...)``,
  ``? * +`` quantifiers, quoted terminals with escapes, character classes
  ``[a-z0-9]`` (incl. negation), and rule references.
- An Earley recognizer over characters (handles arbitrary CFGs including
  left/right recursion and nullable rules, via the Aycock–Horspool
  nullable-prediction fix).
- Token masks by trial-advancing each candidate token's decoded text; the
  chart is append-only so trials share the committed prefix. Candidates
  are prefiltered by a first-character→token index.
- ``forced_continuation`` walks unique next characters for jump-forward
  decoding (SGLang-style; reference: structured output jump-forward).
"""

from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

Sym = Tuple[str, object]          # ("nt", name) | ("ch", matcher)
Item = Tuple[int, int, int]       # (production id, dot, origin set index)


def _class_matcher(spec: str) -> Tuple[Callable[[str], bool], str]:
    """Compile a [...] body (after the opening bracket content, sans
    brackets) to a char predicate. Returns (matcher, probe_chars_hint)."""
    negate = spec.startswith("^")
    if negate:
        spec = spec[1:]
    ranges: List[Tuple[str, str]] = []
    singles: Set[str] = set()
    i = 0
    while i < len(spec):
        c = spec[i]
        if c == "\\" and i + 1 < len(spec):
            c = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "]": "]",
                 "-": "-", "^": "^"}.get(spec[i + 1], spec[i + 1])
            i += 2
        else:
            i += 1
        if i < len(spec) - 1 and spec[i] == "-":
            hi = spec[i + 1]
            if hi == "\\" and i + 2 < len(spec):
                hi = spec[i + 2]
                i += 1
            ranges.append((c, hi))
            i += 2
        else:
            singles.add(c)

    def match(ch: str) -> bool:
        hit = ch in singles or any(lo <= ch <= hi for lo, hi in ranges)
        return hit != negate

    probe_chars = set(singles)
    for lo, hi in ranges:
        span = ord(hi) - ord(lo) + 1
        if span > 0x300:        # unbounded-ish range: fall back to try-all
            return match, ""
        probe_chars.update(chr(c) for c in range(ord(lo), ord(hi) + 1))
    probe = "".join(sorted(probe_chars))
    return match, (probe if not negate else "")


class _EbnfParser:
    """Parses EBNF text into desugared productions (char terminals only)."""

    def __init__(self, text: str):
        self.prods: List[Tuple[str, Tuple[Sym, ...]]] = []
        self._aux = 0
        self._parse_rules(text)

    def _fresh(self) -> str:
        self._aux += 1
        return f"%aux{self._aux}"

    def _parse_rules(self, text: str) -> None:
        # Strip comments; join continuation lines (a line that doesn't
        # contain a rule-def operator continues the previous rule).
        lines = []
        for raw in text.splitlines():
            line = raw.split("#")[0].split("//")[0].rstrip()
            if not line.strip():
                continue
            import re
            if re.match(r"^\s*[A-Za-z_][\w-]*\s*(::=|:=|:)", line):
                lines.append(line)
            elif lines:
                lines[-1] += " " + line.strip()
        if not lines:
            raise ValueError("empty grammar")
        for line in lines:
            import re
            m = re.match(r"^\s*([A-Za-z_][\w-]*)\s*(?:::=|:=|:)\s*(.*)$",
                         line)
            if not m:
                raise ValueError(f"bad grammar rule: {line!r}")
            name, body = m.group(1), m.group(2)
            for alt in self._alternatives(body):
                self.prods.append((name, tuple(alt)))

    # ---- body expression parsing (recursive descent over one string) ----

    def _alternatives(self, body: str) -> List[List[Sym]]:
        self._s = body
        self._i = 0
        alts = self._parse_alts(top=True)
        if self._i < len(self._s):
            raise ValueError(f"trailing grammar text: {self._s[self._i:]!r}")
        return alts

    def _parse_alts(self, top=False) -> List[List[Sym]]:
        alts = [self._parse_seq()]
        while self._peek() == "|":
            self._i += 1
            alts.append(self._parse_seq())
        return alts

    def _parse_seq(self) -> List[Sym]:
        seq: List[Sym] = []
        while True:
            self._skip_ws()
            c = self._peek()
            if c in ("", "|", ")"):
                return seq
            sym = self._parse_atom()
            self._skip_ws()
            q = self._peek()
            if q in ("?", "*", "+"):
                self._i += 1
                aux = self._fresh()
                if q == "?":
                    self.prods.append((aux, ()))
                    self.prods.append((aux, (sym,) if not isinstance(sym,
                                       list) else tuple(sym)))
                elif q == "*":
                    self.prods.append((aux, ()))
                    self.prods.append((aux, (("nt", aux),) + (
                        tuple(sym) if isinstance(sym, list) else (sym,))))
                else:  # +
                    unit = tuple(sym) if isinstance(sym, list) else (sym,)
                    self.prods.append((aux, unit))
                    self.prods.append((aux, (("nt", aux),) + unit))
                seq.append(("nt", aux))
            else:
                if isinstance(sym, list):
                    seq.extend(sym)
                else:
                    seq.append(sym)

    def _parse_atom(self):
        c = self._peek()
        if c == "(":
            self._i += 1
            alts = self._parse_alts()
            if self._peek() != ")":
                raise ValueError("unclosed group")
            self._i += 1
            if len(alts) == 1:
                return alts[0]                 # inline the sequence
            aux = self._fresh()
            for alt in alts:
                self.prods.append((aux, tuple(alt)))
            return ("nt", aux)
        if c in ('"', "'"):
            quote = c
            self._i += 1
            chars: List[str] = []
            while self._peek() and self._peek() != quote:
                ch = self._s[self._i]
                self._i += 1
                if ch == "\\":
                    nxt = self._s[self._i]
                    self._i += 1
                    ch = {"n": "\n", "t": "\t", "r": "\r",
                          "\\": "\\", quote: quote}.get(nxt, nxt)
                chars.append(ch)
            if self._peek() != quote:
                raise ValueError("unclosed string terminal")
            self._i += 1
            return [("ch", _LitMatcher(ch)) for ch in chars]
        if c == "[":
            self._i += 1
            j = self._i
            while j < len(self._s) and (self._s[j] != "]" or
                                        self._s[j - 1] == "\\"):
                j += 1
            if j >= len(self._s):
                raise ValueError("unclosed char class")
            spec = self._s[self._i:j]
            self._i = j + 1
            match, probe = _class_matcher(spec)
            return ("ch", _ClassMatcher(match, probe, spec))
        import re
        m = re.match(r"[A-Za-z_][\w-]*", self._s[self._i:])
        if m:
            self._i += len(m.group(0))
            return ("nt", m.group(0))
        raise ValueError(f"bad grammar atom at: {self._s[self._i:]!r}")

    def _peek(self) -> str:
        self._skip_ws()
        return self._s[self._i] if self._i < len(self._s) else ""

    def _skip_ws(self) -> None:
        while self._i < len(self._s) and self._s[self._i] in " \t":
            self._i += 1


class _LitMatcher:
    __slots__ = ("ch",)

    def __init__(self, ch: str):
        self.ch = ch

    def __call__(self, c: str) -> bool:
        return c == self.ch

    @property
    def probe(self) -> str:
        return self.ch


class _ClassMatcher:
    __slots__ = ("fn", "_probe", "spec")

    def __init__(self, fn, probe: str, spec: str):
        self.fn = fn
        self._probe = probe
        self.spec = spec

    def __call__(self, c: str) -> bool:
        return self.fn(c)

    @property
    def probe(self) -> str:
        return self._probe


class _Chart:
    """Append-only Earley chart: committed sets plus trial extensions."""

    def __init__(self, sets: List[Set[Item]]):
        self.sets = sets


class EbnfGrammar:
    """guided_grammar over an EBNF string (GBNF or lark rule syntax)."""

    def __init__(self, grammar: str, tokenizer, vocab_size: int,
                 eos_token_id: Optional[int] = None,
                 start: Optional[str] = None):
        parsed = _EbnfParser(grammar)
        self.prods = parsed.prods
        names = {lhs for lhs, _ in self.prods}
        for lhs, rhs in self.prods:
            for kind, v in rhs:
                if kind == "nt" and v not in names:
                    raise ValueError(f"undefined grammar rule: {v}")
        if start is None:
            for cand in ("root", "start"):
                if cand in names:
                    start = cand
                    break
            else:
                start = self.prods[0][0]
        self.start = start
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id

        # Index productions by lhs; compute nullable set.
        self.by_lhs: Dict[str, List[int]] = {}
        for pid, (lhs, _) in enumerate(self.prods):
            self.by_lhs.setdefault(lhs, []).append(pid)
        self.nullable = self._nullable()

        from lvllm_tpu.structured_output.grammar import _token_text_table
        self._token_text = _token_text_table(tokenizer, vocab_size)
        # First-character index for mask prefiltering.
        self._first_char: Dict[str, List[int]] = {}
        for tid, text in enumerate(self._token_text):
            if text:
                self._first_char.setdefault(text[0], []).append(tid)

        sets = [set()]
        for pid in self.by_lhs.get(self.start, []):
            self._add(sets, 0, (pid, 0, 0))
        self._chart = sets

    def _nullable(self) -> Set[str]:
        nullable: Set[str] = set()
        changed = True
        while changed:
            changed = False
            for lhs, rhs in self.prods:
                if lhs in nullable:
                    continue
                if all(k == "nt" and v in nullable for k, v in rhs):
                    nullable.add(lhs)
                    changed = True
        return nullable

    # ---- Earley mechanics ----------------------------------------------

    def _add(self, sets: List[Set[Item]], si: int, item: Item) -> None:
        """Add item + predict/complete closure into sets[si]."""
        stack = [item]
        cur = sets[si]
        while stack:
            it = stack.pop()
            if it in cur:
                continue
            cur.add(it)
            pid, dot, origin = it
            rhs = self.prods[pid][1]
            if dot < len(rhs):
                kind, v = rhs[dot]
                if kind == "nt":
                    for p2 in self.by_lhs.get(v, []):
                        stack.append((p2, 0, si))
                    if v in self.nullable:      # Aycock–Horspool fix
                        stack.append((pid, dot + 1, origin))
            else:
                lhs = self.prods[pid][0]
                for it2 in list(sets[origin]):
                    p2, d2, o2 = it2
                    rhs2 = self.prods[p2][1]
                    if d2 < len(rhs2) and rhs2[d2] == ("nt", lhs):
                        stack.append((p2, d2 + 1, o2))

    def _scan(self, sets: List[Set[Item]], ch: str) -> bool:
        """Scan one char from the LAST set; appends a new set. Returns
        False (and appends nothing) if no item matches."""
        si = len(sets) - 1
        moved: List[Item] = []
        for pid, dot, origin in sets[si]:
            rhs = self.prods[pid][1]
            if dot < len(rhs) and rhs[dot][0] == "ch" and rhs[dot][1](ch):
                moved.append((pid, dot + 1, origin))
        if not moved:
            return False
        sets.append(set())
        for it in moved:
            self._add(sets, len(sets) - 1, it)
        return True

    def _accepting(self, sets: List[Set[Item]]) -> bool:
        last = sets[-1]
        for pid in self.by_lhs.get(self.start, []):
            if (pid, len(self.prods[pid][1]), 0) in last:
                return True
        return False

    def _trial(self, text: str) -> bool:
        """Advance a copy-on-write chart through text; committed sets are
        shared (append-only)."""
        sets = list(self._chart)
        for ch in text:
            # _scan/_add only ever WRITE the newly appended set (predict
            # and complete read older sets), so committed sets are shared
            # untouched between trials.
            if not self._scan(sets, ch):
                return False
        return True

    def next_char_matchers(self):
        out = []
        for pid, dot, _ in self._chart[-1]:
            rhs = self.prods[pid][1]
            if dot < len(rhs) and rhs[dot][0] == "ch":
                out.append(rhs[dot][1])
        return out

    # ---- Grammar protocol ------------------------------------------------

    def allowed_token_mask(self) -> np.ndarray:
        mask = np.zeros(self.vocab_size, dtype=bool)
        matchers = self.next_char_matchers()
        candidates: Set[int] = set()
        probed_all = True
        for m in matchers:
            probe = m.probe
            if probe:
                for ch in probe:
                    candidates.update(self._first_char.get(ch, []))
            else:
                probed_all = False       # negated class: try everything
        if probed_all:
            cand_list: Sequence[int] = sorted(candidates)
        else:
            cand_list = [tid for tid, t in enumerate(self._token_text) if t]
        for tid in cand_list:
            text = self._token_text[tid]
            if text and self._trial(text):
                mask[tid] = True
        if self.eos_token_id is not None and self._accepting(self._chart):
            mask[self.eos_token_id] = True
        return mask

    def advance(self, token_id: int) -> bool:
        if token_id == self.eos_token_id:
            return self._accepting(self._chart)
        text = self._token_text[token_id]
        if not text:
            return False
        sets = list(self._chart)
        for ch in text:
            if not self._scan(sets, ch):
                return False
        self._chart = sets
        return True

    @property
    def is_complete(self) -> bool:
        return self._accepting(self._chart)

    def forced_continuation(self, max_chars: int = 64) -> str:
        """Maximal string of characters that are each the UNIQUE allowed
        next character (jump-forward text). Stops at acceptance or
        branching."""
        sets = list(self._chart)
        out = []
        for _ in range(max_chars):
            if self._accepting(sets):
                break
            chars: Set[str] = set()
            multi = False
            for pid, dot, _ in sets[-1]:
                rhs = self.prods[pid][1]
                if dot < len(rhs) and rhs[dot][0] == "ch":
                    m = rhs[dot][1]
                    if isinstance(m, _LitMatcher):
                        chars.add(m.ch)
                    elif len(m.probe) == 1:
                        # A class that admits exactly one character.
                        chars.add(m.probe)
                    else:
                        multi = True
                    if len(chars) > 1 or multi:
                        break
            if multi or len(chars) != 1:
                break
            ch = next(iter(chars))
            if not self._scan(sets, ch):
                break
            out.append(ch)
        return "".join(out)
