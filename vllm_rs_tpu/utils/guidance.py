"""Guided decoding: constraints → per-step token masks.

Counterpart of the reference's llguidance integration (utils/guidance.rs
ConstraintBuilder choice/regex/json/..., per-seq GuidanceState → token
bitmask applied to logits before sampling, core/runner.rs:188-372).
llguidance is not available in this environment, so this is a
self-contained engine:

- `choice`: literal-string alternatives — exact text continuation.
- `regex`: a Thompson-NFA engine over a practical regex subset
  (literals, escapes, classes, ., * + ? {m,n}, |, groups).
- `json`: any syntactically valid JSON document (pushdown automaton).
- `json_schema`: flat-ish schemas compiled to a regex (objects with fixed
  properties of type string/number/integer/boolean/enum, arrays of
  scalars); anything deeper falls back to free-form `json`.

Token-level filtering uses the outlines-style trick: the tokenizer's vocab
is held as a character trie; for each automaton state the engine walks the
trie once, pruning dead branches, and memoizes the allowed-token set. The
mask is applied on device inside the jitted sampling step (the reference
applies llguidance bitmasks the same way, runner.rs:300-330).
"""

from __future__ import annotations

import json
from typing import Dict, FrozenSet, List, Optional, Sequence, Set, Tuple

# ---------------------------------------------------------------------------
# regex → NFA (Thompson construction over a practical subset)
# ---------------------------------------------------------------------------

_CLASS_ESCAPES = {
    "d": set("0123456789"),
    "w": set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"),
    "s": set(" \t\n\r\f\v"),
}
_ANY = None  # wildcard marker on transitions


class _NFA:
    """States are ints; transitions: state → list of (charset|_ANY, state);
    eps: state → list of states. `charset` is a frozenset of chars."""

    def __init__(self):
        self.trans: List[List[Tuple[Optional[FrozenSet[str]], int]]] = []
        self.eps: List[List[int]] = []
        self.start = 0
        self.accept = 0

    def new_state(self) -> int:
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1


class _RegexParser:
    """Recursive-descent regex → NFA fragment compiler."""

    def __init__(self, pattern: str, nfa: _NFA):
        self.p = pattern
        self.i = 0
        self.n = nfa

    def peek(self) -> str:
        return self.p[self.i] if self.i < len(self.p) else ""

    def eat(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self) -> Tuple[int, int]:
        s, e = self._alt()
        if self.i < len(self.p):
            raise ValueError(f"regex parse error at {self.i} in {self.p!r}")
        return s, e

    def _alt(self) -> Tuple[int, int]:
        frags = [self._concat()]
        while self.peek() == "|":
            self.eat()
            frags.append(self._concat())
        if len(frags) == 1:
            return frags[0]
        s, e = self.n.new_state(), self.n.new_state()
        for fs, fe in frags:
            self.n.eps[s].append(fs)
            self.n.eps[fe].append(e)
        return s, e

    def _concat(self) -> Tuple[int, int]:
        s = e = self.n.new_state()
        while self.peek() and self.peek() not in "|)":
            fs, fe = self._repeat()
            self.n.eps[e].append(fs)
            e = fe
        return s, e

    def _repeat(self) -> Tuple[int, int]:
        fs, fe = self._atom()
        while True:
            c = self.peek()
            if c == "*":
                self.eat()
                s, e = self.n.new_state(), self.n.new_state()
                self.n.eps[s] += [fs, e]
                self.n.eps[fe] += [fs, e]
                fs, fe = s, e
            elif c == "+":
                self.eat()
                e = self.n.new_state()
                self.n.eps[fe] += [fs, e]
                fs, fe = fs, e
            elif c == "?":
                self.eat()
                s, e = self.n.new_state(), self.n.new_state()
                self.n.eps[s] += [fs, e]
                self.n.eps[fe].append(e)
                fs, fe = s, e
            elif c == "{":
                j = self.p.index("}", self.i)
                spec = self.p[self.i + 1 : j]
                self.i = j + 1
                lo, _, hi = spec.partition(",")
                m = int(lo)
                M = int(hi) if hi else (m if not _ else None)
                fs, fe = self._repeat_range(fs, fe, m, M)
            else:
                return fs, fe

    def _clone(self, fs: int, fe: int) -> Tuple[int, int]:
        """Deep-copy a fragment (states reachable from fs up to fe)."""
        mapping: Dict[int, int] = {}
        stack = [fs]
        while stack:
            s = stack.pop()
            if s in mapping:
                continue
            mapping[s] = self.n.new_state()
            for _, t in self.n.trans[s]:
                stack.append(t)
            for t in self.n.eps[s]:
                stack.append(t)
        for s, ns in mapping.items():
            for cs, t in self.n.trans[s]:
                self.n.trans[ns].append((cs, mapping[t]))
            for t in self.n.eps[s]:
                self.n.eps[ns].append(mapping[t])
        return mapping[fs], mapping[fe]

    def _repeat_range(self, fs, fe, m, M) -> Tuple[int, int]:
        s = e = self.n.new_state()
        for _ in range(m):
            cs, ce = self._clone(fs, fe)
            self.n.eps[e].append(cs)
            e = ce
        if M is None:  # {m,} → m copies + star
            st, se = self.n.new_state(), self.n.new_state()
            cs, ce = self._clone(fs, fe)
            self.n.eps[st] += [cs, se]
            self.n.eps[ce] += [cs, se]
            self.n.eps[e].append(st)
            e = se
        else:
            for _ in range(M - m):
                cs, ce = self._clone(fs, fe)
                skip = self.n.new_state()
                self.n.eps[e] += [cs, skip]
                self.n.eps[ce].append(skip)
                e = skip
        return s, e

    def _atom(self) -> Tuple[int, int]:
        c = self.eat()
        if c == "(":
            if self.p[self.i : self.i + 2] == "?:":
                self.i += 2
            fs, fe = self._alt()
            assert self.eat() == ")"
            return fs, fe
        if c == "[":
            charset = self._charclass()
            return self._edge(charset)
        if c == ".":
            return self._edge(_ANY)
        if c == "\\":
            esc = self.eat()
            if esc in _CLASS_ESCAPES:
                return self._edge(frozenset(_CLASS_ESCAPES[esc]))
            if esc == "n":
                return self._edge(frozenset("\n"))
            if esc == "t":
                return self._edge(frozenset("\t"))
            return self._edge(frozenset(esc))
        return self._edge(frozenset(c))

    def _charclass(self) -> FrozenSet[str]:
        chars: Set[str] = set()
        negate = False
        if self.peek() == "^":
            self.eat()
            negate = True
        while self.peek() != "]":
            c = self.eat()
            if c == "\\":
                esc = self.eat()
                if esc in _CLASS_ESCAPES:
                    chars |= _CLASS_ESCAPES[esc]
                    continue
                c = {"n": "\n", "t": "\t"}.get(esc, esc)
            if self.peek() == "-" and self.p[self.i + 1 : self.i + 2] != "]":
                self.eat()
                hi = self.eat()
                chars |= {chr(x) for x in range(ord(c), ord(hi) + 1)}
            else:
                chars.add(c)
        self.eat()  # ]
        if negate:
            # complement within printable ASCII + whitespace
            universe = {chr(x) for x in range(32, 127)} | set("\n\t")
            chars = universe - chars
        return frozenset(chars)

    def _edge(self, charset) -> Tuple[int, int]:
        s, e = self.n.new_state(), self.n.new_state()
        self.n.trans[s].append((charset, e))
        return s, e


def compile_regex(pattern: str) -> _NFA:
    nfa = _NFA()
    p = _RegexParser(pattern, nfa)
    s, e = p.parse()
    nfa.start, nfa.accept = s, e
    return nfa


# ---------------------------------------------------------------------------
# character automaton interface
# ---------------------------------------------------------------------------


class CharAutomaton:
    """Minimal interface the token filter walks: hashable states, `step`
    (None = dead), `is_accepting`."""

    def initial(self):
        raise NotImplementedError

    def step(self, state, ch: str):
        raise NotImplementedError

    def is_accepting(self, state) -> bool:
        raise NotImplementedError


class RegexAutomaton(CharAutomaton):
    def __init__(self, pattern: str):
        self.nfa = compile_regex(pattern)

    def _closure(self, states: Set[int]) -> FrozenSet[int]:
        out = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for t in self.nfa.eps[s]:
                if t not in out:
                    out.add(t)
                    stack.append(t)
        return frozenset(out)

    def initial(self):
        return self._closure({self.nfa.start})

    def step(self, state: FrozenSet[int], ch: str):
        nxt: Set[int] = set()
        for s in state:
            for charset, t in self.nfa.trans[s]:
                if charset is _ANY or ch in charset:
                    nxt.add(t)
        if not nxt:
            return None
        return self._closure(nxt)

    def is_accepting(self, state) -> bool:
        return self.nfa.accept in state


class ChoiceAutomaton(CharAutomaton):
    """Literal alternatives; state = frozenset of (choice_idx, pos)."""

    def __init__(self, choices: Sequence[str]):
        self.choices = list(choices)

    def initial(self):
        return frozenset((i, 0) for i in range(len(self.choices)))

    def step(self, state, ch):
        nxt = {
            (i, p + 1)
            for i, p in state
            if p < len(self.choices[i]) and self.choices[i][p] == ch
        }
        return frozenset(nxt) if nxt else None

    def is_accepting(self, state):
        return any(p == len(self.choices[i]) for i, p in state)


class ChainAutomaton(CharAutomaton):
    """Sequential composition of automatons (literal → inner → literal…).

    State = frozenset of (part_idx, part_state); a part's accepting state
    epsilon-advances into the next part. Used for forced tool calls
    (reference tools/schema.rs tool-call grammar):
    `<tool_call>{"name": "<enum>", "arguments": <json>}</tool_call>`.
    """

    def __init__(self, parts):
        self.parts = list(parts)

    def _expand(self, states):
        """Add epsilon-advances from accepting part states."""
        out = set(states)
        stack = list(states)
        while stack:
            i, st = stack.pop()
            if i + 1 < len(self.parts) and self.parts[i].is_accepting(st):
                nxt = (i + 1, self.parts[i + 1].initial())
                if nxt not in out:
                    out.add(nxt)
                    stack.append(nxt)
        return frozenset(out)

    def initial(self):
        return self._expand({(0, self.parts[0].initial())})

    def step(self, state, ch):
        nxt = set()
        for i, st in state:
            st2 = self.parts[i].step(st, ch)
            if st2 is not None:
                nxt.add((i, st2))
        if not nxt:
            return None
        return self._expand(nxt)

    def is_accepting(self, state):
        last = len(self.parts) - 1
        return any(i == last and self.parts[i].is_accepting(st) for i, st in state)


def _literal(text: str) -> "ChoiceAutomaton":
    return ChoiceAutomaton([text])


class JsonAutomaton(CharAutomaton):
    """Any syntactically valid JSON value — pushdown automaton with the
    stack folded into the (hashable) state tuple: (mode, stack, extra)."""

    # modes
    VALUE, STR, STR_ESC, NUM, WORD, AFTER, OBJ_KEY_OR_END, OBJ_COLON, OBJ_KEY = (
        "value", "str", "esc", "num", "word", "after", "obj0", "colon", "key",
    )

    def initial(self):
        return (self.VALUE, (), "")

    def is_accepting(self, state):
        mode, stack, extra = state
        if stack:
            return False
        if mode == self.AFTER:
            return True
        if mode == self.NUM:
            return extra not in ("-", "") and not extra.endswith(
                ("e", "E", "+", "-", ".")
            )
        return False

    def step(self, state, ch):
        mode, stack, extra = state
        ws = ch in " \t\n\r"
        if mode == self.VALUE:
            if ws:
                return state
            if ch == "{":
                return (self.OBJ_KEY_OR_END, stack + ("}",), "")
            if ch == "[":
                return (self.VALUE_OR_END(), stack + ("]",), "")
            if ch == '"':
                return (self.STR, stack, "")
            if ch in "-0123456789":
                return (self.NUM, stack, ch)
            for w in ("true", "false", "null"):
                if w[0] == ch:
                    return (self.WORD, stack, w[1:])
            return None
        if mode == "value_or_end":
            if ws:
                return state
            if ch == "]" and stack and stack[-1] == "]":
                return (self.AFTER, stack[:-1], "")
            return self.step((self.VALUE, stack, ""), ch)
        if mode == self.OBJ_KEY_OR_END:
            if ws:
                return state
            if ch == "}" and stack and stack[-1] == "}":
                return (self.AFTER, stack[:-1], "")
            if ch == '"':
                return (self.STR, stack, "key")
            return None
        if mode == self.OBJ_KEY:
            if ws:
                return state
            if ch == '"':
                return (self.STR, stack, "key")
            return None
        if mode == self.STR:
            if ch == '"':
                return (self.OBJ_COLON, stack, "") if extra == "key" else (self.AFTER, stack, "")
            if ch == "\\":
                return (self.STR_ESC, stack, extra)
            if ch in "\n\t":
                return None
            return state
        if mode == self.STR_ESC:
            if ch in '"\\/bfnrtu':
                return (self.STR, stack, extra)
            return None
        if mode == self.OBJ_COLON:
            if ws:
                return state
            if ch == ":":
                return (self.VALUE, stack, "")
            return None
        if mode == self.NUM:
            if ch in "0123456789":
                if extra in ("0", "-0"):  # JSON forbids leading zeros
                    return None
                return (self.NUM, stack, extra + ch)
            if ch == "." and "." not in extra and "e" not in extra.lower():
                return (self.NUM, stack, extra + ch)
            if ch in "eE" and "e" not in extra.lower() and extra[-1:] in tuple("0123456789"):
                return (self.NUM, stack, extra + ch)
            if ch in "+-" and extra[-1:] in ("e", "E"):
                return (self.NUM, stack, extra + ch)
            if self.is_accepting((self.NUM, (), extra)):
                return self.step((self.AFTER, stack, ""), ch)
            return None
        if mode == self.WORD:
            if extra and ch == extra[0]:
                rest = extra[1:]
                return (self.AFTER, stack, "") if not rest else (self.WORD, stack, rest)
            return None
        if mode == self.AFTER:
            if ws:
                return state
            if stack:
                top = stack[-1]
                if ch == ",":
                    return (
                        (self.OBJ_KEY, stack, "") if top == "}" else (self.VALUE, stack, "")
                    )
                if ch == top:
                    return (self.AFTER, stack[:-1], "")
            return None
        return None

    def VALUE_OR_END(self):
        return "value_or_end"


# ---------------------------------------------------------------------------
# JSON-schema → regex (practical subset; falls back to free-form JSON)
# ---------------------------------------------------------------------------

_WS = r"[ \n\t]*"
_STR_RE = r'"(?:[^"\\\n\t]|\\["\\/bfnrt])*"'
_NUM_RE = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"
_INT_RE = r"-?(?:0|[1-9]\d*)"
_BOOL_RE = r"(?:true|false)"


def _schema_to_regex(schema: dict) -> Optional[str]:
    if not isinstance(schema, dict):
        return None
    if "enum" in schema:
        alts = "|".join(_escape_literal(json.dumps(v)) for v in schema["enum"])
        return f"(?:{alts})"
    t = schema.get("type")
    if t == "string":
        return _STR_RE
    if t == "number":
        return _NUM_RE
    if t == "integer":
        return _INT_RE
    if t == "boolean":
        return _BOOL_RE
    if t == "null":
        return "null"
    if t == "array":
        item = _schema_to_regex(schema.get("items", {"type": "string"}))
        if item is None:
            return None
        return rf"\[{_WS}(?:{item}(?:{_WS},{_WS}{item})*)?{_WS}\]"
    if t == "object" and isinstance(schema.get("properties"), dict):
        parts = []
        for name, sub in schema["properties"].items():
            sub_re = _schema_to_regex(sub)
            if sub_re is None:
                return None
            parts.append(rf'"{_escape_literal(name)}"{_WS}:{_WS}{sub_re}')
        inner = rf"{_WS},{_WS}".join(parts)
        return rf"\{{{_WS}{inner}{_WS}\}}"
    return None


def _escape_literal(s: str) -> str:
    out = []
    for c in s:
        if c in r"\.[]{}()*+?|^$/":
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


# ---------------------------------------------------------------------------
# token-level filtering
# ---------------------------------------------------------------------------


class TokenTrie:
    """Character trie over the tokenizer's per-token decoded strings."""

    def __init__(self, token_strings: Dict[int, str]):
        self.root: dict = {}
        for tid, s in token_strings.items():
            if not s:
                continue
            node = self.root
            for ch in s:
                node = node.setdefault(ch, {})
            node.setdefault(None, []).append(tid)

    @staticmethod
    def from_tokenizer(tokenizer, vocab_size: int) -> "TokenTrie":
        strings = {}
        for tid in range(vocab_size):
            try:
                s = tokenizer.decode([tid], skip_special_tokens=False)
            except Exception:
                continue
            strings[tid] = s
        return TokenTrie(strings)


def build_constraint(kind: str, arg) -> CharAutomaton:
    """ConstraintBuilder (reference guidance.rs:57-130)."""
    if kind == "choice":
        return ChoiceAutomaton(arg)
    if kind == "regex":
        return RegexAutomaton(arg)
    if kind in ("json", "json_object"):
        if arg:
            return build_constraint("json_schema", arg)
        return JsonAutomaton()
    if kind == "json_schema":
        rx = _schema_to_regex(arg) if arg else None
        if rx is not None:
            return RegexAutomaton(rx)
        return JsonAutomaton()
    if kind == "tool_call":
        # forced tool call (reference tools/schema.rs grammar). arg is
        # either a plain name list (legacy: ChatML markers) or a spec dict
        # {"names", "start", "end", "style"} carrying the model family's
        # markers so the forced output matches what its parser expects
        if isinstance(arg, dict):
            names = list(arg["names"])
            start = arg.get("start", "<tool_call>")
            end = arg.get("end", "</tool_call>")
            style = arg.get("style", "json")
        else:
            names = list(arg)
            start, end, style = "<tool_call>", "</tool_call>", "json"
        if style == "mistral":
            # [TOOL_CALLS][{...}] — the end marker IS the array's bracket
            return ChainAutomaton(
                [
                    _literal(start + '[{"name": "'),
                    ChoiceAutomaton(names),
                    _literal('", "arguments": '),
                    JsonAutomaton(),
                    _literal("}]"),
                ]
            )
        return ChainAutomaton(
            [
                _literal(start + '{"name": "'),
                ChoiceAutomaton(names),
                _literal('", "arguments": '),
                JsonAutomaton(),
                _literal("}" + end),
            ]
        )
    raise ValueError(f"unknown constraint kind {kind!r}")


class GuidanceState:
    """Per-sequence constraint state (reference GuidanceState,
    core/runner.rs:188-330): compute allowed tokens, advance on commit."""

    def __init__(self, automaton: CharAutomaton, trie: TokenTrie, eos_ids: Sequence[int]):
        self.automaton = automaton
        self.trie = trie
        self.eos_ids = list(eos_ids)
        self.state = automaton.initial()
        self._memo: Dict[object, List[int]] = {}

    @property
    def is_complete(self) -> bool:
        return self.automaton.is_accepting(self.state)

    def allowed_tokens(self) -> List[int]:
        """Token ids legal in the current state (+ EOS when accepting)."""
        key = self.state
        cached = self._memo.get(key)
        if cached is None:
            out: List[int] = []
            stack = [(self.trie.root, key)]
            while stack:
                node, st = stack.pop()
                for ch, child in node.items():
                    if ch is None:
                        out.extend(child)
                        continue
                    nst = self.automaton.step(st, ch)
                    if nst is not None:
                        stack.append((child, nst))
            cached = out
            self._memo[key] = cached
        if self.is_complete:
            return cached + self.eos_ids
        return cached

    def advance(self, token_id: int, token_str: str) -> None:
        """Commit a sampled token (no-op for EOS on a complete state)."""
        if token_id in self.eos_ids and self.is_complete:
            return
        st = self.state
        for ch in token_str:
            st = self.automaton.step(st, ch)
            if st is None:
                return  # token outside the grammar (shouldn't happen) — freeze
        self.state = st
