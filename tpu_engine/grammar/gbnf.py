"""GBNF parser + incremental pushdown matcher for constrained decoding.

TPU-native rebuild of the llama.cpp grammar engine the reference drives via
sparams.grammar (/root/reference/src/llama_server_context.cc:473, grammar
files llama_engine.cc:573-585; SURVEY.md section 2b "Grammar (GBNF)"):
rules -> alternates -> (char-ranges | rule refs), a pushdown automaton over
code points, and a vocabulary *trie* walk so computing the per-step token
mask is O(reachable-trie-nodes), not O(vocab x piece-len)
(SURVEY.md section 7 "Grammar masking at vocab scale").

GBNF syntax: rule ::= alternates; literals "..", char classes [a-z0-9^..],
groups ( ), repetition * + ? and {m}, {m,n}, rule refs, # comments.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# elements: ("char", ((lo, hi), ...)) | ("nchar", ranges) | ("ref", rule_idx)


class GBNFError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.rules: dict[str, int] = {}
        self.bodies: list[list[list[tuple]] | None] = []
        self.counter = 0

    def rule_id(self, name: str) -> int:
        if name not in self.rules:
            self.rules[name] = len(self.bodies)
            self.bodies.append(None)
        return self.rules[name]

    # -- lexing helpers ----------------------------------------------------
    def _ws(self, newlines: bool = False) -> None:
        while self.pos < len(self.text):
            c = self.text[self.pos]
            if c == "#":
                while self.pos < len(self.text) and self.text[self.pos] != "\n":
                    self.pos += 1
            elif c in " \t" or (newlines and c in "\r\n"):
                self.pos += 1
            elif c == "\\" and self.pos + 1 < len(self.text) and self.text[self.pos + 1] == "\n":
                self.pos += 2
            else:
                return

    def _peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def _name(self) -> str:
        start = self.pos
        while self._peek().isalnum() or self._peek() in ("-", "_"):
            self.pos += 1
        if start == self.pos:
            raise GBNFError(f"expected rule name at {self.pos}")
        return self.text[start : self.pos]

    def _escaped_char(self) -> int:
        c = self.text[self.pos]
        self.pos += 1
        if c != "\\":
            return ord(c)
        e = self.text[self.pos]
        self.pos += 1
        table = {"n": 10, "t": 9, "r": 13, '"': 34, "\\": 92, "/": 47, "'": 39,
                 "]": 93, "[": 91, "^": 94, "-": 45}
        if e in table:
            return table[e]
        if e in ("x", "u", "U"):
            n = {"x": 2, "u": 4, "U": 8}[e]
            v = int(self.text[self.pos : self.pos + n], 16)
            self.pos += n
            return v
        raise GBNFError(f"bad escape \\{e}")

    # -- grammar parsing ---------------------------------------------------
    def parse(self) -> tuple[list[list[list[tuple]]], int]:
        self._ws(newlines=True)
        while self.pos < len(self.text):
            self._parse_rule()
            self._ws(newlines=True)
        if "root" not in self.rules:
            raise GBNFError("no root rule")
        for name, rid in self.rules.items():
            if self.bodies[rid] is None:
                raise GBNFError(f"undefined rule {name}")
        return self.bodies, self.rules["root"]

    def _parse_rule(self) -> None:
        name = self._name()
        self._ws()
        if self.text[self.pos : self.pos + 3] != "::=":
            raise GBNFError(f"expected ::= after {name}")
        self.pos += 3
        self._ws()
        rid = self.rule_id(name)
        alts = self._parse_alternates(name)
        if self.bodies[rid] is not None:
            raise GBNFError(f"duplicate rule {name}")
        self.bodies[rid] = alts
        # consume end-of-line ("" at EOF must not match: '"" in str' is True)
        self._ws()
        while self._peek() and self._peek() in "\r\n":
            self.pos += 1
            self._ws()

    def _parse_alternates(self, base: str, nested: bool = False) -> list[list[tuple]]:
        alts = [self._parse_sequence(base, nested)]
        self._ws(newlines=nested)
        while self._peek() == "|":
            self.pos += 1
            self._ws(newlines=True)
            alts.append(self._parse_sequence(base, nested))
            self._ws(newlines=nested)
        return alts

    def _aux_rule(self, base: str, alts: list[list[tuple]]) -> int:
        self.counter += 1
        rid = self.rule_id(f"{base}@{self.counter}")
        self.bodies[rid] = alts
        return rid

    def _parse_sequence(self, base: str, nested: bool) -> list[tuple]:
        seq: list[tuple] = []
        while True:
            self._ws(newlines=nested)
            c = self._peek()
            if c == '"':
                self.pos += 1
                while self._peek() != '"':
                    if not self._peek():
                        raise GBNFError("unterminated string")
                    cp = self._escaped_char()
                    seq.append(("char", ((cp, cp),)))
                self.pos += 1
            elif c == "[":
                self.pos += 1
                neg = self._peek() == "^"
                if neg:
                    self.pos += 1
                ranges = []
                while self._peek() != "]":
                    if not self._peek():
                        raise GBNFError("unterminated char class")
                    lo = self._escaped_char()
                    hi = lo
                    if self._peek() == "-" and self.text[self.pos + 1] != "]":
                        self.pos += 1
                        hi = self._escaped_char()
                    ranges.append((lo, hi))
                self.pos += 1
                seq.append(("nchar" if neg else "char", tuple(ranges)))
            elif c == "(":
                self.pos += 1
                alts = self._parse_alternates(base, nested=True)
                self._ws(newlines=True)
                if self._peek() != ")":
                    raise GBNFError("expected )")
                self.pos += 1
                seq.append(("ref", self._aux_rule(base, alts)))
            elif c.isalnum() or c in ("-", "_"):
                save = self.pos
                name = self._name()
                self._ws()
                if self.text[self.pos : self.pos + 3] == "::=":
                    self.pos = save  # start of the next rule definition
                    break
                seq.append(("ref", self.rule_id(name)))
            else:
                break

            # repetition operators bind to the last element
            self._ws()
            op = self._peek()
            if op in ("*", "+", "?", "{"):
                if not seq:
                    raise GBNFError("repetition without target")
                last = seq.pop()
                if op == "*":
                    self.pos += 1
                    rid = self._aux_rule(base, [])
                    self.bodies[rid] = [[last, ("ref", rid)], []]
                    seq.append(("ref", rid))
                elif op == "+":
                    self.pos += 1
                    rid = self._aux_rule(base, [])
                    self.bodies[rid] = [[last, ("ref", rid)], [last]]
                    seq.append(("ref", rid))
                elif op == "?":
                    self.pos += 1
                    rid = self._aux_rule(base, [[last], []])
                    seq.append(("ref", rid))
                else:  # {m} or {m,n} or {m,}
                    self.pos += 1
                    spec = ""
                    while self._peek() != "}":
                        spec += self.text[self.pos]
                        self.pos += 1
                    self.pos += 1
                    if "," in spec:
                        ms, ns = spec.split(",", 1)
                        m = int(ms) if ms.strip() else 0
                        n = int(ns) if ns.strip() else -1
                    else:
                        m = n = int(spec)
                    seq.extend([last] * m)
                    if n < 0:  # {m,} -> m copies + star
                        rid = self._aux_rule(base, [])
                        self.bodies[rid] = [[last, ("ref", rid)], []]
                        seq.append(("ref", rid))
                    else:
                        for _ in range(n - m):
                            rid = self._aux_rule(base, [[last], []])
                            seq.append(("ref", rid))
        return seq


def parse_gbnf(text: str):
    return _Parser(text).parse()


def _match(elem: tuple, cp: int) -> bool:
    kind, ranges = elem
    hit = any(lo <= cp <= hi for lo, hi in ranges)
    return hit if kind == "char" else not hit


_NO_PARTIAL = (0, 0, 0)


def _utf8_step(partial: tuple, b: int):
    """Feed one byte into a UTF-8 accumulator state (value, n_remain, min_cp).

    Returns (codepoint|None, new_partial); codepoint is set when the byte
    completes a character. Raises ValueError on malformed sequences
    (including overlong encodings: min_cp is the encoding-class minimum).
    This is the grammar-side mirror of llama.cpp's decode_utf8-with-partial-
    state (consumed via sparams.grammar,
    /root/reference/src/llama_server_context.cc:473): byte-fallback tokens
    deliver ONE raw byte of a multibyte character per token, so the matcher
    must carry decode state across token boundaries instead of mis-mapping
    each byte to U+00XX.
    """
    value, n_remain, min_cp = partial
    if n_remain == 0:
        if b < 0x80:
            return b, _NO_PARTIAL
        if 0xC2 <= b < 0xE0:  # C0/C1 would always be overlong
            return None, (b & 0x1F, 1, 0x80)
        if 0xE0 <= b < 0xF0:
            return None, (b & 0x0F, 2, 0x800)
        if 0xF0 <= b < 0xF5:  # F5.. would exceed U+10FFFF
            return None, (b & 0x07, 3, 0x10000)
        raise ValueError("invalid UTF-8 lead byte")
    if 0x80 <= b < 0xC0:
        value = (value << 6) | (b & 0x3F)
        n_remain -= 1
        if n_remain == 0:
            if value < min_cp or value > 0x10FFFF:
                raise ValueError("overlong or out-of-range UTF-8")
            return value, _NO_PARTIAL
        return None, (value, n_remain, min_cp)
    raise ValueError("invalid UTF-8 continuation byte")


def _match_partial(elem: tuple, partial: tuple) -> bool:
    """Could ANY codepoint completing `partial` match `elem`?

    A partial sequence (value, k continuation bytes remaining) can complete to
    any codepoint in [value << 6k, (value+1) << 6k), clamped to the valid
    range [min_cp, 0x10FFFF] so overlong prefixes can't fake ASCII matches.
    """
    kind, ranges = elem
    value, k, min_cp = partial
    lo_i = max(value << (6 * k), min_cp)
    hi_i = min(((value + 1) << (6 * k)) - 1, 0x10FFFF)
    if lo_i > hi_i:
        return False
    if kind == "char":
        return any(lo <= hi_i and hi >= lo_i for lo, hi in ranges)
    # negated class: possible unless the ranges fully cover the interval
    overlap = sorted(
        (max(lo, lo_i), min(hi, hi_i)) for lo, hi in ranges if lo <= hi_i and hi >= lo_i
    )
    cov = lo_i
    for lo, hi in overlap:
        if lo > cov:
            return True
        cov = max(cov, hi + 1)
    return cov <= hi_i


class _VocabTrie:
    """Trie over token piece BYTES; built once per (tokenizer). Byte edges —
    UTF-8 decoding happens during the walk so byte-fallback tokens that split
    a character across tokens are matched against true code points."""

    __slots__ = ("children", "tokens")

    def __init__(self):
        self.children: dict[int, _VocabTrie] = {}
        self.tokens: list[int] = []  # token ids whose piece ends here

    @classmethod
    def build(cls, tok) -> "_VocabTrie":
        root = cls()
        for tid in range(tok.n_tokens):
            piece = tok.piece_bytes(tid, special=False)
            if not piece:
                continue
            node = root
            for b in piece:
                nxt = node.children.get(b)
                if nxt is None:
                    nxt = cls()
                    node.children[b] = nxt
                node = nxt
            node.tokens.append(tid)
        return root


# Tokenizer -> vocab trie, keyed by the tokenizer OBJECT via a weak
# reference: entries die with their tokenizer (load/unload cycles don't
# leak vocab-sized tries) and a recycled id() can never alias a different
# tokenizer's trie.
import weakref

_TRIE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


class GrammarMatcher:
    def __init__(self, bodies, root_id: int, tok):
        self.bodies = bodies
        self.root_id = root_id
        self.tok = tok
        try:
            trie = _TRIE_CACHE.get(tok)
        except TypeError:
            trie = None  # unhashable tokenizer stand-in: no caching
        if trie is None:
            trie = _VocabTrie.build(tok)
            try:
                _TRIE_CACHE[tok] = trie
            except TypeError:
                pass
        self.trie = trie
        self.reset()

    def reset(self) -> None:
        self.stacks = self._expand((("ref", self.root_id),))
        self.partial = _NO_PARTIAL  # carried UTF-8 accumulator

    # stacks: frozenset of tuples of elements; TOP OF STACK IS THE LAST entry
    def _expand(self, stack: tuple) -> set:
        """Expand refs until the top of each stack is a char element."""
        out: set = set()
        work = [tuple(stack)]
        seen = set()
        while work:
            st = work.pop()
            if st in seen:
                continue
            seen.add(st)
            if not st:
                out.add(st)
                continue
            top = st[-1]
            if top[0] in ("char", "nchar"):
                out.add(st)
                continue
            # ref: substitute each alternate (reversed so seq[0] is on top)
            rest = st[:-1]
            for alt in self.bodies[top[1]]:
                work.append(rest + tuple(reversed(alt)))
        return out

    def _advance(self, stacks: set, cp: int) -> set:
        out: set = set()
        for st in stacks:
            if not st:
                continue
            if _match(st[-1], cp):
                out |= self._expand(st[:-1])
        return out

    def _can_partial(self, stacks: set, partial: tuple) -> bool:
        return any(st and _match_partial(st[-1], partial) for st in stacks)

    # -- public API ----------------------------------------------------------
    def accept(self, token_id: int) -> None:
        piece = self.tok.piece_bytes(int(token_id), special=False)
        for b in piece:
            try:
                cp, npart = _utf8_step(self.partial, b)
            except ValueError:
                return  # malformed byte (e.g. forced token); freeze
            if cp is None:
                if not self._can_partial(self.stacks, npart):
                    return  # no completion can be grammar-legal; freeze
                self.partial = npart
            else:
                nxt = self._advance(self.stacks, cp)
                if not nxt:
                    return  # token was not grammar-legal (e.g. forced); freeze
                self.stacks = nxt
                self.partial = _NO_PARTIAL

    def done(self) -> bool:
        """True when only the completed parse remains."""
        return (
            self.partial[1] == 0
            and all(not st for st in self.stacks)
            and bool(self.stacks)
        )

    def can_stop(self) -> bool:
        return self.partial[1] == 0 and any(not st for st in self.stacks)

    def allowed_mask(self) -> np.ndarray:
        """Boolean mask [n_vocab] of tokens whose piece extends some parse."""
        mask = np.zeros(self.tok.n_tokens, dtype=bool)
        # walk the byte trie in lockstep with the automaton + UTF-8 state
        work = [(self.trie, self.stacks, self.partial)]
        while work:
            node, stacks, partial = work.pop()
            if node.tokens:
                for t in node.tokens:
                    mask[t] = True
            for b, child in node.children.items():
                try:
                    cp, npart = _utf8_step(partial, b)
                except ValueError:
                    continue
                if cp is None:
                    # mid-character: descend iff some completion could match
                    if self._can_partial(stacks, npart):
                        work.append((child, stacks, npart))
                else:
                    nxt = self._advance(stacks, cp)
                    if nxt:
                        work.append((child, nxt, _NO_PARTIAL))
        if self.can_stop():
            for t in (self.tok.eos_id, self.tok.eot_id, self.tok.eom_id):
                if t is not None and t >= 0:
                    mask[t] = True
            for t in getattr(self.tok, "_eog_extra", ()):
                mask[t] = True
        return mask


def build_matcher(grammar_text: str, tok) -> GrammarMatcher:
    bodies, root_id = parse_gbnf(grammar_text)
    return GrammarMatcher(bodies, root_id, tok)
