"""A minimal parsing-combinator runtime reproducing the *commit semantics* of the
cats-parse library used by the reference grammar (QueryParser.scala:19-24).

Why not a plain backtracking PEG: cats-parse distinguishes *epsilon* failures (no
input consumed — alternation may try the next branch) from *committed* failures
(input consumed — the whole parse aborts). The reference grammar leans on this:
``derp~3.2`` must be a parse *error* (ParserSuite.scala:211-214), not fall back to
``Fuzzy("derp") OR Term("3.2")``. This runtime models exactly that:

* a parser is a callable ``(s, pos) -> (new_pos, value)`` raising :class:`Failure`;
* alternation (:func:`one_of`) tries the next branch only when the failure offset
  equals the branch's start position;
* :func:`soft` products reset a right-hand epsilon failure back to the start
  (cats-parse ``.soft``), re-enabling outer alternation;
* repetition stops on epsilon failure and propagates committed failure.

Everything here is generic machinery; the grammar itself lives in ``parser.py``.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Sequence, Tuple

Parser = Callable[[str, int], Tuple[int, object]]


class Failure(Exception):
    """Parse failure at ``offset``; committedness is judged by callers comparing
    ``offset`` to their own start position (cats-parse style)."""

    __slots__ = ("offset", "expected")

    def __init__(self, offset: int, expected: str = ""):
        self.offset = offset
        self.expected = expected

    def __str__(self):
        return f"failure at {self.offset}: expected {self.expected}"


# ---- primitives (all atomic: fail epsilon at their start) ----


def char(c: str) -> Parser:
    def p(s: str, pos: int):
        if pos < len(s) and s[pos] == c:
            return pos + 1, c
        raise Failure(pos, repr(c))

    return p


def char_in(chars) -> Parser:
    cs = frozenset(chars)

    def p(s: str, pos: int):
        if pos < len(s) and s[pos] in cs:
            return pos + 1, s[pos]
        raise Failure(pos, f"char in {sorted(cs)[:8]}")

    return p


def char_where(pred: Callable[[str], bool], label: str = "char") -> Parser:
    def p(s: str, pos: int):
        if pos < len(s) and pred(s[pos]):
            return pos + 1, s[pos]
        raise Failure(pos, label)

    return p


def string(lit: str) -> Parser:
    def p(s: str, pos: int):
        if s.startswith(lit, pos):
            return pos + len(lit), lit
        raise Failure(pos, repr(lit))

    return p


def string_in(lits: Iterable[str]) -> Parser:
    """Longest match among a set of literals (cats-parse ``P.stringIn``)."""
    by_len = sorted(set(lits), key=len, reverse=True)

    def p(s: str, pos: int):
        for lit in by_len:
            if s.startswith(lit, pos):
                return pos + len(lit), lit
        raise Failure(pos, f"one of {by_len}")

    return p


def end(s: str, pos: int):
    if pos == len(s):
        return pos, None
    raise Failure(pos, "end of input")


def pure(value) -> Parser:
    return lambda s, pos: (pos, value)


# ---- combinators ----


def one_of(parsers: Sequence[Parser]) -> Parser:
    """Ordered choice; a branch that fails *after consuming* aborts the whole choice
    (cats-parse ``P.oneOf`` semantics)."""

    def p(s: str, pos: int):
        deepest: Optional[Failure] = None
        for alt in parsers:
            try:
                return alt(s, pos)
            except Failure as f:
                if f.offset != pos:
                    raise
                if deepest is None:
                    deepest = f
        raise deepest if deepest is not None else Failure(pos, "one_of")

    return p


def seq(*parsers: Parser) -> Parser:
    """Product: all parsers in order, returning the tuple of values. A later parser's
    failure is reported at its own offset (committed if input was consumed)."""

    def p(s: str, pos: int):
        vals = []
        cur = pos
        for q in parsers:
            cur, v = q(s, cur)
            vals.append(v)
        return cur, tuple(vals)

    return p


def soft_seq(a: Parser, b: Parser) -> Parser:
    """cats-parse ``a.soft ~ b``: if ``b`` fails *without consuming*, reset the whole
    product to an epsilon failure at the start (QueryParser.scala uses this for
    fieldValueSoft / boostQ / minimumMatchQ / fuzzy / proximity)."""

    def p(s: str, pos: int):
        mid, va = a(s, pos)
        try:
            endp, vb = b(s, mid)
        except Failure as f:
            if f.offset == mid:
                raise Failure(pos, f.expected)
            raise
        return endp, (va, vb)

    return p


def fmap(parser: Parser, f: Callable) -> Parser:
    def p(s: str, pos: int):
        cur, v = parser(s, pos)
        return cur, f(v)

    return p


def keep_right(a: Parser, b: Parser) -> Parser:
    return fmap(seq(a, b), lambda t: t[1])


def keep_left(a: Parser, b: Parser) -> Parser:
    return fmap(seq(a, b), lambda t: t[0])


def opt(parser: Parser) -> Parser:
    """``p.?``: None on epsilon failure; committed failure propagates."""

    def p(s: str, pos: int):
        try:
            return parser(s, pos)
        except Failure as f:
            if f.offset == pos:
                return pos, None
            raise

    return p


def rep(parser: Parser, min_count: int = 1) -> Parser:
    """``p.rep`` / ``p.rep0``: repeat until epsilon failure; committed failure
    propagates; zero-width successes terminate (the grammar never produces them)."""

    def p(s: str, pos: int):
        out: List[object] = []
        cur = pos
        while True:
            try:
                nxt, v = parser(s, cur)
            except Failure as f:
                if f.offset != cur:
                    raise
                break
            if nxt == cur:
                break
            out.append(v)
            cur = nxt
        if len(out) < min_count:
            raise Failure(pos, f"at least {min_count} repetitions")
        return cur, out

    return p


def rep_string(parser: Parser, min_count: int = 1) -> Parser:
    """Like :func:`rep` but joins character results into a string (``repAs[String]``)."""
    r = rep(parser, min_count)
    return fmap(r, lambda chars: "".join(chars))


def not_(parser: Parser) -> Parser:
    """``P.not(p)``: succeed (epsilon) iff p fails; never consumes."""

    def p(s: str, pos: int):
        try:
            parser(s, pos)
        except Failure:
            return pos, None
        raise Failure(pos, "not")

    return p


def peek(parser: Parser) -> Parser:
    """``p.peek``: run p, consume nothing on success; failure reported as-is."""

    def p(s: str, pos: int):
        parser(s, pos)
        return pos, None

    return p


def rep_until0(parser: Parser, terminator: Parser) -> Parser:
    """cats-parse ``p.repUntil0(end)`` == ``(P.not(end).with1.soft *> p).rep0``:
    repeat p while the terminator does not yet succeed; epsilon failure of p stops,
    committed failure propagates."""

    def p(s: str, pos: int):
        out: List[object] = []
        cur = pos
        while True:
            try:
                terminator(s, cur)
                break  # terminator succeeds -> stop
            except Failure:
                pass
            try:
                nxt, v = parser(s, cur)
            except Failure as f:
                if f.offset != cur:
                    raise
                break
            if nxt == cur:
                break
            out.append(v)
            cur = nxt
        return cur, out

    return p


def rep_until(parser: Parser, terminator: Parser) -> Parser:
    """``p.repUntilAs(end)`` with min=1: like :func:`rep_until0` but the first
    iteration's failure propagates when nothing matched."""
    r0 = rep_until0(parser, terminator)

    def p(s: str, pos: int):
        cur, out = r0(s, pos)
        if not out:
            # Re-run to surface the real failure offset
            parser(s, pos)  # raises
            raise Failure(pos, "at least one repetition")
        return cur, out

    return p


def parse_all(parser: Parser, s: str):
    """``parseAll``: must consume the entire input (QueryParser.scala:156-167)."""
    pos, value = parser(s, 0)
    if pos != len(s):
        raise Failure(pos, "end of input")
    return value
