"""Lucene StandardQueryParser-syntax grammar — a from-scratch Python transcription of
the reference grammar (QueryParser.scala:28-326), conformance-tested against the full
ported munit corpus (see tests/test_parser_*.py).

The combinator runtime (``combinators.py``) reproduces cats-parse commit semantics;
this module mirrors the grammar productions one-for-one:

* alternative order in ``recursive_q`` is load-bearing (QueryParser.scala:131-153)
* ``term`` may not *start with* a reserved token ``OR || AND && NOT + - /``
  (QueryParser.scala:213,218-219) — so e.g. ``ORbit`` is a parse error, as upstream
* straight and smart double quotes delimit phrases (QueryParser.scala:187,205)
* boost floats take ``digits[.digits]`` only — no sign/suffix (QueryParser.scala:198-202)
* ``[`` maps to ``lower_inc=True`` (QueryParser.scala:279); the printer intentionally
  disagrees (see printer.py)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from . import combinators as C
from .assoc import Op, associate_ops
from .nodes import (
    And,
    Boost,
    Field,
    Fuzzy,
    Group,
    ManyChar,
    MinimumMatch,
    Not,
    Or,
    Phrase,
    Prefix,
    Proximity,
    Query,
    SingleChar,
    Str,
    Term,
    TermRange,
    TermRegex,
    UnaryMinus,
    UnaryPlus,
    WildCard,
    f32,
)


class ParseError(ValueError):
    """Raised when a query string does not parse; carries the failure offset."""

    def __init__(self, message: str, offset: int):
        super().__init__(message)
        self.offset = offset


# ---- character classes (QueryParser.scala:184-215) ----

QUOTES = frozenset('"“”')  # straight, left smart, right smart
LUCENE_SPECIAL = frozenset('+-!(){}[]^"~*?:\\/')
SPECIAL = LUCENE_SPECIAL | QUOTES | {" "}
PHRASE_ESCAPED = QUOTES | {"\\"}
RESERVED = ("OR", "||", "AND", "&&", "NOT", "+", "-", "/")

_wsp = C.char_in(" \t")  # RFC5234 WSP
_sp = C.char(" ")
spaces = C.rep(_wsp, 1)
maybe_space = C.opt(spaces)

_digit = C.char_where(lambda c: "0" <= c <= "9", "digit")
_alpha = C.char_where(lambda c: ("a" <= c <= "z") or ("A" <= c <= "Z"), "alpha")


def _captured(parser: C.Parser) -> C.Parser:
    """Return the raw consumed input slice (cats-parse ``.string``)."""

    def p(s: str, pos: int):
        cur, _ = parser(s, pos)
        return cur, s[pos:cur]

    return p


# int: digits not followed by '.' (QueryParser.scala:190)
int_p = C.fmap(
    _captured(C.seq(C.rep(_digit, 1), C.not_(C.char(".")))),
    int,
)

# float: digits optionally '.' digits; no sign, no suffix (QueryParser.scala:198-202)
float_p = C.fmap(
    _captured(C.seq(C.rep(_digit, 1), C.opt(C.seq(C.char("."), C.rep(_digit, 1))))),
    lambda sl: f32(float(sl)),
)

# queryEnd: lookahead for whitespace / end / ')' (QueryParser.scala:215)
query_end = C.peek(C.one_of([C.fmap(_wsp, lambda _: None), C.end, C.fmap(C.char(")"), lambda _: None)]))


def _in_base_range(c: str) -> bool:
    return 0x20 <= ord(c) <= 0x10FFFF


_allowed = C.char_where(lambda c: _in_base_range(c) and c not in SPECIAL, "term char")
_escaped = C.keep_right(C.char("\\"), C.char_in(SPECIAL))

# term: must not start with a reserved token (QueryParser.scala:213,218-219)
term = C.keep_right(
    C.not_(C.string_in(RESERVED)),
    C.rep_string(C.one_of([_allowed, _escaped]), 1),
)

_phrase_char = C.char_where(
    lambda c: _in_base_range(c) and c not in PHRASE_ESCAPED, "phrase char"
)
_phrase_escaped = C.keep_right(C.char("\\"), C.char_in(PHRASE_ESCAPED))
_phrase_body = C.rep_string(C.one_of([_phrase_char, _phrase_escaped]), 1)
phrase = C.fmap(
    C.seq(C.char_in(QUOTES), _phrase_body, C.char_in(QUOTES)), lambda t: t[1]
)

phrase_q = C.fmap(phrase, Phrase)

# proximity: "<phrase>"~int — int only, decimals rejected (QueryParser.scala:232-239)
proximity_q = C.fmap(
    C.seq(C.fmap(C.soft_seq(phrase, C.char("~")), lambda t: t[0]), int_p),
    lambda t: Proximity(t[0], t[1]),
)

# fuzzy: term~ / term~int (QueryParser.scala:241-248)
fuzzy_t = C.fmap(
    C.seq(C.fmap(C.soft_seq(term, C.char("~")), lambda t: t[0]), C.opt(int_p)),
    lambda t: Fuzzy(t[0], t[1]),
)


def _to_term_or_wildcard(ops: List[object]) -> Query:
    # [Str] -> Term; [Str, ManyChar] -> Prefix; else WildCard (QueryParser.scala:257-261)
    if len(ops) == 1 and isinstance(ops[0], Str):
        return Term(ops[0].value)
    if len(ops) == 2 and isinstance(ops[0], Str) and ops[1] is ManyChar:
        return Prefix(ops[0].value)
    return WildCard(tuple(ops))


term_and_wildcard_q = C.fmap(
    C.rep(
        C.one_of(
            [
                C.fmap(C.char("?"), lambda _: SingleChar),
                C.fmap(C.char("*"), lambda _: ManyChar),
                C.fmap(term, Str),
            ]
        ),
        1,
    ),
    _to_term_or_wildcard,
)

# regex: body is the raw slice between '/' delimiters, '\/' the only escape
# (QueryParser.scala:264-273) — the backslash stays in the captured string
_regex_char = C.fmap(
    C.char_where(lambda c: _in_base_range(c) and c not in "\\/", "regex char"),
    lambda _: None,
)
_regex_escape = C.seq(C.char("\\"), C.char("/"))
_regex_body = _captured(C.rep(C.one_of([_regex_char, _regex_escape]), 1))
regex_q = C.fmap(
    C.fmap(C.seq(C.char("/"), _regex_body, C.char("/")), lambda t: t[1]), TermRegex
)

# range: [a TO b} etc.; bounds are alpha/digit/'.' runs or '*' (QueryParser.scala:278-289)
_incl_lower = C.keep_left(
    C.fmap(C.char_in("{["), lambda c: c == "["), maybe_space
)
_incl_upper = C.keep_right(
    maybe_space, C.fmap(C.char_in("}]"), lambda c: c == "]")
)
_bound_txt = C.keep_right(
    C.not_(C.string_in(RESERVED)),
    _captured(C.rep(C.one_of([_alpha, _digit, C.char(".")]), 1)),
)
_bound_value = C.one_of([C.fmap(C.char("*"), lambda _: None), _bound_txt])
_to_kw = C.fmap(C.seq(spaces, C.string("TO"), spaces), lambda _: None)
range_query = C.fmap(
    C.seq(_incl_lower, _bound_value, _to_kw, _bound_value, _incl_upper),
    lambda t: TermRange(t[1], t[3], t[0], t[4]),
)

_or_op = C.fmap(C.one_of([C.string("OR"), C.string("||")]), lambda _: Op.OR)
_and_op = C.fmap(C.one_of([C.string("AND"), C.string("&&")]), lambda _: Op.AND)
infix_op = C.one_of([_or_op, _and_op])


def _build_parser(default_boolean_or: bool) -> C.Parser:
    """Assemble the recursive grammar (QueryParser.scala:28-156)."""

    ref: dict = {}

    def query(s: str, pos: int):
        return ref["q"](s, pos)

    # NOT q (QueryParser.scala:37-38)
    not_q = C.fmap(
        C.keep_right(C.seq(C.string("NOT"), maybe_space), query), Not
    )
    # +q / -q (QueryParser.scala:43-50)
    unary_plus = C.fmap(C.keep_right(C.char("+"), query), UnaryPlus)
    unary_minus = C.fmap(C.keep_right(C.char("-"), query), UnaryMinus)

    # name:q — field name uses the term grammar (QueryParser.scala:55-57)
    field_value_soft = C.fmap(C.soft_seq(term, C.char(":")), lambda t: t[0])
    field_query = C.fmap(
        C.seq(field_value_soft, query), lambda t: Field(t[0], t[1])
    )

    # (...) group; P.not('@') lets MinimumMatch win (QueryParser.scala:113-118)
    # late-bound: _wrapped_queries is defined below in this scope
    def _wrapped_ref(s: str, pos: int):
        return _wrapped_queries(s, pos)

    group_q = C.fmap(
        C.seq(C.char("("), _wrapped_ref, C.char(")"), C.not_(C.char("@"))),
        lambda t: Group(t[1]),
    )

    # q^float — boostable base limited per QueryParser.scala:62-67; boost must be
    # followed by queryEnd so '^3.1f' is rejected
    limited_q = C.one_of([field_query, term_and_wildcard_q, phrase_q, group_q])
    boost_q = C.fmap(
        C.soft_seq(
            limited_q,
            C.fmap(C.seq(C.char("^"), float_p, query_end), lambda t: t[1]),
        ),
        lambda t: Boost(t[0], t[1]),
    )

    # ( ... )@int (QueryParser.scala:72-76)
    def _nel_ref(s: str, pos: int):
        return _nel_queries(s, pos)

    nel_in_parens = C.fmap(
        C.seq(C.char("("), _nel_ref, C.char(")")), lambda t: t[1]
    )

    minimum_match_q = C.fmap(
        C.soft_seq(
            nel_in_parens,
            C.fmap(C.seq(C.char("@"), int_p, query_end), lambda t: t[1]),
        ),
        lambda t: MinimumMatch(tuple(t[0]), t[1]),
    )

    # ordered alternatives (QueryParser.scala:135-153) — order is load-bearing
    ref["q"] = C.one_of(
        [
            unary_plus,
            unary_minus,
            not_q,
            field_query,
            proximity_q,
            range_query,
            fuzzy_t,
            minimum_match_q,
            boost_q,
            term_and_wildcard_q,
            regex_q,
            phrase_q,
            group_q,
        ]
    )

    # OP q OP q ... until end-of-input or a fresh implicit query
    # (QueryParser.scala:106-108)
    _pair = C.fmap(
        C.seq(maybe_space, infix_op, C.rep(_sp, 1), query),
        lambda t: (t[1], t[3]),
    )
    _suffix_terminator = C.seq(maybe_space, C.one_of([C.end, query]))
    suffix_ops = C.rep_until0(_pair, _suffix_terminator)

    # leading implicit-op run + explicit op chain, repeated (QueryParser.scala:82-100)
    _q_and_space = C.fmap(C.seq(query, maybe_space), lambda t: t[0])
    qs_and_last = C.rep(_q_and_space, 1)

    def _combined(s: str, pos: int):
        cur, _ = maybe_space(s, pos)
        cur, qs = qs_and_last(s, cur)
        cur, op_qs = suffix_ops(s, cur)
        init, last = qs[:-1], qs[-1]
        if op_qs:
            chain = list(init) + [associate_ops(last, op_qs)]
        else:
            chain = list(qs)
        return cur, chain

    _chain_terminator = C.seq(maybe_space, C.end)

    def _nel_queries(s: str, pos: int):
        cur, chains = C.rep_until(_combined, _chain_terminator)(s, pos)
        flat: List[Query] = []
        for chain in chains:
            flat.extend(chain)
        return cur, flat

    def _wrapped_queries(s: str, pos: int):
        cur, qs = _nel_queries(s, pos)
        if len(qs) == 1:
            return cur, qs[0]
        wrapped = Or(tuple(qs)) if default_boolean_or else And(tuple(qs))
        return cur, wrapped

    return C.keep_left(_wrapped_queries, maybe_space)


_FULL_QUERY_OR = _build_parser(default_boolean_or=True)
_FULL_QUERY_AND = _build_parser(default_boolean_or=False)


class QueryParser:
    """Parser facade mirroring the reference object (QueryParser.scala:170-182)."""

    def __init__(self, default_boolean_or: bool = True):
        self.default_boolean_or = default_boolean_or
        self._full = _FULL_QUERY_OR if default_boolean_or else _FULL_QUERY_AND

    def parse(self, s: str) -> Query:
        try:
            return C.parse_all(self._full, s)
        except C.Failure as f:
            raise ParseError(
                f"Parse error at offset {f.offset}, with expectations:\n {f.expected}",
                f.offset,
            ) from None

    def parse_either(self, s: str) -> Tuple[Optional[Query], Optional[str]]:
        """Either-style API: ``(query, None)`` on success, ``(None, msg)`` on failure."""
        try:
            return self.parse(s), None
        except ParseError as e:
            return None, str(e)


default_parser = QueryParser(default_boolean_or=True)
and_parser = QueryParser(default_boolean_or=False)

with_default_operator_or = default_parser
with_default_operator_and = and_parser


def parse(s: str) -> Query:
    """Parse with the default-OR parser; raises :class:`ParseError` on failure."""
    return default_parser.parse(s)
