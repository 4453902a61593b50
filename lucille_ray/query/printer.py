"""Query AST -> query-string printer, mirroring the reference
(QueryPrinter.scala:23-158).

Preserved reference quirks:

* ``TermRange`` printing inverts the bracket/inclusivity mapping relative to the
  parser: the parser maps ``[`` -> ``lower_inc=True`` (QueryParser.scala:279) while the
  printer emits ``{`` when ``lower_inc`` is True (QueryPrinter.scala:116). The two
  sides are tested independently upstream and never round-tripped; we match each
  side's own corpus.
* ``TermRegex`` bodies are printed verbatim with no added slashes
  (QueryPrinter.scala:114).
* Boost weights format with ``%.{precision}f`` (QueryPrinter.scala:81).
"""

from __future__ import annotations

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
    Term,
    TermQuery,
    TermRange,
    TermRegex,
    UnaryMinus,
    UnaryPlus,
    WildCard,
)
from .parser import LUCENE_SPECIAL, PHRASE_ESCAPED


def print_query(query: Query, precision: int = 2) -> str:
    """Build the string representation of a query (QueryPrinter.scala:37-157)."""
    out: list = []

    def escape_term(s: str) -> None:
        for c in s:
            if c in LUCENE_SPECIAL:
                out.append("\\")
            out.append(c)

    def escape_phrase(s: str) -> None:
        for c in s:
            if c in PHRASE_ESCAPED:
                out.append("\\")
            out.append(c)

    def term_query(q: TermQuery) -> None:
        if isinstance(q, Term):
            escape_term(q.value)
        elif isinstance(q, Phrase):
            out.append('"')
            escape_phrase(q.value)
            out.append('"')
        elif isinstance(q, Prefix):
            out.append(q.value)
            out.append("*")
        elif isinstance(q, Proximity):
            out.append('"')
            out.append(q.value)
            out.append('"~')
            out.append(str(q.num))
        elif isinstance(q, Fuzzy):
            out.append(q.value)
            out.append("~")
            if q.num is not None:
                out.append(str(q.num))
        elif isinstance(q, TermRegex):
            out.append(q.value)
        elif isinstance(q, TermRange):
            # NOTE: intentional bracket inversion — see module docstring
            out.append("{" if q.lower_inc else "[")
            out.append(q.lower if q.lower is not None else "*")
            out.append(" TO ")
            out.append(q.upper if q.upper is not None else "*")
            out.append("}" if q.upper_inc else "]")
        elif isinstance(q, WildCard):
            for op in q.ops:
                if op is SingleChar or op == SingleChar:
                    out.append("?")
                elif op is ManyChar or op == ManyChar:
                    out.append("*")
                else:
                    out.append(op.value)
        else:  # pragma: no cover
            raise TypeError(f"unknown TermQuery: {q!r}")

    def each(qs, sep: str) -> None:
        go(qs[0])
        for q in qs[1:]:
            out.append(sep)
            go(q)

    def boost_query(q: Boost) -> None:
        weight = f"%.{precision}f" % q.weight
        if isinstance(q.q, Group):
            go(q.q)
        elif isinstance(q.q, (Phrase, Term)):
            term_query(q.q)
        else:
            out.append("(")
            go(q.q)
            out.append(")")
        out.append("^")
        out.append(weight)

    def go(q: Query) -> None:
        if isinstance(q, TermQuery):
            term_query(q)
        elif isinstance(q, Or):
            each(q.qs, " OR ")
        elif isinstance(q, And):
            each(q.qs, " AND ")
        elif isinstance(q, Not):
            out.append("NOT ")
            inner = q.q
            if isinstance(inner, TermQuery):
                term_query(inner)
            elif isinstance(inner, (Group, MinimumMatch)):
                go(inner)
            else:
                out.append("(")
                go(inner)
                out.append(")")
        elif isinstance(q, Group):
            out.append("(")
            go(q.q)
            out.append(")")
        elif isinstance(q, UnaryPlus):
            out.append("+")
            go(q.q)
        elif isinstance(q, UnaryMinus):
            out.append("-")
            go(q.q)
        elif isinstance(q, MinimumMatch):
            out.append("(")
            each(q.qs, " ")
            out.append(f")@{q.num}")
        elif isinstance(q, Boost):
            boost_query(q)
        elif isinstance(q, Field):
            out.append(q.field)
            out.append(":")
            inner = q.q
            if isinstance(inner, TermQuery):
                term_query(inner)
            elif isinstance(inner, (Group, MinimumMatch)):
                go(inner)
            else:
                out.append("(")
                go(inner)
                out.append(")")
        else:  # pragma: no cover
            raise TypeError(f"unknown Query: {q!r}")

    go(query)
    return "".join(out)
