"""Query AST: a from-scratch Python realization of the 17-node query algebra of the
reference library (see /root/reference/core/src/main/scala/pink/cozydev/lucille/Query.scala:23-312).

Design notes
------------
* Immutable value objects with structural equality — the AST is tiny driver-side
  metadata that gets pickled/broadcast into Ray tasks; it is never stored in a Dataset.
* ``Or`` / ``And`` enforce >= 2 children like the reference's private constructors
  (Query.scala:151-158, 184-191).
* ``map_last_term`` mirrors Query#mapLastTerm (Query.scala:30, 303-311): rewrite the
  structurally *last* positional Term (search-as-you-type expansion); no-op on
  Group/Boost/MinimumMatch and non-Term leaves.
* ``traverse_q`` mirrors Query#traverseQ (Query.scala:40): apply a function to the
  TermQuery *leaves* only, rebuilding branch structure; short-circuit is modelled with
  ordinary Python exceptions raised by the callback.
* ``Boost`` weights round-trip through IEEE-754 float32 to match the reference's
  Scala ``Float`` semantics (QueryParser.scala:192-202).
"""

from __future__ import annotations

import struct
from typing import Callable, Iterable, Optional


def f32(x: float) -> float:
    """Round a Python float through IEEE-754 binary32, like Scala's Float."""
    return struct.unpack("<f", struct.pack("<f", float(x)))[0]


class Query:
    """Base class for all query nodes (Query.scala:23-49)."""

    __slots__ = ()

    def _key(self) -> tuple:
        return tuple(getattr(self, s) for s in self.__slots__)

    def __reduce__(self):
        # slot order matches constructor args for every node; keeps pickling
        # compatible with the immutability guard (ASTs are broadcast to Ray tasks)
        return (type(self), self._key())

    def __eq__(self, other) -> bool:
        return type(self) is type(other) and self._key() == other._key()

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)

    def __hash__(self) -> int:
        return hash((type(self).__name__,) + self._key())

    def __repr__(self) -> str:
        args = ", ".join(repr(v) for v in self._key())
        return f"{type(self).__name__}({args})"

    # ---- fluent builders (Query.scala:42-48) ----
    def and_(self, q: "Query") -> "And":
        return And(self, q)

    def or_(self, q: "Query") -> "Or":
        return Or(self, q)

    def not_(self) -> "Not":
        return Not(self)

    def boost(self, b: float) -> "Boost":
        return Boost(self, b)

    # ---- rewrites ----
    def map_last_term(self, f: Callable[["Term"], "Query"]) -> "Query":
        return self

    def traverse_q(self, f: Callable[["TermQuery"], "Query"]) -> "Query":
        return self


class TermQuery(Query):
    """Leaf queries: contain no child queries (Query.scala:52-59)."""

    __slots__ = ()

    def traverse_q(self, f: Callable[["TermQuery"], "Query"]) -> "Query":
        return f(self)


class Term(TermQuery):
    """A single term, e.g. ``cat`` (Query.scala:68-71)."""

    __slots__ = ("value",)

    def __init__(self, value: str):
        object.__setattr__(self, "value", value)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def map_last_term(self, f: Callable[["Term"], Query]) -> Query:
        return f(self)


class _Leaf(TermQuery):
    __slots__ = ()

    def __setattr__(self, *_):
        raise AttributeError("immutable")


class Phrase(_Leaf):
    """A quoted phrase, e.g. ``"the cat jumped"`` (Query.scala:78)."""

    __slots__ = ("value",)

    def __init__(self, value: str):
        object.__setattr__(self, "value", value)


class Prefix(_Leaf):
    """A prefix query, e.g. ``jump*`` (Query.scala:86)."""

    __slots__ = ("value",)

    def __init__(self, value: str):
        object.__setattr__(self, "value", value)


class Proximity(_Leaf):
    """A sloppy phrase, e.g. ``"cat jumped"~3`` (Query.scala:95)."""

    __slots__ = ("value", "num")

    def __init__(self, value: str, num: int):
        object.__setattr__(self, "value", value)
        object.__setattr__(self, "num", int(num))


class Fuzzy(_Leaf):
    """An edit-distance query, e.g. ``cat~``, ``cat~1`` (Query.scala:103)."""

    __slots__ = ("value", "num")

    def __init__(self, value: str, num: Optional[int] = None):
        object.__setattr__(self, "value", value)
        object.__setattr__(self, "num", None if num is None else int(num))


class TermRegex(_Leaf):
    """A regex query, e.g. ``/.ump(s|ing)/`` (Query.scala:111)."""

    __slots__ = ("value",)

    def __init__(self, value: str):
        object.__setattr__(self, "value", value)


class TermRange(_Leaf):
    """A lexicographic term range, e.g. ``[cats TO dogs}`` (Query.scala:122-127).

    ``None`` bounds are open (``*``).
    """

    __slots__ = ("lower", "upper", "lower_inc", "upper_inc")

    def __init__(
        self,
        lower: Optional[str],
        upper: Optional[str],
        lower_inc: bool,
        upper_inc: bool,
    ):
        object.__setattr__(self, "lower", lower)
        object.__setattr__(self, "upper", upper)
        object.__setattr__(self, "lower_inc", bool(lower_inc))
        object.__setattr__(self, "upper_inc", bool(upper_inc))


def _as_query_tuple(qs: tuple) -> tuple:
    if len(qs) == 1 and isinstance(qs[0], (list, tuple)):
        qs = tuple(qs[0])
    return tuple(qs)


class Or(Query):
    """N-ary disjunction; >= 2 children enforced (Query.scala:135-159)."""

    __slots__ = ("qs",)

    def __init__(self, *qs: Query):
        qs = _as_query_tuple(qs)
        if len(qs) < 2:
            raise ValueError("Cannot create Or query from fewer than two queries")
        object.__setattr__(self, "qs", qs)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def map_last_term(self, f: Callable[[Term], Query]) -> "Or":
        return Or(_rewrite_last(self.qs, f))

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return Or(tuple(q.traverse_q(f) for q in self.qs))


class And(Query):
    """N-ary conjunction; >= 2 children enforced (Query.scala:167-192)."""

    __slots__ = ("qs",)

    def __init__(self, *qs: Query):
        qs = _as_query_tuple(qs)
        if len(qs) < 2:
            raise ValueError("Cannot create And query from fewer than two queries")
        object.__setattr__(self, "qs", qs)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def map_last_term(self, f: Callable[[Term], Query]) -> "And":
        return And(_rewrite_last(self.qs, f))

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return And(tuple(q.traverse_q(f) for q in self.qs))


class Not(Query):
    """Exclusion, e.g. ``NOT cats`` (Query.scala:200-206)."""

    __slots__ = ("q",)

    def __init__(self, q: Query):
        object.__setattr__(self, "q", q)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def map_last_term(self, f: Callable[[Term], Query]) -> "Not":
        return Not(self.q.map_last_term(f))

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return Not(self.q.traverse_q(f))


class Group(Query):
    """Parenthesized sub-query (Query.scala:214-219); map_last_term is a no-op."""

    __slots__ = ("q",)

    def __init__(self, q: Query):
        object.__setattr__(self, "q", q)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return Group(self.q.traverse_q(f))


class UnaryPlus(Query):
    """MUST clause, e.g. ``+cat`` (Query.scala:227-233)."""

    __slots__ = ("q",)

    def __init__(self, q: Query):
        object.__setattr__(self, "q", q)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def map_last_term(self, f: Callable[[Term], Query]) -> "UnaryPlus":
        return UnaryPlus(self.q.map_last_term(f))

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return UnaryPlus(self.q.traverse_q(f))


class UnaryMinus(Query):
    """MUST_NOT clause, e.g. ``-cat`` (Query.scala:241-247)."""

    __slots__ = ("q",)

    def __init__(self, q: Query):
        object.__setattr__(self, "q", q)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def map_last_term(self, f: Callable[[Term], Query]) -> "UnaryMinus":
        return UnaryMinus(self.q.map_last_term(f))

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return UnaryMinus(self.q.traverse_q(f))


class Boost(Query):
    """Score multiplier, e.g. ``cats^2`` (Query.scala:256-261); map_last_term no-op.

    The weight is rounded through float32 to match the reference's Scala Float.
    """

    __slots__ = ("q", "weight")

    def __init__(self, q: Query, weight: float):
        object.__setattr__(self, "q", q)
        object.__setattr__(self, "weight", f32(weight))

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return Boost(self.q.traverse_q(f), self.weight)


class MinimumMatch(Query):
    """At-least-num-of, e.g. ``(one two three)@2`` (Query.scala:270-277)."""

    __slots__ = ("qs", "num")

    def __init__(self, qs: Iterable[Query], num: int):
        qs = tuple(qs)
        if not qs:
            raise ValueError("MinimumMatch requires at least one query")
        object.__setattr__(self, "qs", qs)
        object.__setattr__(self, "num", int(num))

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return MinimumMatch(tuple(q.traverse_q(f) for q in self.qs), self.num)


class Field(Query):
    """Field-scoped query, e.g. ``title:cats`` (Query.scala:286-292)."""

    __slots__ = ("field", "q")

    def __init__(self, field: str, q: Query):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "q", q)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def map_last_term(self, f: Callable[[Term], Query]) -> "Field":
        return Field(self.field, self.q.map_last_term(f))

    def traverse_q(self, f: Callable[[TermQuery], Query]) -> Query:
        return Field(self.field, self.q.traverse_q(f))


# ---- wildcard ops (Query.scala:294-301) ----


class WildCardOp:
    __slots__ = ()


class _SingleChar(WildCardOp):
    __slots__ = ()

    def __reduce__(self):
        return (_SingleChar, ())

    def __repr__(self):
        return "SingleChar"

    def __eq__(self, other):
        return isinstance(other, _SingleChar)

    def __hash__(self):
        return hash("SingleChar")


class _ManyChar(WildCardOp):
    __slots__ = ()

    def __reduce__(self):
        return (_ManyChar, ())

    def __repr__(self):
        return "ManyChar"

    def __eq__(self, other):
        return isinstance(other, _ManyChar)

    def __hash__(self):
        return hash("ManyChar")


SingleChar = _SingleChar()
ManyChar = _ManyChar()


class Str(WildCardOp):
    __slots__ = ("value",)

    def __init__(self, value: str):
        object.__setattr__(self, "value", value)

    def __setattr__(self, *_):
        raise AttributeError("immutable")

    def __reduce__(self):
        return (Str, (self.value,))

    def __repr__(self):
        return f"Str({self.value!r})"

    def __eq__(self, other):
        return isinstance(other, Str) and self.value == other.value

    def __hash__(self):
        return hash(("Str", self.value))


class WildCard(_Leaf):
    """General glob pattern, e.g. ``c?t``, ``*cat*`` (Query.scala:301)."""

    __slots__ = ("ops",)

    def __init__(self, ops: Iterable[WildCardOp]):
        ops = tuple(ops)
        if not ops:
            raise ValueError("WildCard requires at least one op")
        object.__setattr__(self, "ops", ops)


def _rewrite_last(qs: tuple, f: Callable[[Term], Query]) -> tuple:
    """Rewrite the last element of a child tuple (Query.scala:303-311)."""
    if len(qs) == 1:
        return (qs[0].map_last_term(f),)
    return qs[:-1] + (qs[-1].map_last_term(f),)
