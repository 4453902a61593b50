"""Ports of QuerySuite (QuerySuite.scala:21-98) — mapLastTerm + fluent builders — and
QueryTraverseQSuite (QueryTraverseQSuite.scala:22-121) — leaf traversal with
short-circuit (modelled with Python exceptions)."""

import pytest

from lucille_ray.query import (
    And, Boost, Field, Group, MinimumMatch, Not, Or, Phrase, Prefix, Term,
    UnaryMinus, UnaryPlus, parse,
)


def expand_q(t: Term):
    return Or(Term(t.value), Prefix(t.value))


def test_map_last_term_or():
    q = Or(Term("cats"), Term("dogs"))
    assert q.map_last_term(expand_q) == Or(
        Term("cats"), Or(Term("dogs"), Prefix("dogs"))
    )


def test_map_last_term_and():
    q = And(Term("cats"), Term("dogs"))
    assert q.map_last_term(expand_q) == And(
        Term("cats"), Or(Term("dogs"), Prefix("dogs"))
    )


def test_map_last_term_or_not():
    q = Or(Term("cats"), Not(Term("dogs")))
    assert q.map_last_term(expand_q) == Or(
        Term("cats"), Not(Or(Term("dogs"), Prefix("dogs")))
    )


def test_map_last_term_and_not():
    q = And(Term("cats"), Not(Term("dogs")))
    assert q.map_last_term(expand_q) == And(
        Term("cats"), Not(Or(Term("dogs"), Prefix("dogs")))
    )


@pytest.mark.parametrize(
    "query_str",
    ["(apple banana orange)@2", "name:[cats TO fs2]", "cats AND (dogs OR fish)"],
    ids=repr,
)
def test_map_last_term_noop(query_str):
    q = parse(query_str)
    assert q.map_last_term(expand_q) == q


def test_fluent_and():
    q1, q2 = Term("cats"), Or(Term("dogs"), Term("fish"))
    assert q1.and_(q2) == And(q1, q2)


def test_fluent_or():
    q1, q2 = Term("dogs"), Term("cats")
    assert q1.or_(q2) == Or(q1, q2)


def test_fluent_not():
    q1 = Term("cats")
    assert q1.not_() == Not(q1)


def test_fluent_boost():
    q1 = Term("dogs")
    assert q1.boost(100) == Boost(q1, 100.0)


# ---- traverse_q (QueryTraverseQSuite) ----


class Oops(Exception):
    pass


def upper_case_terms(q):
    if isinstance(q, Term):
        return Term(q.value.upper())
    return q


def only_cats(q):
    if q == Term("cats"):
        return Term("CATS")
    raise Oops("oops")


def term_to_phrase(q):
    if isinstance(q, Term):
        return Phrase(q.value)
    return q


def test_traverse_maps_and_preserves_structure():
    assert And(Term("cats"), Term("dogs")).traverse_q(upper_case_terms) == And(
        Term("CATS"), Term("DOGS")
    )
    assert Or(Term("cats"), Term("dogs")).traverse_q(upper_case_terms) == Or(
        Term("CATS"), Term("DOGS")
    )


def test_traverse_short_circuits():
    with pytest.raises(Oops):
        And(Term("cats"), Term("dogs")).traverse_q(only_cats)
    with pytest.raises(Oops):
        Or(Term("cats"), Term("dogs")).traverse_q(only_cats)


def big_tree(cat):
    extra = Term("dogs") if cat == Term("cats") else Term("DOGS")
    return And(
        cat,
        Boost(cat, 2.2),
        Field("title", cat),
        Or(
            Not(cat),
            UnaryPlus(cat),
            UnaryMinus(cat),
            Group(And(cat, cat)),
            MinimumMatch([cat, And(cat, extra)], 2),
        ),
    )


def test_traverse_short_circuits_big_tree():
    with pytest.raises(Oops):
        big_tree(Term("cats")).traverse_q(only_cats)


def test_traverse_maps_big_tree():
    assert big_tree(Term("cats")).traverse_q(upper_case_terms) == big_tree(
        Term("CATS")
    )


def test_traverse_allows_changing_term_query_types():
    q = And(Term("cats"), Not(Term("dogs")))
    assert q.traverse_q(term_to_phrase) == And(Phrase("cats"), Not(Phrase("dogs")))


def flip_booleans(q):
    # Tries to flip boolean branches — must have no effect: traverse only sees leaves
    if isinstance(q, Or):
        return And(q.qs[1], q.qs[0], *q.qs[2:])
    if isinstance(q, And):
        return Or(q.qs[1], q.qs[0], *q.qs[2:])
    if isinstance(q, Not):
        return q.q
    return q


def test_traverse_unaffected_by_branch_rewrites():
    q = Or(Term("cats"), Term("dogs"), And(Term("cats"), Not(Term("dogs"))))
    assert q.traverse_q(flip_booleans) == q
