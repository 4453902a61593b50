"""Port of AssociativitySuite (AssociativitySuite.scala:22-159) — 13 queries under both
the default-OR and default-AND parsers — and of internal AssociateOpsSuite
(internal/OpSuite.scala:21-82)."""

import pytest

from lucille_ray.query import And, Not, Op, Or, Term, associate_ops
from lucille_ray.query.parser import and_parser, default_parser

OR_CASES = [
    ("NOT a AND b", And(Not(Term("a")), Term("b"))),
    ("a AND NOT b", And(Term("a"), Not(Term("b")))),
    ("a AND b OR x", Or(And(Term("a"), Term("b")), Term("x"))),
    ("a AND b OR x AND y", Or(And(Term("a"), Term("b")), And(Term("x"), Term("y")))),
    ("a AND b AND c OR x", Or(And(Term("a"), Term("b"), Term("c")), Term("x"))),
    ("a b AND c", Or(Term("a"), And(Term("b"), Term("c")))),
    ("a b AND c d", Or(Term("a"), And(Term("b"), Term("c")), Term("d"))),
    ("a b AND c AND d", Or(Term("a"), And(Term("b"), Term("c"), Term("d")))),
    (
        "a b AND c AND d AND e",
        Or(Term("a"), And(Term("b"), Term("c"), Term("d"), Term("e"))),
    ),
    (
        "a b AND c AND d OR e",
        Or(Term("a"), Or(And(Term("b"), Term("c"), Term("d")), Term("e"))),
    ),
    (
        "a b AND c OR d e",
        Or(Term("a"), Or(And(Term("b"), Term("c")), Term("d")), Term("e")),
    ),
    (
        "a b AND c OR d AND e",
        Or(Term("a"), Or(And(Term("b"), Term("c")), And(Term("d"), Term("e")))),
    ),
    (
        "a b AND c OR d OR e",
        Or(Term("a"), Or(And(Term("b"), Term("c")), Term("d"), Term("e"))),
    ),
]

AND_CASES = [
    ("NOT a AND b", And(Not(Term("a")), Term("b"))),
    ("a AND NOT b", And(Term("a"), Not(Term("b")))),
    ("a AND b OR x", Or(And(Term("a"), Term("b")), Term("x"))),
    ("a AND b OR x AND y", Or(And(Term("a"), Term("b")), And(Term("x"), Term("y")))),
    ("a AND b AND c OR x", Or(And(Term("a"), Term("b"), Term("c")), Term("x"))),
    ("a b AND c", And(Term("a"), And(Term("b"), Term("c")))),
    ("a b AND c d", And(Term("a"), And(Term("b"), Term("c")), Term("d"))),
    ("a b AND c AND d", And(Term("a"), And(Term("b"), Term("c"), Term("d")))),
    (
        "a b AND c AND d AND e",
        And(Term("a"), And(Term("b"), Term("c"), Term("d"), Term("e"))),
    ),
    (
        "a b AND c AND d OR e",
        And(Term("a"), Or(And(Term("b"), Term("c"), Term("d")), Term("e"))),
    ),
    (
        "a b AND c OR d e",
        And(Term("a"), Or(And(Term("b"), Term("c")), Term("d")), Term("e")),
    ),
    (
        "a b AND c OR d AND e",
        And(Term("a"), Or(And(Term("b"), Term("c")), And(Term("d"), Term("e")))),
    ),
    (
        "a b AND c OR d OR e",
        And(Term("a"), Or(And(Term("b"), Term("c")), Term("d"), Term("e"))),
    ),
]


@pytest.mark.parametrize("query_str,expected", OR_CASES, ids=repr)
def test_associativity_default_or(query_str, expected):
    assert default_parser.parse(query_str) == expected


@pytest.mark.parametrize("query_str,expected", AND_CASES, ids=repr)
def test_associativity_default_and(query_str, expected):
    assert and_parser.parse(query_str) == expected


# ---- AssociateOpsSuite (internal/OpSuite.scala:23-81) ----


def test_one_and_pair():
    assert associate_ops(Term("cats"), [(Op.AND, Term("dogs"))]) == And(
        Term("cats"), Term("dogs")
    )


def test_two_and_pairs():
    assert associate_ops(
        Term("cats"), [(Op.AND, Term("dogs")), (Op.AND, Term("fish"))]
    ) == And(Term("cats"), Term("dogs"), Term("fish"))


def test_one_or_pair():
    assert associate_ops(Term("cats"), [(Op.OR, Term("dogs"))]) == Or(
        Term("cats"), Term("dogs")
    )


def test_two_or_pairs():
    assert associate_ops(
        Term("cats"), [(Op.OR, Term("dogs")), (Op.OR, Term("fish"))]
    ) == Or(Term("cats"), Term("dogs"), Term("fish"))


def test_two_ands_then_or():
    op_qs = [(Op.AND, Term("ocean")), (Op.AND, Term("ocean2")), (Op.OR, Term("fish"))]
    assert associate_ops(Term("cat"), op_qs) == Or(
        And(Term("cat"), Term("ocean"), Term("ocean2")), Term("fish")
    )


def test_two_ors_then_and():
    op_qs = [(Op.OR, Term("ocean")), (Op.OR, Term("ocean2")), (Op.AND, Term("fish"))]
    assert associate_ops(Term("cat"), op_qs) == Or(
        Term("cat"), Term("ocean"), And(Term("ocean2"), Term("fish"))
    )


def test_one_and_island():
    op_qs = [
        (Op.OR, Term("ocean")),
        (Op.OR, Term("coast")),
        (Op.AND, Term("island")),
        (Op.OR, Term("ocean")),
    ]
    assert associate_ops(Term("cat"), op_qs) == Or(
        Term("cat"), Term("ocean"), And(Term("coast"), Term("island")), Term("ocean")
    )


def test_two_and_islands():
    op_qs = [
        (Op.OR, Term("ocean")),
        (Op.OR, Term("coast")),
        (Op.AND, Term("island")),
        (Op.OR, Term("ocean")),
    ]
    ocean_qs = [Term("ocean"), And(Term("coast"), Term("island")), Term("ocean")]
    expected = Or([Term("cat")] + ocean_qs + ocean_qs)
    assert associate_ops(Term("cat"), op_qs + op_qs) == expected
