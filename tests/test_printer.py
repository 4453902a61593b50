"""Port of QueryPrinterSuite (QueryPrinterSuite.scala:22-287): SimpleQueries,
WildCard, SimpleQueryTerm and EscapedTerm suites."""

import pytest

from lucille_ray.query import (
    And, Boost, Field, Fuzzy, Group, ManyChar, MinimumMatch, Not, Or, Phrase,
    Prefix, Proximity, SingleChar, Str, Term, TermRange, TermRegex, UnaryMinus,
    UnaryPlus, WildCard, parse, print_query,
)

SIMPLE_CASES = [
    (Or(Term("hello"), Term("hi")), "hello OR hi"),
    (Group(Or(Term("hello"), Term("hi"))), "(hello OR hi)"),
    (And(Term("hello"), Term("hi")), "hello AND hi"),
    (Group(And(Term("hello"), Term("hi"))), "(hello AND hi)"),
    (Not(Or(Term("hello"), Term("hi"))), "NOT (hello OR hi)"),
    (Not(Group(Or(Term("hello"), Term("hi")))), "NOT (hello OR hi)"),
    (UnaryMinus(Term("hello")), "-hello"),
    (Group(UnaryMinus(Term("hello"))), "(-hello)"),
    (UnaryPlus(Term("hello")), "+hello"),
    (Group(UnaryPlus(Term("hello"))), "(+hello)"),
    (MinimumMatch([Term("hello"), Term("hi")], 2), "(hello hi)@2"),
    (Boost(Term("hello"), 2.25), "hello^2.25"),
    (Boost(Phrase("hello friend"), 2.25), '"hello friend"^2.25'),
    (Boost(Or(Term("hello"), Term("hi")), 2.25), "(hello OR hi)^2.25"),
    (And(Boost(Term("cats"), 3.0), Boost(Term("dogs"), 2.0)), "cats^3.00 AND dogs^2.00"),
    (
        Boost(Group(Or(Term("hello"), Field("fieldB", Term("d")))), 3.1),
        "(hello OR fieldB:d)^3.10",
    ),
    (
        Or(
            Boost(
                Field("fieldA", Group(Or(Or(Term("a"), Term("b")), Not(Term("c"))))),
                2.50,
            ),
            Field("fieldB", Term("d")),
        ),
        "(fieldA:(a OR b OR NOT c))^2.50 OR fieldB:d",
    ),
    (
        Field("msg", MinimumMatch([Term("hello"), Term("hi")], 2)),
        "msg:(hello hi)@2",
    ),
    (Field("msg", Or(Term("a"), Term("b"))), "msg:(a OR b)"),
]


@pytest.mark.parametrize("query,expected", SIMPLE_CASES, ids=lambda x: repr(x)[:60])
def test_print_simple(query, expected):
    assert print_query(query) == expected


def test_print_boost_precision_zero():
    assert print_query(Boost(Or(Term("hello"), Term("hi")), 3.1), 0) == "(hello OR hi)^3"


def test_print_boost_precision_one():
    assert print_query(Boost(Or(Term("hello"), Term("hi")), 3.1), 1) == "(hello OR hi)^3.1"


def test_print_boost_precision_three():
    # QueryPrinter.scala:28-31 docstring example
    assert print_query(Boost(Phrase("apple pi"), 3.14159), 3) == '"apple pi"^3.142'


WILDCARD_CASES = [
    (WildCard([ManyChar, Str("tail")]), "*tail"),
    (WildCard([SingleChar, Str("tail")]), "?tail"),
    (WildCard([Str("head"), SingleChar, Str("tail"), ManyChar]), "head?tail*"),
    (WildCard([Str("simple")]), "simple"),
]


@pytest.mark.parametrize("query,expected", WILDCARD_CASES, ids=lambda x: repr(x)[:60])
def test_print_wildcard(query, expected):
    assert print_query(query) == expected


TERM_CASES = [
    (Term("hello"), "hello"),
    (Phrase("hello friend"), '"hello friend"'),
    (Prefix("hel"), "hel*"),
    (Proximity("cats jumped", 2), '"cats jumped"~2'),
    (Fuzzy("hello", None), "hello~"),
    (Fuzzy("hello", 2), "hello~2"),
    (TermRegex("/.ump(s|ing)/"), "/.ump(s|ing)/"),
    # NOTE: intentional reference quirk — printer inverts inclusivity brackets
    (TermRange(None, None, False, False), "[* TO *]"),
    (TermRange("Apple", "Banana", False, False), "[Apple TO Banana]"),
    (TermRange("Apple", "Banana", True, False), "{Apple TO Banana]"),
    (TermRange("Apple", "Banana", False, True), "[Apple TO Banana}"),
]


@pytest.mark.parametrize("query,expected", TERM_CASES, ids=lambda x: repr(x)[:60])
def test_print_terms(query, expected):
    assert print_query(query) == expected


ESCAPE_CASES = [
    (Term("cat:dog"), "cat\\:dog"),
    (Term("(1+1):2"), "\\(1\\+1\\)\\:2"),
]


@pytest.mark.parametrize("query,expected", ESCAPE_CASES, ids=lambda x: repr(x)[:60])
def test_print_escaped(query, expected):
    assert print_query(query) == expected


@pytest.mark.parametrize(
    "query_str",
    [
        '"cats-effect"',
        '"cats:effect"',
        "title:(cats\\-effect OR cats\\:effect)",
        '"the cat said \\"meow\\" loudly"',
        '"This is a blackslash: \\\\, wow!"',
    ],
    ids=repr,
)
def test_parse_print_round_trip(query_str):
    assert print_query(parse(query_str)) == query_str
