"""Port of StandardQueryParserDocsSuite (StandardQueryParserDocsSuite.scala:23-268):
the official Lucene StandardQueryParser docs examples."""

import pytest

from lucille_ray.query import (
    And, Boost, Field, Fuzzy, Group, MinimumMatch, Not, Or, Phrase, Prefix,
    Proximity, Term, TermRange, TermRegex, UnaryPlus, parse,
)

CASES = [
    ("test", Term("test")),
    ("test equipment", Or(Term("test"), Term("equipment"))),
    ('"test failure"~4', Proximity("test failure", 4)),
    ("tes*", Prefix("tes")),
    ("/.est(s|ing)/", TermRegex(".est(s|ing)")),
    ("nest~4", Fuzzy("nest", 4)),
    ("title:test", Field("title", Term("test"))),
    ("title:(die OR hard)", Field("title", Group(Or(Term("die"), Term("hard"))))),
    ("test AND results", And(Term("test"), Term("results"))),
    (
        "title:test AND NOT title:complete",
        And(Field("title", Term("test")), Not(Field("title", Term("complete")))),
    ),
    (
        "title:test AND (pass* OR fail*)",
        And(Field("title", Term("test")), Group(Or(Prefix("pass"), Prefix("fail")))),
    ),
    (
        "title:(pass fail skip)",
        Field("title", Group(Or(Term("pass"), Term("fail"), Term("skip")))),
    ),
    (
        'title:(+test +"result unknown")',
        Field(
            "title",
            Group(Or(UnaryPlus(Term("test")), UnaryPlus(Phrase("result unknown")))),
        ),
    ),
    ("name:[Jones TO Smith]", Field("name", TermRange("Jones", "Smith", True, True))),
    ("score:{2.5 TO 7.3}", Field("score", TermRange("2.5", "7.3", False, False))),
    ("score:{2.5 TO *]", Field("score", TermRange("2.5", None, False, True))),
    ("jones^2 OR smith^0.5", Or(Boost(Term("jones"), 2.0), Boost(Term("smith"), 0.5))),
    (
        "field:(a OR b NOT c)^2.5 OR field:d",
        Or(
            Field(
                "field",
                Boost(Group(Or(Or(Term("a"), Term("b")), Not(Term("c")))), 2.5),
            ),
            Field("field", Term("d")),
        ),
    ),
    (
        "(blue crab fish)@2",
        MinimumMatch([Term("blue"), Term("crab"), Term("fish")], 2),
    ),
    (
        "((yellow OR blue) crab fish)@2",
        MinimumMatch(
            [Group(Or(Term("yellow"), Term("blue"))), Term("crab"), Term("fish")], 2
        ),
    ),
]


@pytest.mark.parametrize("query_str,expected", CASES, ids=repr)
def test_standard_docs(query_str, expected):
    assert parse(query_str) == expected


@pytest.mark.parametrize(
    "query_str",
    [
        r"\:\(quoted\+term\)\:",  # escaped specials parse (isRight)
        "fn:ordered(quick brown fox)",
        "title:fn:maxwidth(5 fn:atLeast(2 quick brown fox))",
    ],
    ids=repr,
)
def test_standard_docs_parse_ok(query_str):
    parse(query_str)  # must not raise
