"""Ports of DefaultBooleanAndSuite (DefaultBooleanAndSuite.scala:21-80),
PunctuationSuite (PunctuationSuite.scala:21-60), WildCardParserSuite
(WildCardParserSuite.scala:22-144) and RegexSuite (RegexSuite.scala:20-49)."""

import pytest

from lucille_ray.query import (
    And, Boost, Field, Group, ManyChar, Or, ParseError, Phrase, Prefix, SingleChar,
    Str, Term, TermRegex, WildCard, parse,
)
from lucille_ray.query.parser import and_parser

# ---- DefaultBooleanAndSuite ----

AND_DEFAULT_CASES = [
    ("cats dogs", And(Term("cats"), Term("dogs"))),
    (
        "cats dogs fish lizards",
        And(Term("cats"), Term("dogs"), Term("fish"), Term("lizards")),
    ),
    ("(cats dogs)", Group(And(Term("cats"), Term("dogs")))),
    ("(cats AND dogs)", Group(And(Term("cats"), Term("dogs")))),
    ("(cats OR dogs)", Group(Or(Term("cats"), Term("dogs")))),
    (
        "derp AND lerp slerp orA OR orB last",
        And(
            And(Term("derp"), Term("lerp")),
            Term("slerp"),
            Or(Term("orA"), Term("orB")),
            Term("last"),
        ),
    ),
    (
        "derp OR lerp slerp andA AND andB last",
        And(
            Or(Term("derp"), Term("lerp")),
            Term("slerp"),
            And(Term("andA"), Term("andB")),
            Term("last"),
        ),
    ),
]


@pytest.mark.parametrize("query_str,expected", AND_DEFAULT_CASES, ids=repr)
def test_default_boolean_and(query_str, expected):
    assert and_parser.parse(query_str) == expected


# ---- PunctuationSuite ----

PUNCT_CASES = [
    ("typelevel.com", Term("typelevel.com")),
    ("typelevel.com\\/cats", Term("typelevel.com/cats")),
    ("cats\\-effect", Term("cats-effect")),
    ("first.last@email.com", Term("first.last@email.com")),
    ('name:"cats-effect"', Field("name", Phrase("cats-effect"))),
    ('"the cat said \\"meow\\" loudly"', Phrase('the cat said "meow" loudly')),
    ('"This is a blackslash: \\\\, wow!"', Phrase("This is a blackslash: \\, wow!")),
]


@pytest.mark.parametrize("query_str,expected", PUNCT_CASES, ids=repr)
def test_punctuation(query_str, expected):
    assert parse(query_str) == expected


# ---- WildCardParserSuite ----

WILDCARD_CASES = [
    ("cat?", WildCard([Str("cat"), SingleChar])),
    ("cat*", Prefix("cat")),
    ("?cat", WildCard([SingleChar, Str("cat")])),
    ("*cat", WildCard([ManyChar, Str("cat")])),
    ("?cat?", WildCard([SingleChar, Str("cat"), SingleChar])),
    ("?cat*", WildCard([SingleChar, Str("cat"), ManyChar])),
    ("*cat?", WildCard([ManyChar, Str("cat"), SingleChar])),
    ("*cat*", WildCard([ManyChar, Str("cat"), ManyChar])),
    ("cat*tail", WildCard([Str("cat"), ManyChar, Str("tail")])),
    ("cat?tail", WildCard([Str("cat"), SingleChar, Str("tail")])),
    ("(cat?)", Group(WildCard([Str("cat"), SingleChar]))),
    ("(cat*)", Group(Prefix("cat"))),
    ("(?cat)", Group(WildCard([SingleChar, Str("cat")]))),
    ("(*cat)", Group(WildCard([ManyChar, Str("cat")]))),
    ("(cat*tail)", Group(WildCard([Str("cat"), ManyChar, Str("tail")]))),
    ("(cat?tail)", Group(WildCard([Str("cat"), SingleChar, Str("tail")]))),
    ("cat?^2", Boost(WildCard([Str("cat"), SingleChar]), 2.0)),
    ("cat*^2", Boost(Prefix("cat"), 2.0)),
    ("?cat^2", Boost(WildCard([SingleChar, Str("cat")]), 2.0)),
    ("*cat^2", Boost(WildCard([ManyChar, Str("cat")]), 2.0)),
    ("cat*tail^2", Boost(WildCard([Str("cat"), ManyChar, Str("tail")]), 2.0)),
    ("cat?tail^2", Boost(WildCard([Str("cat"), SingleChar, Str("tail")]), 2.0)),
]


@pytest.mark.parametrize("query_str,expected", WILDCARD_CASES, ids=repr)
def test_wildcards(query_str, expected):
    assert parse(query_str) == expected


# ---- RegexSuite ----

REGEX_CASES = [
    ("/jump.*/", TermRegex("jump.*")),
    ("/hi{1,5}/", TermRegex("hi{1,5}")),
    ("(/jump.*/ /.ouse/)", Group(Or(TermRegex("jump.*"), TermRegex(".ouse")))),
    (r"/home\/.*/", TermRegex(r"home\/.*")),
]


@pytest.mark.parametrize("query_str,expected", REGEX_CASES, ids=repr)
def test_regex(query_str, expected):
    assert parse(query_str) == expected


def test_regex_unterminated_fails():
    with pytest.raises(ParseError):
        parse("/jump.*")
