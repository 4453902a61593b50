"""Port of the reference ParserSuite (ParserSuite.scala:20-496): SingleSimpleQuery,
MultiSimpleQuery, QueryWithSuffixOps and GroupQuery munit suites, 1:1 inputs and
expected ASTs."""

import pytest

from lucille_ray.query import (
    And, Boost, Field, Fuzzy, Group, Not, Or, ParseError, Phrase, Proximity, Term,
    parse,
)

# ---- SingleSimpleQuerySuite (ParserSuite.scala:20-167) ----

SINGLE_CASES = [
    ("the", Term("the")),
    ("the   ", Term("the")),
    ("  the", Term("the")),
    ("  the      ", Term("the")),
    ('"The cat jumped"', Phrase("The cat jumped")),
    ('"The cat jumped   "', Phrase("The cat jumped   ")),
    ('"   The cat jumped"', Phrase("   The cat jumped")),
    ('"   The  cat jumped   "', Phrase("   The  cat jumped   ")),
    ("“The cat jumped”", Phrase("The cat jumped")),  # smart quotes
    ('  "The cat jumped"  ', Phrase("The cat jumped")),
    ("fieldName:cat", Field("fieldName", Term("cat"))),
    ("  fieldName:cat  ", Field("fieldName", Term("cat"))),
    ('fieldName:"The cat jumped"', Field("fieldName", Phrase("The cat jumped"))),
    ("catch22", Term("catch22")),
    ("fieldName42:cat", Field("fieldName42", Term("cat"))),
    ("fieldName42:cat42", Field("fieldName42", Term("cat42"))),
    ("cats^3.0", Boost(Term("cats"), 3.0)),
    ("cats^3.0 AND dogs^2", And(Boost(Term("cats"), 3.0), Boost(Term("dogs"), 2.0))),
    ("fieldName42:cat42^3", Field("fieldName42", Boost(Term("cat42"), 3.0))),
    ("(fieldName42:cat42^3)", Group(Field("fieldName42", Boost(Term("cat42"), 3.0)))),
    ("fieldName42:cat42^3.1", Field("fieldName42", Boost(Term("cat42"), 3.1))),
    (
        "fieldName42:(cats AND dogs)^20",
        Field("fieldName42", Boost(Group(And(Term("cats"), Term("dogs"))), 20.0)),
    ),
    ("cat\\:dog", Term("cat:dog")),
    ("\\(1\\+1\\)\\:2", Term("(1+1):2")),
]


@pytest.mark.parametrize("query_str,expected", SINGLE_CASES, ids=repr)
def test_single_simple_query(query_str, expected):
    assert parse(query_str) == expected


@pytest.mark.parametrize(
    "query_str",
    [
        "AND:cat",  # field names cannot be reserved suffix operators
        '"AND":cat',  # field names cannot be quoted
        "fieldName42:cat42^3.1f",  # no 'f' suffix on boost
        "fieldName42:cat42^3.1d",  # no 'd' suffix on boost
    ],
    ids=repr,
)
def test_single_simple_query_failures(query_str):
    with pytest.raises(ParseError):
        parse(query_str)


# ---- MultiSimpleQuerySuite (ParserSuite.scala:169-215) ----

MULTI_CASES = [
    ("The cat jumped", Or(Term("The"), Term("cat"), Term("jumped"))),
    ("The cat   jumped   ", Or(Term("The"), Term("cat"), Term("jumped"))),
    (
        "fieldName:The cat jumped",
        Or(Field("fieldName", Term("The")), Term("cat"), Term("jumped")),
    ),
    ('"derp lerp"~3', Proximity("derp lerp", 3)),
    ("derp~", Fuzzy("derp", None)),
    ("derp~2", Fuzzy("derp", 2)),
]


@pytest.mark.parametrize("query_str,expected", MULTI_CASES, ids=repr)
def test_multi_simple_query(query_str, expected):
    assert parse(query_str) == expected


@pytest.mark.parametrize("query_str", ['"derp lerp"~3.2', "derp~3.2"], ids=repr)
def test_multi_simple_query_failures(query_str):
    with pytest.raises(ParseError):
        parse(query_str)


# ---- QueryWithSuffixOpsSuite (ParserSuite.scala:217-416) ----

SUFFIX_CASES = [
    ("derp OR lerp", Or(Term("derp"), Term("lerp"))),
    ("derp OR lerp OR slerp", Or(Term("derp"), Term("lerp"), Term("slerp"))),
    ('derp OR "lerp slerp"', Or(Term("derp"), Phrase("lerp slerp"))),
    ("derp AND lerp", And(Term("derp"), Term("lerp"))),
    ("term derp OR lerp", Or(Term("term"), Or(Term("derp"), Term("lerp")))),
    ("derp OR lerp slerp", Or(Or(Term("derp"), Term("lerp")), Term("slerp"))),
    ("derp AND lerp slerp", Or(And(Term("derp"), Term("lerp")), Term("slerp"))),
    ('derp AND "lerp slerp"', And(Term("derp"), Phrase("lerp slerp"))),
    ('derp && "lerp slerp"', And(Term("derp"), Phrase("lerp slerp"))),
    (
        "derp AND lerp slerp orA OR orB last",
        Or(
            And(Term("derp"), Term("lerp")),
            Term("slerp"),
            Or(Term("orA"), Term("orB")),
            Term("last"),
        ),
    ),
    (
        "derp OR lerp slerp andA AND andB last",
        Or(
            Or(Term("derp"), Term("lerp")),
            Term("slerp"),
            And(Term("andA"), Term("andB")),
            Term("last"),
        ),
    ),
    (
        "the cat AND ocean AND ocean2 OR fish",
        Or(
            Term("the"),
            Or(And(Term("cat"), Term("ocean"), Term("ocean2")), Term("fish")),
        ),
    ),
    ("NOT derp", Not(Term("derp"))),
    ("derp AND NOT lerp", And(Term("derp"), Not(Term("lerp")))),
]


@pytest.mark.parametrize("query_str,expected", SUFFIX_CASES, ids=repr)
def test_suffix_ops(query_str, expected):
    assert parse(query_str) == expected


@pytest.mark.parametrize(
    "query_str",
    ["OR", "AND", "cat OR", "cat AND", "cat OR ", "cat AND "],
    ids=repr,
)
def test_suffix_ops_failures(query_str):
    with pytest.raises(ParseError):
        parse(query_str)


# ---- GroupQuerySuite (ParserSuite.scala:418-496) ----

GROUP_CASES = [
    ("(The cat jumped)", Group(Or(Term("The"), Term("cat"), Term("jumped")))),
    ("(The cat   jumped   )", Group(Or(Term("The"), Term("cat"), Term("jumped")))),
    (
        "animals NOT (cats AND dogs)",
        Or(Term("animals"), Not(Group(And(Term("cats"), Term("dogs"))))),
    ),
    ("title:(cats AND dogs)", Field("title", Group(And(Term("cats"), Term("dogs"))))),
    (
        "title:test AND (pass OR fail)",
        And(Field("title", Term("test")), Group(Or(Term("pass"), Term("fail")))),
    ),
    (
        "(title:test AND (pass OR fail)) extra",
        Or(
            Group(
                And(Field("title", Term("test")), Group(Or(Term("pass"), Term("fail"))))
            ),
            Term("extra"),
        ),
    ),
    (
        '(title:test AND (pass OR fail)) AND "extra phrase"',
        And(
            Group(
                And(Field("title", Term("test")), Group(Or(Term("pass"), Term("fail"))))
            ),
            Phrase("extra phrase"),
        ),
    ),
]


@pytest.mark.parametrize("query_str,expected", GROUP_CASES, ids=repr)
def test_group_query(query_str, expected):
    assert parse(query_str) == expected
