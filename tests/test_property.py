"""Hypothesis property tests (SURVEY §5.4): the Column-expression
implementations must agree with an independent pure-Python model of the
reference semantics on arbitrary inputs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from youtube_etl_project_spark import config
from youtube_etl_project_spark.functions import (
    classify_sentiment,
    engagement_rate,
    keyword_hits,
)

# -- pure-Python model of the reference logic (YC:66-116) -------------------

def py_keyword_hits(text: str, kws: list[str]) -> int:
    return sum(1 for k in kws if k in text)


def py_classify(cat: int, text: str) -> tuple[str, str]:
    pos = py_keyword_hits(text, config.POSITIVE_KEYWORDS)
    neg = py_keyword_hits(text, config.NEGATIVE_KEYWORDS)
    if cat in config.POSITIVE_CATEGORIES:
        return "POSITIVE", "CATEGORY_BASED"
    if cat in config.NEGATIVE_CATEGORIES:
        return "NEGATIVE", "CATEGORY_BASED"
    if cat in config.MIXED_CATEGORIES:
        if pos > neg:
            return "POSITIVE", "KEYWORD_BASED"
        if neg > pos:
            return "NEGATIVE", "KEYWORD_BASED"
        return "NEUTRAL", "KEYWORD_BASED"
    return "UNKNOWN", "UNCATEGORIZED"


def py_engagement(views: int, likes: int, comments: int) -> float:
    if views == 0:
        return 0.0
    return round((likes + comments) / views * 100, 4)


# vocabulary that can hit, partially overlap, or miss the keyword lists
WORDS = st.sampled_from(
    config.POSITIVE_KEYWORDS[:5]
    + config.NEGATIVE_KEYWORDS[:5]
    + ["spark", "engine", "goo", "ba", "xx"]
)
TEXTS = st.lists(WORDS, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(cat=st.integers(min_value=0, max_value=35), text=TEXTS)
def test_classify_matches_python_model(spark, cat, text):
    row = spark.range(1).select(
        classify_sentiment(F.lit(cat), F.lit(text)).alias("c")
    ).collect()[0]
    sentiment, method = py_classify(cat, text)
    assert (row.c.final_sentiment, row.c.classification_method) == (sentiment, method)
    assert row.c.positive_keyword_count == py_keyword_hits(
        text, config.POSITIVE_KEYWORDS
    )


@settings(max_examples=20, deadline=None)
@given(
    views=st.integers(min_value=0, max_value=10**9),
    likes=st.integers(min_value=0, max_value=10**6),
    comments=st.integers(min_value=0, max_value=10**6),
)
def test_engagement_matches_python_model(spark, views, likes, comments):
    row = spark.range(1).select(
        engagement_rate(F.lit(views), F.lit(likes), F.lit(comments)).alias("e")
    ).collect()[0]
    assert abs(row.e - py_engagement(views, likes, comments)) < 1e-9


@settings(max_examples=20, deadline=None)
@given(text=TEXTS)
def test_keyword_hits_matches_python_model(spark, text):
    row = spark.range(1).select(
        keyword_hits(F.lit(text), config.POSITIVE_KEYWORDS).alias("k")
    ).collect()[0]
    assert row.k == py_keyword_hits(text, config.POSITIVE_KEYWORDS)


# -- round-3 operators vs pure-Python models --------------------------------

def py_morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=20, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=1,
        max_size=20,
    ),
    bits=st.integers(1, 16),
)
def test_morton_key_matches_python_model(spark, pairs, bits):
    from youtube_etl_project_spark.operators.layout import morton_key

    df = spark.createDataFrame(pairs, "a long, b long")
    got = [r.z for r in df.select(morton_key("a", "b", bits).alias("z")).collect()]
    assert got == [py_morton(a, b, bits) for a, b in pairs]


@settings(max_examples=10, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=2,
        max_size=20,
        unique=True,
    )
)
def test_morton_key_preserves_distinctness(spark, pairs):
    # full-width keys: distinct (a, b) must map to distinct z
    from youtube_etl_project_spark.operators.layout import morton_key

    df = spark.createDataFrame(pairs, "a long, b long")
    zs = [r.z for r in df.select(morton_key("a", "b", 16).alias("z")).collect()]
    assert len(set(zs)) == len(pairs)
