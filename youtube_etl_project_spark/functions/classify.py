"""Sentiment classification and engagement rate (reference F3/F4) as pure
Column expressions.

Reference semantics (src/youtube_collector.py:66-116):

* ``classify_video``: category-id drives the primary branch —
  positive set → (POSITIVE, CATEGORY_BASED); negative set → (NEGATIVE,
  CATEGORY_BASED); mixed set → compare keyword-hit counts (pos>neg →
  POSITIVE, neg>pos → NEGATIVE, tie → NEUTRAL), method KEYWORD_BASED;
  anything else → (UNKNOWN, UNCATEGORIZED). Returns a 4-field struct
  (final_sentiment, classification_method, positive_keyword_count,
  negative_keyword_count).
* ``calculate_engagement``: 0.0 when views == 0, else
  ``round((likes + comments) / views * 100, 4)``.

Both compile to nested CASE expressions — one codegen stage, no UDF.
"""

from __future__ import annotations

from collections.abc import Collection, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from youtube_etl_project_spark import config
from youtube_etl_project_spark.functions.text import keyword_hits


def classify_sentiment(
    category_id: Column | str,
    text: Column | str,
    positive_categories: Collection[int] = config.POSITIVE_CATEGORIES,
    negative_categories: Collection[int] = config.NEGATIVE_CATEGORIES,
    mixed_categories: Collection[int] = config.MIXED_CATEGORIES,
    positive_keywords: Sequence[str] = config.POSITIVE_KEYWORDS,
    negative_keywords: Sequence[str] = config.NEGATIVE_KEYWORDS,
) -> Column:
    """Struct(final_sentiment, classification_method,
    positive_keyword_count, negative_keyword_count) — reference F3."""
    cat = F.col(category_id) if isinstance(category_id, str) else category_id
    pos = keyword_hits(text, positive_keywords)
    neg = keyword_hits(text, negative_keywords)

    sentiment = (
        F.when(cat.isin(*positive_categories), F.lit("POSITIVE"))
        .when(cat.isin(*negative_categories), F.lit("NEGATIVE"))
        .when(
            cat.isin(*mixed_categories),
            F.when(pos > neg, F.lit("POSITIVE"))
            .when(neg > pos, F.lit("NEGATIVE"))
            .otherwise(F.lit("NEUTRAL")),
        )
        .otherwise(F.lit("UNKNOWN"))
    )
    method = (
        F.when(
            cat.isin(*positive_categories) | cat.isin(*negative_categories),
            F.lit("CATEGORY_BASED"),
        )
        .when(cat.isin(*mixed_categories), F.lit("KEYWORD_BASED"))
        .otherwise(F.lit("UNCATEGORIZED"))
    )
    return F.struct(
        sentiment.alias("final_sentiment"),
        method.alias("classification_method"),
        pos.alias("positive_keyword_count"),
        neg.alias("negative_keyword_count"),
    )


def engagement_rate(
    views: Column | str, likes: Column | str, comments: Column | str
) -> Column:
    """``0.0 if views == 0 else round((likes+comments)/views*100, 4)`` —
    reference F4 with its zero-view guard."""
    v = F.col(views) if isinstance(views, str) else views
    l = F.col(likes) if isinstance(likes, str) else likes
    c = F.col(comments) if isinstance(comments, str) else comments
    return F.when(v == 0, F.lit(0.0)).otherwise(
        F.round((l + c) / v * 100, 4)
    ).cast("double")
