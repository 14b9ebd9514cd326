"""Classification vocabulary and category sets.

Semantics mirror the reference's config (``src/config.py:24-44`` of the
reference repo): positive/negative keyword lists drive keyword-hit counting
and the sentiment CASE; category-id sets drive the category branch. The
actual words here are generic sentiment vocabulary — the behavior (substring
containment, counted hits, category precedence) is what we reproduce.
"""

from __future__ import annotations

# Keyword lists (cf. reference src/config.py:24-34). Substring containment,
# case-insensitive via a lowercased text blob.
POSITIVE_KEYWORDS: list[str] = [
    "amazing", "awesome", "best", "excellent", "fantastic",
    "good", "great", "happy", "incredible", "love",
    "perfect", "beautiful", "brilliant", "wonderful", "win",
]
NEGATIVE_KEYWORDS: list[str] = [
    "awful", "bad", "boring", "disappointing", "fail",
    "hate", "horrible", "sad", "terrible", "worst",
    "broken", "scam", "angry", "wrong", "waste",
]

# Category-id sets (cf. reference src/config.py:37-39).
POSITIVE_CATEGORIES: set[int] = {19, 26, 27, 28, 29}
NEGATIVE_CATEGORIES: set[int] = {20, 23, 24, 25}
MIXED_CATEGORIES: set[int] = {1, 2, 10, 15, 17, 22}

# Search fan-out config (cf. reference src/config.py:42-44).
REGIONS: list[str] = ["US", "GB", "IN", "PK", "CA"]
SEARCH_KEYWORDS: list[str] = ["news", "music", "sports", "gaming", "tech", "movies"]
VIDEOS_PER_KEYWORD: int = 10

# Engine-side vocabulary for the extension text operators: minimal
# per-language stopword lists for the n-gram/stopword language heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}
