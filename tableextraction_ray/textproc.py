"""Text post-processing functions from the reference's recognition stage.

- remove_hyphenated_words ~ ``table_extraction/recognition.py:151-164``
  (exact Python ``re`` semantics incl. lookaround non-consumption — a chain
  like ``"a-b-c"`` collapses fully in one pass)
- classify_table          ~ ``table_extraction/recognition.py:37-75``
  (positional char-error fuzzy match of 8 Russian steel-spec keywords;
  NOTE the reference compares ``partial_compare(keyword, word.lower())``
  zipping keyword chars against word chars positionally — preserved as-is)
"""

from __future__ import annotations

import re

_HYPHEN_RE = re.compile(r"(?<=[a-zA-Zа-яА-Я]) ?- ?(?=[a-zA-Zа-яА-Я])")

CLASSIFY_KEYWORDS = [
    "марка", "стали", "временное", "сопротивление",
    "предел", "текучести", "относительное", "удлинение",
]
_ERROR_THRESHOLD = 0.2
_KEYWORD_IMPORTANCE = 0.8


def remove_hyphenated_words(text: str) -> str:
    """Join OCR-hyphenated word halves: ``"сопро- тивление" -> "сопротивление"``."""
    return _HYPHEN_RE.sub("", text)


def _partial_compare(word: str, keyword: str) -> bool:
    max_length = max(len(word), len(keyword))
    errors = sum(1 for w, k in zip(word, keyword) if w != k)
    return errors / max_length <= _ERROR_THRESHOLD


def classify_table(table_text: str) -> bool:
    """True when the fuzzy keyword hit-rate confidence reaches the threshold."""
    found = 0
    for keyword in CLASSIFY_KEYWORDS:
        if any(_partial_compare(keyword, word.lower()) for word in table_text.split()):
            found += 1
    confidence = _KEYWORD_IMPORTANCE * (found / len(CLASSIFY_KEYWORDS))
    return confidence >= _ERROR_THRESHOLD
