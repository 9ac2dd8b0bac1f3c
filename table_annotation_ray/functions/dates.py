"""Date comparison helpers (`annot_scripts/utils.py:49-63`).

dateutil is available in this environment, so parsing matches the
reference's `dateutil.parser.parse` behavior directly.
"""

from __future__ import annotations

import operator as _op
import unicodedata
from functools import lru_cache

from dateutil.parser import parse as _parse

__all__ = ["date_similarity", "get_year_from_date", "dates_equal", "split_period"]


@lru_cache(maxsize=65536)
def _parse_cached(s: str):
    """Memoized dateutil parse; None on failure (failures cache too —
    date strings repeat per candidate × row, and dateutil dominates the
    annotator profile without this)."""
    try:
        return _parse(s)
    except Exception:
        return None


def date_similarity(s1, s2, op=_op.eq) -> bool:
    """True when both strings parse as dates and ``op`` holds
    (utils.py:49-56)."""
    d1, d2 = _parse_cached(str(s1)), _parse_cached(str(s2))
    if d1 is None or d2 is None:
        return False
    try:
        return bool(op(d1, d2))
    except Exception:
        return False


def dates_equal(s1, s2) -> bool:
    return date_similarity(s1, s2, _op.eq)


def get_year_from_date(d):
    """Year (as str) of a parseable date, else False (utils.py:58-63)."""
    parsed = _parse_cached(str(d))
    return str(parsed.year) if parsed is not None else False


def split_period(cell: str) -> list[str]:
    """Split a '[a-b]'-style period cell into its two endpoints,
    normalizing bracket chars and unicode dashes
    (annotation_models.py:612-618 semantics; unidecode replaced by a
    targeted dash normalization)."""
    s = cell.replace("[", "").replace("]", "").replace("(", "").replace(")", "")
    s = "".join(
        "-" if unicodedata.category(ch) == "Pd" else ch for ch in s
    )
    return s.split("-")
