"""String feature extraction (SURVEY.md §2.7 F1–F3).

Reference behaviours covered:

- F1 ``regexp_extract``: parenthesized description ``^[^(]*\\(([^)]*)\\).*$``
  and in/out direction ``^net\\.if\\.([^\\[]+)\\[.*$``
  (``Processing Data.py:152-153,156-157``).
- F2 ``substring_index(name, ':', 1)`` (``Processing Data.py:158``).
- F3 ``concat(a,' - ',b,' - ',c)`` composite display key
  (``Processing Data.py:160``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: `Processing Data.py:152` — text inside the first (...) group.
PAREN_DESC_PATTERN = r"^[^(]*\(([^)]*)\).*$"


def paren_description(col: Column | str, pattern: str = PAREN_DESC_PATTERN) -> Column:
    """Extract the parenthesized description (empty string if absent)."""
    return F.regexp_extract(col, pattern, 1)


def direction_from_key(col: Column | str, pattern: str = r"^net\.if\.([^\[]+)\[.*$") -> Column:
    """Extract the in/out direction token from an item key."""
    return F.regexp_extract(col, pattern, 1)


def prefix_before(col: Column | str, delim: str = ":") -> Column:
    """Text before the first delimiter (``substring_index(name,':',1)``)."""
    return F.substring_index(col, delim, 1)


def composite_key(*cols: Column | str, sep: str = " - ") -> Column:
    """``concat_ws(' - ', …)`` composite display key."""
    return F.concat_ws(sep, *cols)
