"""Canonical (sorted) URL serialization — the reference's normalized URL form.

Parity with ``CalculateUtil.getSortedUrl`` (/root/reference/CalculateUtil.java:411-430):
tokenize with the light tokenizer, sort keys with the path-first comparator
(CalculateUtil.java:386-406), re-serialize as ``http:/`` + ``/value`` for path
keys, ``?k=v`` for the first non-path key, ``&k=v`` after
(CalculateUtil.java:571-599). The output always begins ``http:/`` (single
slash, protocol discarded) — reproduced verbatim because every regex match and
URL-seen-set equality in the system runs against this form.
"""

from __future__ import annotations

import functools
import re

from url_pattern_algorithm_spark.kernel.tokenize import first_value, tokenize_light

# path\d+ or path\d+#\d# — full match (CalculateUtil.java:369-382)
_PATH_KEY_RE = re.compile(r"^path(\d+|\d+#\d#)$")


def is_path_key(key: str) -> bool:
    """checkKeystartWithPath (CalculateUtil.java:369-382)."""
    return key.startswith("path") and _PATH_KEY_RE.match(key) is not None


def _cmp(a: str, b: str) -> int:
    """Path-first comparator (CalculateUtil.java:391-403).

    Path-shaped keys sort before all others; ties break by Java
    ``String.compareTo`` (plain lexicographic by code unit — so ``path10``
    sorts before ``path2``, reproduced deliberately).
    """
    pa, pb = is_path_key(a), is_path_key(b)
    if pa and not pb:
        return -1
    if pb and not pa:
        return 1
    return -1 if a < b else (1 if a > b else 0)


def sort_keys(keys: list[str]) -> list[str]:
    """sortList (CalculateUtil.java:386-406). Stable, like Arrays.sort.

    Key-function form of the path-first comparator: (path?0:1, key) orders
    identically to _cmp (ASCII lexicographic == Java compareTo here) but
    avoids 2n·log n comparator calls."""
    return sorted(keys, key=lambda k: (0 if is_path_key(k) else 1, k))


def check_flag(previous_key: str | None, key: str) -> int:
    """0 = '/value', 1 = '?k=v', 2 = '&k=v' (CalculateUtil.java:588-599).

    Uses a bare ``startswith('path')`` test (not the full path-key regex) —
    faithful to the reference.
    """
    if key.startswith("path"):
        return 0
    if previous_key is not None and previous_key.startswith("path"):
        return 1
    return 2


def standard_key_value(key: str, value: str | None, flag: int) -> str:
    """getStandardKeyValueStr (CalculateUtil.java:571-582).

    Java string concatenation renders null as 'null'; we mirror that for
    byte-parity of rewrite outputs.
    """
    v = "null" if value is None else value
    if flag == 0:
        return "/" + v
    if flag == 1:
        return "?" + key + "=" + v
    return "&" + key + "=" + v


def canonical_url(url: str) -> str:
    """getSortedUrl (CalculateUtil.java:411-430).

    Duplicate keys appear once per occurrence in the sorted key list and each
    occurrence re-emits the *first* pair's value, exactly like the reference's
    ``getValueOfTheKeyInOneUrl`` lookup inside the serialization loop.
    """
    pairs = tokenize_light(url)
    keys = sort_keys([k for k, _ in pairs])
    first: dict[str, str] = {}
    for k, v in pairs:
        if k not in first:
            first[k] = v
    parts = ["http:/"]
    prev = None
    for key in keys:
        flag = check_flag(prev, key)
        parts.append(standard_key_value(key, first.get(key), flag))
        prev = key
    return "".join(parts)
