"""URL -> ordered key:value decomposition, bit-compatible with the reference.

Two tokenizers (both required — they feed different consumers):

- :func:`tokenize_full`  — parity with ``ProcessedUrl.getKeyValuePairsFromUrl``
  (/root/reference/ProcessedUrl.java:85-190): split on the 7-char class
  ``:/?&.-_`` with position tracking so ``.``/``-``/``_``-separated tokens get
  marker-suffixed keys, and ``letters+digits`` values are re-encoded as
  ``#letters$digits#``.
- :func:`tokenize_light` — parity with ``ProcessedUrl1.getKeyValuePairsFromUrl``
  (/root/reference/ProcessedUrl1.java:80-120): split on ``:/?&`` only, skip the
  protocol token, no sub-splitting, no value re-encoding. Feeds the canonical
  sorted-URL serializer.

Both return an ordered ``list[(key, value)]``; duplicates are preserved in
order (downstream lookups take the *first* occurrence, mirroring
``ProcessedUrl.getValueOfTheKeyInOneUrl``, ProcessedUrl.java:200-207).
"""

from __future__ import annotations

import re

# ^([^\d]+)(\d+)$ — letters(non-digits)+digits value form (ProcessedUrl.java:138)
_LETTERS_DIGITS_RE = re.compile(r"^([^\d]+)(\d+)$")

_FULL_DELIMS_RE = re.compile(r"[:/?&.\-_]+")  # ProcessedUrl.java:100
_LIGHT_DELIMS_RE = re.compile(r"[:/?&]+")  # ProcessedUrl1.java:83
_FULL_DELIMS = _FULL_DELIMS_RE  # back-compat aliases for callers
_LIGHT_DELIMS = _LIGHT_DELIMS_RE


def _split_on(s: str, delims: re.Pattern) -> list[str]:
    """StringUtils.split semantics: split on any delimiter char, drop
    empties. Splitting on delimiter RUNS + dropping empty edge tokens is
    equivalent and runs in C."""
    return [t for t in delims.split(s) if t]


def get_host(url: str) -> str | None:
    """Host component per ``java.net.URL.getHost()`` for http(s) URLs.

    Reference usage: ProcessedUrl.java:90-96. Returns None when the URL has no
    ``scheme://`` part (the Java code throws MalformedURLException and leaves
    the pair list null; callers skip such URLs).
    Java does NOT lowercase the host; neither do we.
    """
    i = url.find("://")
    if i < 0:
        return None
    rest = url[i + 3 :]
    # authority ends at first '/', '?' or '#'
    end = len(rest)
    for ch in "/?#":
        j = rest.find(ch)
        if j != -1 and j < end:
            end = j
    authority = rest[:end]
    # strip userinfo
    at = authority.rfind("@")
    if at != -1:
        authority = authority[at + 1 :]
    # bracketed IPv6 authority: host is '[...]' with brackets, like
    # java.net.URL.getHost(); the ':port' (if any) follows the ']'.
    # An unclosed bracket is malformed (java.net.URL throws) -> None.
    if authority.startswith("["):
        close = authority.find("]")
        if close == -1:
            return None
        return authority[: close + 1]
    # strip port; a non-numeric port is malformed (java.net.URL throws
    # NumberFormatException for 'http://h:.:80/' — None matches the
    # caller-skips-URL behavior)
    colon = authority.find(":")
    if colon != -1:
        port = authority[colon + 1 :]
        if port and not (port.isascii() and port.isdigit()):
            return None
        authority = authority[:colon]
    # empty host ('http:///x') and hosts containing tokenizer delimiters
    # ('&'/'='; RFC 3986 technically permits sub-delims in reg-names):
    # java.net.URL returns them verbatim; we treat them as malformed (None).
    # Such hosts are useless as frontier keys and their canonical form would
    # not be a normalization fixpoint — the light tokenizer would split the
    # host apart (documented divergence; pinned by tests/test_properties.py)
    if not authority or "&" in authority or "=" in authority:
        return None
    return authority


def _encode_value(component: str) -> str:
    """letters+digits -> '#letters$digits#' (ProcessedUrl.java:138-146)."""
    m = _LETTERS_DIGITS_RE.match(component)
    if m is None:
        return component
    return "#" + m.group(1) + "$" + m.group(2) + "#"


def tokenize_full(url: str) -> list[tuple[str, str]] | None:
    """Full tokenizer, parity with ProcessedUrl.java:85-190.

    Returns None for URLs without a parsable host (Java: MalformedURLException).

    Semantics reproduced exactly, including the quirks:
    - position tracking consumes ``left_url`` one token + one delimiter char at
      a time (ProcessedUrl.java:183), so repeated tokens resolve to their first
      remaining occurrence — and a token that occurs earlier as a substring
      *misaligns* the cursor exactly as the Java does;
    - ``.``/``-``/``_``-preceded path tokens get ``#1#``/``#2#``/``#3#`` marker
      keys; when the previous key is a query key the marker carries a repeat
      counter (``lastKey#1<t>#``, ProcessedUrl.java:118-133);
    - ``lastKeyStr`` is only updated by plain path tokens and query tokens,
      not by marker-suffixed tokens (ProcessedUrl.java:136,180);
    - query token split drops empty parts, so ``k==v`` still parses as (k, v)
      while ``k=`` / ``=v`` fall back to pathN keys (ProcessedUrl.java:151-174).
    """
    host = get_host(url)
    if host is None:
        return None
    pairs: list[tuple[str, str]] = [("path0", host)]
    path_num = 1
    idx = url.find(host)
    left = url[idx + len(host) :]
    last_key = ""
    counter: dict[str, int] = {}
    for comp in _split_on(left, _FULL_DELIMS):
        if comp == "":
            continue
        if "=" not in comp:
            # path-style token (ProcessedUrl.java:109-147)
            cidx = left.find(comp)
            temp = counter.get(last_key, 0) + 1
            counter[last_key] = temp
            prev = left[cidx - 1] if cidx >= 1 else ""
            if prev == ".":
                if last_key is not None and not last_key.startswith("path"):
                    key = f"{last_key}#1{temp}#"
                else:
                    key = f"path{path_num}#1#"
            elif prev == "-":
                if last_key is not None and not last_key.startswith("path"):
                    key = f"{last_key}#2{temp}#"
                else:
                    key = f"path{path_num}#2#"
            elif prev == "_":
                if last_key is not None and not last_key.startswith("path"):
                    key = f"{last_key}#3{temp}#"
                else:
                    key = f"path{path_num}#3#"
            else:
                key = f"path{path_num}"
                last_key = key
            value = _encode_value(comp)
            path_num += 1
            pairs.append((key, value))
        else:
            # query-style token (ProcessedUrl.java:148-181)
            s = [p for p in comp.split("=") if p != ""]
            if len(s) == 2:
                key, value = s[0], s[1]
            else:
                cidx = left.find(comp)
                prev = left[cidx - 1] if cidx >= 1 else ""
                if prev == ".":
                    key = f"path{path_num}#"
                else:
                    key = f"path{path_num}"
                value = _encode_value(comp)
                path_num += 1
            last_key = key
            pairs.append((key, value))
        left = left[len(comp) + 1 :]
    return pairs


def tokenize_light(url: str) -> list[tuple[str, str]]:
    """Light tokenizer, parity with ProcessedUrl1.java:80-120.

    Splits the whole URL (protocol included) on ``:/?&``, skips the first
    token (the protocol name), keeps path tokens as ``pathN`` and well-formed
    ``k=v`` query tokens as-is. Never fails: no host parse involved — the host
    simply becomes ``path0``.
    """
    pairs: list[tuple[str, str]] = []
    path_num = 0
    first = True
    for comp in _split_on(url, _LIGHT_DELIMS):
        if comp == "":
            continue
        if first:
            first = False
            continue
        if "=" not in comp:
            pairs.append((f"path{path_num}", comp))
            path_num += 1
        else:
            s = [p for p in comp.split("=") if p != ""]
            if len(s) == 2:
                pairs.append((s[0], s[1]))
            else:
                pairs.append((f"path{path_num}", comp))
                path_num += 1
    return pairs


def first_value(pairs: list[tuple[str, str]], key: str) -> str | None:
    """Value of the first pair with ``key`` (ProcessedUrl.java:200-207)."""
    for k, v in pairs:
        if k == key:
            return v
    return None
