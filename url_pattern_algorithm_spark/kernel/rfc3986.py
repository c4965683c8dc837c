"""RFC-3986 canonicalization + session-id stripping (rebuild-only layer).

The reference does none of this explicitly (its only RFC-touching step is the
``java.net.URL`` host parse, ProcessedUrl.java:90-91). The north star demands
RFC-3986 canonicalization — case-folding scheme/host, percent-encoding
normalization, dot-segment removal — plus session-id stripping and param
sorting. This module is a *separate, composable stage layered in front of* the
reference-parity :mod:`canonical` serializer, which stays bit-compatible.

Frontier pipeline order:  raw url -> strip_session_ids -> rfc3986_normalize
-> kernel.canonical.canonical_url -> xxhash64 seen-key.
"""

from __future__ import annotations

import re

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# path-parameter session ids: ';jsessionid=...' (case-insensitive)
_PATH_SESSION_RE = re.compile(r";jsessionid=[^/?#&]*", re.IGNORECASE)
# query-parameter session ids
_SESSION_PARAMS = {
    "jsessionid",
    "phpsessid",
    "sessionid",
    "session_id",
    "session",
    "sid",
    "aspsessionid",
    "cfid",
    "cftoken",
    "zenid",
}

_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _normalize_percent(s: str) -> str:
    """Decode unreserved %XX triplets; uppercase the hex of the rest."""
    if "%" not in s:
        return s

    def repl(m: re.Match[str]) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if "." not in path:
        return path
    out: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1) if buf.startswith("/") else buf.find("/")
            if i == -1:
                out.append(buf)
                buf = ""
            else:
                out.append(buf[:i])
                buf = buf[i:]
    return "".join(out)


def _split_url(url: str) -> tuple[str, str, str, str, str] | None:
    """-> (scheme, authority, path, query, fragment) or None if no scheme."""
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$", url)
    if m is None:
        return None
    scheme, auth, path, query, frag = m.groups()
    return scheme, auth, path, query if query is not None else "", frag if frag is not None else ""


def rfc3986_normalize(url: str) -> str:
    """Syntax-based normalization (RFC 3986 §6.2.2) + default-port removal.

    - scheme and host lowercased;
    - percent-encoding normalized (decode unreserved, uppercase hex);
    - dot-segments removed from the path; empty path becomes '/';
    - default port dropped; fragment dropped (crawl identity ignores it).

    URLs without a ``scheme://`` part are returned unchanged.
    """
    parts = _split_url(url.strip())
    if parts is None:
        return url.strip()
    scheme, auth, path, query, _frag = parts
    scheme = scheme.lower()
    userinfo = ""
    hostport = auth
    at = auth.rfind("@")
    if at != -1:
        userinfo, hostport = auth[: at + 1], auth[at + 1 :]
    host, port = hostport, ""
    colon = hostport.rfind(":")
    if colon != -1 and "]" not in hostport[colon:]:
        host, port = hostport[:colon], hostport[colon + 1 :]
    host = host.lower()
    if port and port != _DEFAULT_PORTS.get(scheme, ""):
        host = host + ":" + port
    path = _normalize_percent(remove_dot_segments(path)) or "/"
    query = _normalize_percent(query)
    out = f"{scheme}://{userinfo}{host}{path}"
    if query:
        out += "?" + query
    return out


def strip_session_ids(url: str) -> str:
    """Drop session-id path params and query params (north-star requirement).

    ``/a;jsessionid=ABC?PHPSESSID=x&id=7`` -> ``/a?id=7``. Query-param names
    are matched case-insensitively against a fixed public list.
    """
    if ";" in url:
        url = _PATH_SESSION_RE.sub("", url)
    qpos = url.find("?")
    if qpos == -1:
        return url
    frag = ""
    rest = url[qpos + 1 :]
    fpos = rest.find("#")
    if fpos != -1:
        frag, rest = rest[fpos:], rest[:fpos]
    kept = [
        p
        for p in rest.split("&")
        if p and p.split("=", 1)[0].lower() not in _SESSION_PARAMS
    ]
    base = url[:qpos]
    return base + ("?" + "&".join(kept) if kept else "") + frag


def normalize_frontier_url(url: str) -> str | None:
    """The full frontier normalization chain with its skip rules, in ONE
    place (used by normalize_url_udf, the fused extract+normalize link UDF,
    and the pure-python crawl oracle — they MUST agree bit-for-bit):

    strip_session_ids -> rfc3986_normalize -> canonical_url, or None when
    - the host parse fails (reference rule: ProcessedUrl.java:90-96), or
    - the host is a bracketed (IPv6) literal: the reference's light
      tokenizer splits on ':' and cannot represent such authorities, so no
      canonical fixpoint exists for them (property-tested; the 2014
      reference predates IPv6 crawling).
    """
    # lazy module-level cache: canonical/tokenize import this module, so a
    # top-level import would be circular — but this function runs once per
    # extracted link (millions/iteration), so resolve the callees once
    global _canonical_url, _get_host
    if _canonical_url is None:
        from url_pattern_algorithm_spark.kernel.canonical import canonical_url
        from url_pattern_algorithm_spark.kernel.tokenize import get_host

        _canonical_url, _get_host = canonical_url, get_host

    host = _get_host(url)
    if host is None or host.startswith("["):
        return None
    return _canonical_url(rfc3986_normalize(strip_session_ids(url)))


_canonical_url = None
_get_host = None
