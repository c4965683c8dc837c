"""Golden tests for canonical sorted-URL form (CalculateUtil.java:411-430)
and the RFC-3986 / session-id layers (rebuild-only, FIXTURES.md t11/t12)."""

from url_pattern_algorithm_spark.kernel.canonical import (
    canonical_url,
    is_path_key,
    sort_keys,
)
from url_pattern_algorithm_spark.kernel.rfc3986 import (
    remove_dot_segments,
    rfc3986_normalize,
    strip_session_ids,
)


def test_is_path_key():
    assert is_path_key("path0")
    assert is_path_key("path12")
    assert is_path_key("path3#1#")
    assert not is_path_key("path3#1")  # malformed marker
    assert not is_path_key("path")  # no digits
    assert not is_path_key("pathX")
    assert not is_path_key("hostID")


def test_sort_keys_path_first_lexicographic():
    # path keys first; lexicographic within each group — so path10 < path2
    # (Java String.compareTo, CalculateUtil.java:386-406)
    assert sort_keys(["b", "path2", "a", "path10"]) == ["path10", "path2", "a", "b"]


def test_canonical_t9_param_sorting():
    # t9: query params sort lexicographically after path values
    assert canonical_url("http://host.com/b?z=1&a=2") == "http://host.com/b?a=2&z=1"


def test_canonical_t10_param_order_equality():
    a = canonical_url("http://host.com/b?z=1&a=2")
    b = canonical_url("http://host.com/b?a=2&z=1")
    assert a == b


def test_canonical_output_shape():
    # protocol discarded ('http:/' prefix + '/host' = 'http://host', the
    # reference's exact concatenation, CalculateUtil.java:412,571-582); '.'
    # is not a light delimiter so 'aboutMe.do' stays one path token
    assert (
        canonical_url("https://001ye.wap.blog.163.com/w2/aboutMe.do?hostID=001ye")
        == "http://001ye.wap.blog.163.com/w2/aboutMe.do?hostID=001ye"
    )


def test_canonical_slash_question():
    # '/?' URL: no path tokens beyond host
    assert canonical_url("http://m.zhigou.com/?p=242&sort=32") == (
        "http://m.zhigou.com?p=242&sort=32"
    )


def test_canonical_duplicate_keys_take_first_value():
    # duplicate query key: both occurrences serialize the FIRST value
    # (getValueOfTheKeyInOneUrl linear scan, ProcessedUrl.java:200-207)
    assert canonical_url("http://h.com/x?a=1&a=2") == "http://h.com/x?a=1&a=1"


def test_canonical_idempotent_for_plain_urls():
    u = "http://host.com/a/b?k=v"
    once = canonical_url(u)
    # the canonical form is itself a parsable URL and a fixpoint
    assert canonical_url(once) == once


def test_dot_segments():
    assert remove_dot_segments("/a/./b") == "/a/b"
    assert remove_dot_segments("/a/../b") == "/b"
    assert remove_dot_segments("/../a") == "/a"
    assert remove_dot_segments("/a/b/../../c") == "/c"


def test_rfc3986_t11():
    assert (
        rfc3986_normalize("HTTP://HOST.com/%7Euser/../a/./b")
        == "http://host.com/a/b"
    )
    assert rfc3986_normalize("http://Host.com:80/x") == "http://host.com/x"
    assert rfc3986_normalize("https://h.com:443/") == "https://h.com/"
    assert rfc3986_normalize("http://h.com:8080/x") == "http://h.com:8080/x"
    assert rfc3986_normalize("http://h.com") == "http://h.com/"
    assert rfc3986_normalize("http://h.com/a%2Fb?x=%41") == "http://h.com/a%2Fb?x=A"


def test_rfc3986_idempotent():
    for u in [
        "HTTP://HOST.com/%7Euser/../a/./b",
        "http://h.com/a%2fb?x=%41#frag",
        "http://h.com:80/x?a=1",
    ]:
        once = rfc3986_normalize(u)
        assert rfc3986_normalize(once) == once


def test_strip_session_ids_t12():
    assert (
        strip_session_ids("http://host.com/a;jsessionid=ABC123?PHPSESSID=x&id=7")
        == "http://host.com/a?id=7"
    )
    assert strip_session_ids("http://h.com/x?sid=1") == "http://h.com/x"
    assert strip_session_ids("http://h.com/x?a=1&b=2") == "http://h.com/x?a=1&b=2"
