"""Golden tests for the two tokenizers (FIXTURES.md F3).

Expected outputs are hand-derived from the reference semantics
(ProcessedUrl.java:85-190, ProcessedUrl1.java:80-120) by executing the cited
control flow on paper; each case documents the branch it pins.
"""

from url_pattern_algorithm_spark.kernel.tokenize import (
    get_host,
    tokenize_full,
    tokenize_light,
)


def test_host_extraction():
    assert get_host("http://001ye.wap.blog.163.com/w2/a") == "001ye.wap.blog.163.com"
    assert get_host("http://host.com:8080/x") == "host.com"
    assert get_host("http://user@host.com/x") == "host.com"
    assert get_host("nohost") is None
    assert get_host("http://host.com") == "host.com"
    # bracketed IPv6 literals keep their brackets (java.net.URL.getHost)
    assert get_host("http://[::1]:8080/x") == "[::1]"
    assert get_host("http://[2001:db8::1]/x") == "[2001:db8::1]"
    # unclosed bracket = malformed (Java throws) -> None
    assert get_host("http://[::1/x") is None
    assert get_host("http://[::1") is None


def test_full_t1_dot_split_path_key():
    # t1: '.'-split token after a path key -> path3#1# (ProcessedUrl.java:118-122)
    pairs = tokenize_full("http://001ye.wap.blog.163.com/w2/aboutMe.do?hostID=001ye")
    assert pairs == [
        ("path0", "001ye.wap.blog.163.com"),
        ("path1", "#w$2#"),  # 'w2' = letters+digits -> '#w$2#'
        ("path2", "aboutMe"),
        ("path3#1#", "do"),
        ("hostID", "001ye"),
    ]


def test_full_t2_inline_main_example():
    # t2: the reference's own main() smoke URL (ProcessedUrl.java:191-197).
    # '_' chars inside the query VALUE are full-tokenizer delimiters, so the
    # value splits; first fragment parses as k=v, the rest fall back to path
    # keys with '_' markers keyed off lastKey='ifid' with repeat counters.
    pairs = tokenize_full("http://wap.gmw.cn/bj/diannao/?ifid=ganji_shouye_remen_diannao")
    assert pairs == [
        ("path0", "wap.gmw.cn"),
        ("path1", "bj"),
        ("path2", "diannao"),
        ("ifid", "ganji"),
        ("ifid#31#", "shouye"),
        ("ifid#32#", "remen"),
        ("ifid#33#", "diannao"),
    ]


def test_full_t3_query_params():
    pairs = tokenize_full("http://m.zhigou.com/?p=242&sort=32")
    assert pairs == [
        ("path0", "m.zhigou.com"),
        ("p", "242"),
        ("sort", "32"),
    ]


def test_full_t4_t5_pure_path():
    assert tokenize_full("http://m.zhigou.com/btoread/cclothing/") == [
        ("path0", "m.zhigou.com"),
        ("path1", "btoread"),
        ("path2", "cclothing"),
    ]
    assert tokenize_full("http://m.zhigou.com/btoread/csports/czhaoming/") == [
        ("path0", "m.zhigou.com"),
        ("path1", "btoread"),
        ("path2", "csports"),
        ("path3", "czhaoming"),
    ]


def test_full_t6_letters_digits_encoding():
    # 'page12' -> '#page$12#'; '.html' suffix -> path#1# marker key
    pairs = tokenize_full("http://host.com/list/page12.html")
    assert pairs == [
        ("path0", "host.com"),
        ("path1", "list"),
        ("path2", "#page$12#"),
        ("path3#1#", "html"),
    ]


def test_full_t7_marker_keys():
    # /a-b_c.d/x : 'a' plain path1; 'b' preceded by '-' after path key ->
    # path2#2#; 'c' preceded by '_' -> path3#3#; 'd' preceded by '.' ->
    # path4#1#; 'x' plain path5 (ProcessedUrl.java:118-133)
    pairs = tokenize_full("http://host.com/a-b_c.d/x")
    assert pairs == [
        ("path0", "host.com"),
        ("path1", "a"),
        ("path2#2#", "b"),
        ("path3#3#", "c"),
        ("path4#1#", "d"),
        ("path5", "x"),
    ]


def test_full_t8_malformed_query_fallback():
    # 'k=' and '=v' fall back to pathN keys; 'ok=1' is well-formed
    # (ProcessedUrl.java:155-174)
    pairs = tokenize_full("http://host.com/p?k=&=v&ok=1")
    assert pairs == [
        ("path0", "host.com"),
        ("path1", "p"),
        ("path2", "k="),
        ("path3", "=v"),
        ("ok", "1"),
    ]


def test_full_double_equals_still_parses():
    # StringUtils.split drops empty parts, so k==v -> (k, v)
    pairs = tokenize_full("http://host.com/p?k==v")
    assert pairs == [("path0", "host.com"), ("path1", "p"), ("k", "v")]


def test_full_repeated_token_position_tracking():
    # position cursor consumes one token+delimiter at a time so the second
    # 'a' is attributed to its own position (ProcessedUrl.java:183)
    pairs = tokenize_full("http://host.com/a/a")
    assert pairs == [("path0", "host.com"), ("path1", "a"), ("path2", "a")]


def test_light_tokenizer():
    # protocol token skipped; host becomes path0 (ProcessedUrl1.java:89-98)
    assert tokenize_light("http://m.zhigou.com/?p=242&sort=32") == [
        ("path0", "m.zhigou.com"),
        ("p", "242"),
        ("sort", "32"),
    ]
    # '.' is NOT a delimiter for the light tokenizer
    assert tokenize_light("http://host.com/list/page12.html") == [
        ("path0", "host.com"),
        ("path1", "list"),
        ("path2", "page12.html"),
    ]
    # malformed query falls back to pathN with the raw token as value
    assert tokenize_light("http://host.com/p?k=") == [
        ("path0", "host.com"),
        ("path1", "p"),
        ("path2", "k="),
    ]


def test_malformed_authorities_rejected():
    # garbage authorities -> None (frontier-key stability; java.net.URL
    # throws for non-numeric ports)
    assert get_host("http:///x") is None            # empty host
    assert get_host("http://&/") is None            # delimiter in host
    assert get_host("http://a=b/") is None
    assert get_host("http://h:.:80/") is None       # non-numeric port
    assert get_host("http://h:80x/") is None
