"""Golden tests for the trivial/salient judge and entropy kernels
(CalculateUtil.java:94-194, 197-252)."""

import math

from url_pattern_algorithm_spark.kernel.classify import (
    entropy_from_histogram,
    entropy_per_key,
    fold_value_hash,
    fold_value_letters,
    judge_trivial,
    mosted_key_no_split,
    mosted_keys,
    value_histogram,
)


def test_folds():
    assert fold_value_letters("#page$12#") == "page"
    assert fold_value_letters("123") == "\\d*"
    assert fold_value_letters("abc") == "abc"
    assert fold_value_hash("#page$12#") == "#page#"
    assert fold_value_hash("abc") == "abc"


def test_judge_single_value_salient():
    # length==1 -> salient (CalculateUtil.java:113-116)
    assert judge_trivial({"a": 5}) == {"a": False}


def test_judge_all_equal_trivial():
    # all counts equal -> all trivial (CalculateUtil.java:117-122)
    assert judge_trivial({"a": 7, "b": 7, "c": 7}) == {"a": True, "b": True, "c": True}


def test_judge_two_values():
    # 9x rule (CalculateUtil.java:127-149): counts 4 / 36 -> larger salient
    assert judge_trivial({"a": 4, "b": 36}) == {"a": True, "b": False}
    # counts 4 / 20 -> 20 < 36 not 9x, and 20 <= 30 override -> trivial
    assert judge_trivial({"a": 4, "b": 20}) == {"a": True, "b": True}
    # counts 40 / 45: not 9x -> b trivial; but overrides: neither >=50 nor
    # <=30 -> a stays trivial (initial), b stays trivial (9x rule result)
    assert judge_trivial({"a": 40, "b": 45}) == {"a": True, "b": True}
    # counts 60 / 61: >=50 overrides make both salient
    assert judge_trivial({"a": 60, "b": 61}) == {"a": False, "b": False}


def test_judge_three_values_log_gap():
    # F4 H-trivial-tail: [200, 180, 3, 2, 1] -> asc [1,2,3,180,200]; largest
    # log-gap at 3->180 -> salient from 180 up; overrides: <30 trivial for
    # 1,2,3; >50 salient for 180,200
    got = judge_trivial({"v200": 200, "v180": 180, "x": 3, "y": 2, "z": 1})
    assert got == {"v200": False, "v180": False, "x": True, "y": True, "z": True}


def test_judge_salient_override_50():
    # F4 H-entropy: counts 60/55/52 all > 50 -> all salient regardless of gaps
    got = judge_trivial({"a": 60, "b": 55, "c": 52})
    assert got == {"a": False, "b": False, "c": False}


def test_judge_ratio_ladder():
    # counts [35, 35, 40]: no count >50 or <30; sum=110 > 100 and 40/110>0.2
    # -> 40 salient; 35/110 = 0.318 > 0.2 -> salient too
    got = judge_trivial({"a": 35, "b": 35, "c": 40})
    assert got == {"a": False, "b": False, "c": False}
    # counts [31, 32, 300]: gap at 32->300; 31,32 in (30,50] no-override zone,
    # sum=363 not >500, 31/363=0.085 < 0.15 -> stay trivial; 300 salient
    got = judge_trivial({"a": 31, "b": 32, "c": 300})
    assert got == {"a": True, "b": True, "c": False}


def test_entropy():
    # denominator is the url-list size, not the histogram sum
    # (CalculateUtil.java:205)
    h = {"a": 2, "b": 2}
    assert math.isclose(entropy_from_histogram(h, 4), 1.0)
    # constant value -> zero entropy
    assert entropy_from_histogram({"a": 8}, 8) == 0.0


def test_mosted_keys_and_entropy_per_key():
    urls = [[("k", "a"), ("q", str(i))] for i in range(10)]
    urls += [[("k", "b")] for _ in range(10)]
    # k in 20/20 urls -> kept; q in 10/20 -> dropped (<=0.9)
    assert mosted_keys(urls) == ["k"]
    ent = entropy_per_key(urls, [])
    assert set(ent) == {"k"}
    assert math.isclose(ent["k"], 1.0)  # 10/10 split of a,b over 20 urls


def test_mosted_key_no_split():
    urls = [[("a", "1")]] * 60 + [[("b", "2")]] * 40
    # a has max count 60, 60/100 > 0.5 -> a
    assert mosted_key_no_split(urls, []) == "a"
    # with a done, b has 40/100 < 0.5 and 40 < 100 abs -> None
    assert mosted_key_no_split(urls, ["a"]) is None
    # absolute >100 wins even at low support
    urls = [[("a", "1")]] * 101 + [[("b", "2")]] * 300
    assert mosted_key_no_split(urls, ["b"]) == "a"


def test_value_histogram_folds():
    urls = [
        [("k", "#page$1#")],
        [("k", "#page$2#")],
        [("k", "77")],
        [("k", "88")],
        [("k", "abc")],
    ]
    assert value_histogram(urls, "k") == {"page": 2, "\\d*": 2, "abc": 1}
