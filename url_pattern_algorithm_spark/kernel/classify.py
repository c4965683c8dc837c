"""Statistics kernels: value folding, histograms, entropy, trivial/salient.

Parity targets:
- value folds            — ProcessedUrl.java:210-245,301-322; CalculateUtil.java:230-235
- entropy                — CalculateUtil.java:197-252
- mosted keys (>90%)     — CalculateUtil.java:432-490
- mosted key (>99%)      — CalculateUtil.java:492-527
- no-split key (>100 abs or >50%) — CalculateUtil.java:528-566
- trivial/salient judge  — CalculateUtil.java:94-194

Determinism note: the Java code iterates HashMap/HashSet key sets whose order
is unspecified. The rebuild defines deterministic total orders everywhere
(documented per function); this is the divergence called out in SURVEY.md §7.
"""

from __future__ import annotations

import math
import re

from url_pattern_algorithm_spark.kernel.tokenize import first_value

Pairs = list[tuple[str, str]]

_ALL_DIGITS_RE = re.compile(r"^\d+$")


def fold_value_letters(value: str) -> str:
    """'#letters$digits#' -> 'letters'; then all-digits -> '\\\\d*'.

    The fold used for histograms/partitioning (ProcessedUrl.java:301-322,
    Fun.java:216-221, CalculateUtil.java:230-235).
    """
    if value.startswith("#") and value.endswith("#"):
        value = value[1 : value.index("$")]
    if _ALL_DIGITS_RE.match(value):
        return "\\d*"
    return value


def fold_value_hash(value: str) -> str:
    """'#letters$digits#' -> '#letters#' (ProcessedUrl.java:210-229).

    The fold used for distinct-value sets during pattern generation.
    """
    if value.startswith("#") and value.endswith("#"):
        return value[: value.index("$")] + "#"
    return value


def distinct_values_folded(key: str, urls: list[Pairs]) -> list[str]:
    """getValuesInTheKey (ProcessedUrl.java:210-229): distinct '#x#'-folded
    values, deterministic (first-appearance) order instead of HashSet order."""
    seen: dict[str, None] = {}
    for pairs in urls:
        v = first_value(pairs, key)
        if v is not None:
            seen.setdefault(fold_value_hash(v), None)
    return list(seen)


def distinct_values_raw(key: str, urls: list[Pairs]) -> list[str]:
    """getValuesInTheKey1 (ProcessedUrl.java:231-245): distinct raw values."""
    seen: dict[str, None] = {}
    for pairs in urls:
        v = first_value(pairs, key)
        if v is not None:
            seen.setdefault(v, None)
    return list(seen)


def value_histogram(urls: list[Pairs], key: str) -> dict[str, int]:
    """getValuesAndTimesMapForOneKey (ProcessedUrl.java:301-322): counts of
    letters-folded values. Insertion-ordered dict = deterministic."""
    hist: dict[str, int] = {}
    for pairs in urls:
        v = first_value(pairs, key)
        if v is None:
            continue
        v = fold_value_letters(v)
        hist[v] = hist.get(v, 0) + 1
    return hist


def all_keys(urls: list[Pairs]) -> list[str]:
    """getKeysFromUrls (ProcessedUrl.java:338-351), first-appearance order."""
    seen: dict[str, None] = {}
    for pairs in urls:
        for k, _ in pairs:
            seen.setdefault(k, None)
    return list(seen)


def common_keys(urls: list[Pairs], key_done: list[str] | None) -> list[str]:
    """getCommonKeysFromUrls (ProcessedUrl.java:353-382): keys present in
    every URL, minus the done list."""
    keys = all_keys(urls)
    out = []
    for k in keys:
        if all(first_value(pairs, k) is not None for pairs in urls):
            out.append(k)
    if key_done:
        out = [k for k in out if k not in key_done]
    return out


def mosted_keys(urls: list[Pairs], no_use: list[str] | None = None) -> list[str]:
    """getMostedKeysList (CalculateUtil.java:432-490): keys whose *pair count*
    exceeds 0.9 × |urls| (duplicate pairs in one URL count multiply — faithful).
    Empty input yields [] (Java's /0.0 -> Infinity never crashes there)."""
    if not urls:
        return []
    n = float(len(urls))
    counts: dict[str, int] = {}
    for pairs in urls:
        for k, _ in pairs:
            if no_use and k in no_use:
                continue
            counts[k] = counts.get(k, 0) + 1
    return [k for k, c in counts.items() if c / n > 0.9]


def mosted_key_no_split(urls: list[Pairs], no_use: list[str]) -> str | None:
    """getMostedKeyForNoSplitKey (CalculateUtil.java:528-566): argmax-count key,
    returned if count>100 absolute or support>0.5. First max wins (strict >),
    over deterministic first-appearance order."""
    if not urls:
        return None
    n = float(len(urls))
    counts: dict[str, int] = {}
    for pairs in urls:
        for k, _ in pairs:
            if k in no_use:
                continue
            counts[k] = counts.get(k, 0) + 1
    max_times, max_key = -1, None
    for k, c in counts.items():
        if c > max_times:
            max_times, max_key = c, k
    if max_times > 100:
        return max_key
    if max_times / n > 0.5:
        return max_key
    return None


def entropy_from_histogram(hist: dict[str, int], size: int) -> float:
    """getEntropyFromValuesMap (CalculateUtil.java:197-209). Note: the
    denominator is the URL-list size, not the histogram total — keys missing
    from some URLs yield probabilities summing below 1 (faithful)."""
    result = 0.0
    for c in hist.values():
        p = c / float(size)
        result += -p * (math.log(p) / math.log(2))
    return result


def entropy_per_key(urls: list[Pairs], key_done: list[str]) -> dict[str, float]:
    """calculateEntropyForEachKey (CalculateUtil.java:212-252): entropy of the
    letters-folded value distribution for every >90%-support non-done key."""
    out: dict[str, float] = {}
    for key in mosted_keys(urls, key_done):
        out[key] = entropy_from_histogram(value_histogram(urls, key), len(urls))
    return out


def judge_trivial(hist: dict[str, int]) -> dict[str, bool]:
    """judgeValuesIsTrivialOrNot (CalculateUtil.java:94-194).

    Returns value -> is_trivial. Sort order: count ascending, ties by value
    (the Java bubble sort is stable over nondeterministic HashMap order; we
    substitute a deterministic tiebreak).

    - 1 value            -> salient (CalculateUtil.java:113-116)
    - all counts equal   -> all trivial (:117-122)
    - 2 values           -> smaller trivial; larger salient iff >= 9× smaller;
                            then per-value overrides >=50 -> salient,
                            <=30 -> trivial (:127-149)
    - >=3 values         -> largest log-gap in the ascending count sequence
                            splits trivial (below) / salient (at and above)
                            (:152-176); then per-value overrides: <30 trivial;
                            >50 salient; elif ratio ladder 0.1@sum>500 /
                            0.15@sum>200 / 0.2@sum>100 / 0.3@sum>50 (:177-192)
    """
    items = sorted(hist.items(), key=lambda kv: (kv[1], kv[0]))
    values = [v for v, _ in items]
    times = [c for _, c in items]
    length = len(items)
    if length == 1:
        return {values[0]: False}
    if all(t == times[0] for t in times):
        return {v: True for v in values}
    total = sum(times)
    out: dict[str, bool] = {}
    if length == 2:
        out[values[0]] = True
        out[values[1]] = not (times[1] >= times[0] * 9)  # salient iff >= 9x
        if times[0] >= 50:
            out[values[0]] = False
        if times[0] <= 30:
            out[values[0]] = True
        if times[1] >= 50:
            out[values[1]] = False
        if times[1] <= 30:
            out[values[1]] = True
        return out
    # length >= 3: first max of consecutive log-gaps (strict >, index init 0
    # but loop starts with max=-inf so index = first argmax, Java init index=0)
    max_gap = -99999999.0
    index = 0
    for i in range(1, length):
        gap = math.log(times[i]) - math.log(times[i - 1])
        if gap > max_gap:
            max_gap = gap
            index = i
    for i in range(length):
        out[values[i]] = i < index
    for i in range(length):
        t = times[i]
        if t < 30:
            out[values[i]] = True
        if t > 50:
            out[values[i]] = False
        elif total > 500 and t / total > 0.1:
            out[values[i]] = False
        elif total > 200 and t / total > 0.15:
            out[values[i]] = False
        elif total > 100 and t / total > 0.2:
            out[values[i]] = False
        elif total > 50 and t / total > 0.3:
            out[values[i]] = False
    return out
