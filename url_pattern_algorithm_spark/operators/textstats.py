"""Text analysis for the training-data pipeline: language ID, quality
scoring, token counting — all JVM-side expressions except the n-gram
language profiler, which is a vectorized pandas UDF over character
trigram profiles (no per-row Python at the Spark boundary).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Character-trigram profiles per language, derived from small public
# pangram/stopword seed text. Deliberately tiny: the operator contract is
# deterministic scoring, not SOTA accuracy.
_SEED_TEXT = {
    "en": "the quick brown fox jumps over the lazy dog and this is that "
          "with for not you all have new more will one would there their",
    "de": "der die das und ist nicht ein eine mit fuer auch auf werden "
          "sich des dem den einer einem haben wird sind oder aber wenn",
    "fr": "le la les des une est pas pour que qui dans avec sur ne se "
          "plus par il elle nous vous sont cette mais tout comme aussi",
    "es": "el la los las una es no para que en con por del se mas este "
          "esta son pero todo como tambien muy cuando hay sin sobre entre",
    "zh": "de shi bu le wo you he ta zhe ge men zai ni hao ma shang xia "
          "zhong guo ren da xiao duo shao hen dou hui neng yao mei",
}


def _trigram_profile(text: str, top: int = 200) -> dict[str, float]:
    s = f"  {text.lower()}  "
    grams = Counter(s[i : i + 3] for i in range(len(s) - 2))
    total = sum(grams.values()) or 1
    return {g: c / total for g, c in grams.most_common(top)}


_PROFILES = {lang: _trigram_profile(t) for lang, t in _SEED_TEXT.items()}
_LANGS = sorted(_PROFILES)


def detect_lang(text: str) -> tuple[str, float]:
    """Best language by trigram-profile cosine; ties break alphabetically.
    Returns (lang, score). Empty/short text -> ('und', 0.0)."""
    if not text or len(text) < 6:
        return "und", 0.0
    doc = _trigram_profile(text)
    dn = math.sqrt(sum(v * v for v in doc.values())) or 1.0
    best, best_s = "und", 0.0
    for lang in _LANGS:
        prof = _PROFILES[lang]
        num = sum(v * prof.get(g, 0.0) for g, v in doc.items())
        pn = math.sqrt(sum(v * v for v in prof.values())) or 1.0
        s = num / (dn * pn)
        if s > best_s:
            best, best_s = lang, s
    return best, best_s


from pyspark.sql.types import (  # noqa: E402
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_LID_SCHEMA = StructType(
    [StructField("lang", StringType()), StructField("score", DoubleType())]
)


@pandas_udf(_LID_SCHEMA)
def detect_lang_udf(texts: pd.Series) -> pd.DataFrame:
    out = [detect_lang(t) for t in texts]
    return pd.DataFrame({"lang": [o[0] for o in out],
                         "score": [o[1] for o in out]})


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+ (lang_pred, lang_score) columns via the trigram profiler."""
    r = docs.withColumn("_lid", detect_lang_udf(F.col(text_col)))
    return r.withColumn("lang_pred", F.col("_lid.lang")).withColumn(
        "lang_score", F.round(F.col("_lid.score"), 6)
    ).drop("_lid")


STOPWORDS = ("the", "a", "of", "and", "to")


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+ (n_tokens, stopword_ratio, mean_token_len, quality_score) — pure
    codegen expressions (split/filter/length), no Python."""
    words = F.split(F.col(text_col), " ")
    n_tok = F.size(words)
    stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = stop / n_tok
    mean_len = (F.length(text_col) - (n_tok - 1)) / n_tok
    score = (
        0.3 * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + 0.4 * (1 - stop_ratio)
        + 0.3 * F.least(F.lit(1.0), mean_len / F.lit(6.0))
    )
    return (
        docs.withColumn("n_tokens", n_tok)
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("mean_token_len", F.round(mean_len, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


# BPE-ish token estimate: whitespace words further split on case/digit
# boundaries and chunked to <=4 chars — a deterministic stand-in for a real
# tokenizer's token count (cheap, pure regexp).
_BPE_SPLIT = r"(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\d)|(?<=\d)(?=[A-Za-z])"


def token_count_bpeish(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+ token_count: ceil(len/4) summed over case/digit-split word pieces."""
    words = F.split(F.col(text_col), r"\s+")
    pieces = F.flatten(F.transform(words, lambda w: F.split(w, _BPE_SPLIT)))
    counts = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.ceil(F.length(p) / 4.0).cast("long"),
    )
    return docs.withColumn("token_count", counts)
