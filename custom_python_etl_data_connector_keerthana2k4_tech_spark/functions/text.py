"""Text-analysis functions for training-data pipelines (north-star ops,
SURVEY §2.3): language-ID heuristic, quality scoring, token counting,
document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen — no UDFs), each
with an exact DuckDB SQL mirror used by the oracle queries in
plans/llm_ops.py. Determinism: counts are integers; ratios are single double
divisions of identical integers — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Marker stopwords per language for the n-gram/stopword language heuristic.
#: Tiebreak precedence is the dict order (en > es > fr > de > zh).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "a", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "ist", "von", "ein"),
    "zh": ("的", "是", "了", "在", "有", "我", "不"),
}

#: English stopwords for the quality-score stopword ratio.
STOPWORDS_EN = LANG_MARKERS["en"]

TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
"""BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
Shared Java-regex/RE2 subset so Spark and DuckDB agree."""


def words(text: Column | str) -> Column:
    """Non-empty lowercase whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), " "), lambda w: w != "")


def word_count(text: Column | str) -> Column:
    return F.size(words(text))


def token_count(text: Column | str) -> Column:
    """Count of BPE-ish tokens (letters / digits / punctuation runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(TOKEN_PATTERN))


def marker_hits(text: Column | str, markers: tuple[str, ...]) -> Column:
    """How many whitespace tokens are in the marker set."""
    return F.size(F.filter(words(text), lambda w: w.isin(*markers)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language marker-stopword hits,
    dict-order precedence on ties, 'und' when no marker hits at all."""
    scores = {lang: marker_hits(text, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # Build the CASE in reverse precedence so earlier langs win ties.
    for lang in reversed(list(scores)):
        result = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(c, "[A-Za-z0-9 ]", ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_ratio(text: Column | str) -> Column:
    return marker_hits(text, STOPWORDS_EN).cast("double") / F.greatest(
        word_count(text), F.lit(1)
    ).cast("double")


def avg_word_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_nonspace = F.length(F.regexp_replace(c, " ", ""))
    return n_nonspace.cast("double") / F.greatest(word_count(text), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0, ~1]: rewards stopword
    presence and moderate word length, penalizes punctuation density and
    very short documents. Weights are fixed constants (deterministic)."""
    wc = word_count(text).cast("double")
    length_term = F.least(wc / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    wl = avg_word_len(text)
    wordlen_term = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    return (
        length_term * 0.3 + stop_term * 0.3 + punct_term * 0.2 + wordlen_term * 0.2
    )


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), " +", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.
    (Spark md5 == DuckDB md5 — both standard MD5 hex.)"""
    return F.md5(normalize_text(text).cast("binary"))


# --- DuckDB SQL mirrors (used to build oracle strings) ---------------------


def sql_words(text_expr: str) -> str:
    return f"list_filter(string_split(lower({text_expr}), ' '), w -> w <> '')"


def sql_word_count(text_expr: str) -> str:
    return f"len({sql_words(text_expr)})"


def sql_token_count(text_expr: str) -> str:
    return f"len(regexp_extract_all({text_expr}, '{TOKEN_PATTERN}'))"


def sql_marker_hits(text_expr: str, markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({sql_words(text_expr)}, w -> w IN ({in_list})))"


def sql_lang_id(text_expr: str) -> str:
    scores = {lang: sql_marker_hits(text_expr, m) for lang, m in LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    branches = "".join(
        f" WHEN ({scores[lang]}) = ({best}) AND ({best}) > 0 THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return f"CASE{branches} ELSE 'und' END"


def sql_punct_ratio(text_expr: str) -> str:
    return (
        f"CAST(length(regexp_replace({text_expr}, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)"
        f" / CAST(greatest(length({text_expr}), 1) AS DOUBLE)"
    )


def sql_stopword_ratio(text_expr: str) -> str:
    return (
        f"CAST({sql_marker_hits(text_expr, STOPWORDS_EN)} AS DOUBLE)"
        f" / CAST(greatest({sql_word_count(text_expr)}, 1) AS DOUBLE)"
    )


def sql_avg_word_len(text_expr: str) -> str:
    return (
        f"CAST(length(replace({text_expr}, ' ', '')) AS DOUBLE)"
        f" / CAST(greatest({sql_word_count(text_expr)}, 1) AS DOUBLE)"
    )


def sql_quality_score(text_expr: str) -> str:
    wc = f"CAST({sql_word_count(text_expr)} AS DOUBLE)"
    length_term = f"least({wc} / 100.0, 1.0)"
    stop_term = f"least(({sql_stopword_ratio(text_expr)}) * 5.0, 1.0)"
    punct_term = f"(1.0 - least(({sql_punct_ratio(text_expr)}) * 4.0, 1.0))"
    wl = sql_avg_word_len(text_expr)
    wordlen_term = f"(CASE WHEN ({wl}) >= 3.0 AND ({wl}) <= 10.0 THEN 1.0 ELSE 0.5 END)"
    return (
        f"({length_term} * 0.3 + {stop_term} * 0.3 + {punct_term} * 0.2"
        f" + {wordlen_term} * 0.2)"
    )


def sql_normalize_text(text_expr: str) -> str:
    return f"trim(regexp_replace(lower({text_expr}), ' +', ' ', 'g'))"


def sql_fingerprint(text_expr: str) -> str:
    return f"md5({sql_normalize_text(text_expr)})"


_RH_BASE = 131
_RH_MOD = 1_000_000_007


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash (Rabin-Karp) of the normalized text:
    ``h = (h * 131 + codepoint) mod 1e9+7`` folded over every character.

    One narrow higher-order-function pass — no UDF, no shuffle. Unlike the
    md5 fingerprint this is incrementally maintainable (append = a few
    multiply-adds), the property rolling hashes exist for. Empty-string
    guard keeps Java's trailing-empty split artifact out of the fold so the
    DuckDB mirror matches exactly.
    """
    c = F.col(text) if isinstance(text, str) else text
    chars = F.filter(F.split(normalize_text(c), ""), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * _RH_BASE + F.ascii(ch)) % _RH_MOD,
    )


def sql_rolling_fingerprint(text_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({sql_normalize_text(text_expr)}, ''), "
        f"c -> CAST(ord(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {_RH_BASE} + x) % {_RH_MOD})"
    )


def hex_hash60(s: Column | str) -> Column:
    """Cross-engine 60-bit hash of a string: the first 15 hex digits of
    md5, parsed as a bigint. md5 supplies avalanche; the hex-parse is a
    single JVM ``conv`` here and a 15-step list fold in the DuckDB mirror
    (``sql_hex_hash60``) — bit-identical in Spark, DuckDB, and Python
    (``py_hex_hash60``), which is what lets MinHash/SimHash/sign-LSH
    queries sit under the DuckDB oracle gate instead of rows-only checks.
    Always non-negative (< 2^60), so ``%`` agrees across engines too.
    """
    c = F.col(s) if isinstance(s, str) else s
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_hex_hash60(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substr(md5({expr}), 1, 15), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(a, x) -> a * 16 + x)"
    )


def py_hex_hash60(s: str) -> int:
    """Driver-side twin of hex_hash60 (for baking deterministic constants
    like LSH hyperplanes that both engines must re-derive)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
