"""Text-analysis functions for training-data pipelines — all JVM-side
Column expressions (no Python), each with an ANSI-SQL twin for the oracle.

The reference has no text functions; these are the web-payload operators a
100 TB Common-Crawl pipeline needs (task brief): token counting, quality
scoring, fingerprinting, language-ID heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "que"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "un", "una", "es"],
    "pt": ["o", "a", "os", "as", "e", "de", "que", "um", "uma", "com"],
    "it": ["il", "la", "le", "e", "di", "che", "un", "una", "per", "con"],
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def uniq_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def fingerprint(text: Column, nhex: int = 16) -> Column:
    """Document fingerprint — stable content hash prefix."""
    return F.substring(F.md5(text), 1, nhex)


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / diversity quality metrics, integer-valued so the
    oracle compares exactly."""
    t = F.col(text_col)
    return (
        df.withColumn("n_bytes", F.octet_length(t))
        .withColumn("n_chars", F.length(t))
        .withColumn("n_tokens", token_count(t))
        .withColumn("n_uniq_tokens", uniq_token_count(t))
        # mean token length ×100, floored — integer, oracle-exact
        .withColumn(
            "mean_token_len_x100",
            F.floor(
                (F.length(t) - token_count(t) + 1).cast("double")
                / token_count(t).cast("double") * 100.0
            ).cast("bigint"),
        )
    )


def sql_quality(text: str = "text") -> dict[str, str]:
    """The DuckDB twins of quality_columns expressions."""
    ntok = f"len(string_split({text}, chr(32)))"
    return {
        "n_bytes": f"octet_length({text})",
        "n_chars": f"length({text})",
        "n_tokens": ntok,
        "n_uniq_tokens": f"len(list_distinct(string_split({text}, chr(32))))",
        "mean_token_len_x100": (
            f"CAST(floor((length({text}) - {ntok} + 1) * 1.0 / {ntok} * 100.0) AS BIGINT)"
        ),
    }


def lang_score(text: Column, lang: str) -> Column:
    """Stopword-hit count for one language over the token array."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(F.lower(text)), lambda tok: F.array_contains(sw, tok)))


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax stopword-hit rate, 'und' if no hits.

    Pure expressions — a stack of scores + greatest + chained when()."""
    scores = {lg: lang_score(F.col(text_col), lg) for lg in STOPWORDS}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lg in reversed(list(scores)):  # earlier langs win ties
        pred = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(pred)
    return df.withColumn(out, pred)
