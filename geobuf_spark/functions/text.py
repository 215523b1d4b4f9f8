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


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-grams as space-joined strings; empty array below n tokens.

    The `when` guard matters: Spark's `sequence(1, k)` DESCENDS when k < 1,
    so an unguarded short document would produce garbage grams instead of
    an empty list.
    """
    ws = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))


def dup_ngram_columns(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Gopher/C4-style duplicated-n-gram quality signal: the fraction of a
    document's word n-grams that are repeats. Pure expressions — one
    projection, no shuffle, no Python; at 100 TB this runs map-side inside
    whole-stage codegen alongside the other quality columns."""
    g = word_ngrams(F.col(text_col), n)
    total, dist = F.size(g), F.size(F.array_distinct(g))
    return (
        df.withColumn("n_grams", total)
        .withColumn("n_uniq_grams", dist)
        .withColumn(
            "dup_gram_frac",
            F.when(total > 0, (total - dist).cast("double") / total.cast("double"))
            .otherwise(F.lit(0.0)),
        )
    )


def sql_dup_ngrams(src: str, id_col: str = "doc_id", text: str = "text",
                   n: int = 3) -> str:
    """DuckDB twin of dup_ngram_columns as a full query over `src`. Exact
    across engines: the gram counts are integers and the fraction is one
    IEEE double division of small exact ints, bit-identical in Spark and
    DuckDB. DuckDB's range(a, b) is empty when b <= a, but the CASE guard
    mirrors the Spark `when` anyway so both sides read the same."""
    gram = " || chr(32) || ".join(f"ws[i + {j}]" for j in range(n))
    return f"""
        WITH toks AS (SELECT {id_col}, string_split({text}, chr(32)) AS ws
                      FROM {src}),
        grams AS (SELECT {id_col},
                         CASE WHEN len(ws) >= {n} THEN
                             list_transform(range(1, len(ws) - {n - 2}), i -> {gram})
                         ELSE CAST([] AS VARCHAR[]) END AS g
                  FROM toks)
        SELECT {id_col},
               len(g) AS n_grams,
               len(list_distinct(g)) AS n_uniq_grams,
               CASE WHEN len(g) > 0
                    THEN (len(g) - len(list_distinct(g))) * 1.0 / len(g)
                    ELSE 0.0 END AS dup_gram_frac
        FROM grams"""


def url_host(url: Column) -> Column:
    """Registrable-host extraction from a URL column — JVM-side parse_url."""
    return F.parse_url(url, F.lit("HOST"))


def sql_url_host(url: str = "url") -> str:
    """DuckDB twin of url_host (RE2 — no backtracking constructs)."""
    return f"regexp_extract({url}, '^[a-z]+://([^/]+)', 1)"


_SCHEME_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def url_normalize(url: Column) -> Column:
    """Canonicalize an absolute URL — the Common-Crawl dedup key prep step.

    Policy (kept deliberately small and twin-exact with sql_url_normalize):
    lowercase scheme+host, strip default ports (:443 on https, :80 on http),
    drop the fragment, drop utm_* tracking params (and the '?' if nothing
    survives), drop a bare root-slash path. Non-absolute inputs pass through
    unchanged. All JVM-side expressions — regex constructs restricted to the
    Java-regex / RE2 common subset so the DuckDB twin matches byte-for-byte.
    """
    sh = F.regexp_extract(url, _SCHEME_HOST_RE, 0)
    rest = F.substr(url, F.length(sh) + F.lit(1))
    shn = F.regexp_replace(
        F.regexp_replace(F.lower(sh), "^(https://[^:/]*):443$", "$1"),
        "^(http://[^:/]*):80$", "$1")
    nofrag = F.regexp_replace(rest, "#.*", "")
    path = F.regexp_extract(nofrag, "^[^?]*", 0)
    qs = F.substr(nofrag, F.length(path) + F.lit(2))
    keep = F.filter(
        F.split(qs, "&"),
        lambda _pp: (_pp != F.lit("")) & ~_pp.startswith("utm_"))
    qn = F.when(F.size(keep) > 0,
                F.concat(F.lit("?"), F.array_join(keep, "&"))).otherwise(F.lit(""))
    pathn = F.when(path == "/", F.lit("")).otherwise(path)
    return F.when(sh == "", url).otherwise(F.concat(shn, pathn, qn))


def sql_url_normalize(u: str) -> str:
    """DuckDB twin of url_normalize. Pass a plain column name — the
    sub-expressions repeat the input, so a complex expression would blow up
    the generated SQL."""
    sh = f"regexp_extract({u}, '{_SCHEME_HOST_RE}')"
    shn = (f"regexp_replace(regexp_replace(lower({sh}),"
           f" '^(https://[^:/]*):443$', '\\1'), '^(http://[^:/]*):80$', '\\1')")
    rest = f"substr({u}, length({sh}) + 1)"
    nofrag = f"regexp_replace({rest}, '#.*', '')"
    path = f"regexp_extract({nofrag}, '^[^?]*')"
    qs = f"substr({nofrag}, length({path}) + 2)"
    keep = (f"list_filter(string_split({qs}, '&'),"
            f" _pp -> _pp <> '' AND NOT starts_with(_pp, 'utm_'))")
    qn = f"CASE WHEN len({keep}) > 0 THEN '?' || array_to_string({keep}, '&') ELSE '' END"
    pathn = f"CASE WHEN {path} = '/' THEN '' ELSE {path} END"
    return f"CASE WHEN {sh} = '' THEN {u} ELSE {shn} || {pathn} || {qn} END"


def extract_links(html_text: Column) -> Column:
    """href targets of every <a> tag in an HTML string column — one
    regexp_extract_all pass, JVM-side, returns array<string>."""
    return F.regexp_extract_all(html_text, F.lit('<a href="([^"]+)"'), 1)


def sql_extract_links(h: str) -> str:
    """DuckDB twin of extract_links."""
    return f"regexp_extract_all({h}, '<a href=\"([^\"]+)\"', 1)"


# the paired patterns MUST match the same <a> tag set so positional zips
# of (extract_links, extract_link_anchors) stay aligned: both anchor on
# `<a href="…"` and the anchor variant additionally requires a non-empty
# text body before </a>
_ANCHOR_RE = '<a href="[^"]+">([^<]+)</a>'


def extract_link_anchors(html_text: Column) -> Column:
    """Anchor TEXT of every <a href="…">text</a> tag — the positional
    companion of extract_links (zip the two arrays for (href, text)
    pairs; tags without a simple text body would misalign the zip, so
    callers own that contract — the minted fixtures emit only this
    shape)."""
    return F.regexp_extract_all(html_text, F.lit(_ANCHOR_RE), 1)


def sql_extract_link_anchors(h: str) -> str:
    """DuckDB twin of extract_link_anchors."""
    return f"regexp_extract_all({h}, '{_ANCHOR_RE}', 1)"


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


# robots noindex gate — Java-regex / RE2 common subset (alternation only, no
# lookaround, no backreferences) so rlike and DuckDB regexp_matches agree
# byte-for-byte. Catches double/single-quoted attributes in either order.
# 'noindex' must be a whole comma/space-separated TOKEN of a properly
# terminated content value: 'noindexifembargoed' / 'nonoindex' are not
# directives, and an unterminated attribute never matches (symmetric in
# both attribute orders). The value runs also exclude <> so a truncated
# tag can't borrow a closing quote from LATER markup ('content="noindex
# <p>don''t</p>' must not close on the apostrophe).
_NOINDEX_VAL = ("[\"']([^\"'<>]*[,\\s])?noindex([,\\s][^\"'<>]*)?[\"']")
ROBOTS_NOINDEX_RE = (
    f"<meta\\s+(name=[\"']robots[\"']\\s+content={_NOINDEX_VAL}"
    f"|content={_NOINDEX_VAL}\\s+name=[\"']robots[\"'])"
)


def is_noindex(html_text: Column) -> Column:
    """True when the HTML string carries a robots-noindex meta tag."""
    return html_text.rlike(ROBOTS_NOINDEX_RE)


def sql_is_noindex(h: str) -> str:
    """DuckDB twin of is_noindex (regexp_matches is unanchored like rlike)."""
    return f"regexp_matches({h}, '{ROBOTS_NOINDEX_RE.replace(chr(39), chr(39) * 2)}')"


def first_occurrence_lines(body: Column) -> Column:
    """Within-document repeated-line removal: the lines of a newline-joined
    body with every later duplicate dropped (first occurrence kept). Pure
    codegen'd array expressions — the single definition shared by the
    line_dedup_clean query, its pytest battery, and the stress harness.
    Spark's filter lambda index is 0-based; array_position is 1-based."""
    arr = F.split(body, "\n")
    return F.filter(arr, lambda x, i: F.array_position(arr, x) == i + F.lit(1))


def normalize_text(col: Column) -> Column:
    """C4-style scrubber: control chars → space, whitespace-run collapse,
    trim. Shared by the text_normalize query and its byte-recovery test."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(col, r"[\x00-\x1f\x7f]", " "), " +", " "))


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021 §A1.1 — public paper), kept
# integer-exact so the DuckDB twins hash-match: every ratio is a floored
# fixed-point of exact ints, every bound an integer constant.
# ---------------------------------------------------------------------------

GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_MEAN_LEN_LO_X100 = 300   # mean token length in [3, 10] chars
GOPHER_MEAN_LEN_HI_X100 = 1000
GOPHER_MIN_ALPHA_X10K = 8000    # ≥80% of tokens contain a letter
GOPHER_MIN_STOP_HITS = 2        # ≥2 English stopword hits


def gopher_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher document-quality rule columns + the combined pass flag.

    Zero-shuffle: token-array lambdas (filter/size) and floored fixed-point
    ratios, all inside whole-stage codegen — at 100 TB this runs map-side in
    the same scan as the rest of the quality gate, no exchange anywhere."""
    t = F.col(text_col)
    ws = tokens(t)
    n = F.size(ws).cast("bigint")
    mean_x100 = F.floor(
        (F.length(t) - n + 1).cast("double") / n.cast("double") * 100.0
    ).cast("bigint")
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("bigint")
    alpha_x10k = F.when(
        n > 0, F.floor(alpha.cast("double") * 10000.0 / n.cast("double"))
    ).otherwise(F.lit(0)).cast("bigint")
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w))).cast("bigint")
    gopher_pass = (
        (n >= GOPHER_MIN_TOKENS) & (n <= GOPHER_MAX_TOKENS)
        & (mean_x100 >= GOPHER_MEAN_LEN_LO_X100)
        & (mean_x100 <= GOPHER_MEAN_LEN_HI_X100)
        & (alpha_x10k >= GOPHER_MIN_ALPHA_X10K)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn("mean_token_len_x100", mean_x100)
        .withColumn("alpha_frac_x10k", alpha_x10k)
        .withColumn("stop_hits", stop_hits)
        .withColumn("gopher_pass", gopher_pass.cast("int"))
    )


def sql_gopher(text: str = "text") -> dict[str, str]:
    """DuckDB twins of gopher_columns (list_filter mirrors F.filter)."""
    ws = f"string_split({text}, chr(32))"
    n = f"CAST(len({ws}) AS BIGINT)"
    mean = (f"CAST(floor((length({text}) - {n} + 1) * 1.0 / {n} * 100.0)"
            f" AS BIGINT)")
    alpha = (f"CAST(len(list_filter({ws},"
             f" _w -> regexp_matches(_w, '[A-Za-z]'))) AS BIGINT)")
    sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    stop = (f"CAST(len(list_filter({ws},"
            f" _w -> list_contains({sw}, _w))) AS BIGINT)")
    alpha_x10k = (f"CASE WHEN {n} > 0 THEN CAST(floor({alpha} * 10000.0 / {n})"
                  f" AS BIGINT) ELSE 0 END")
    gpass = (
        f"CAST(({n} >= {GOPHER_MIN_TOKENS} AND {n} <= {GOPHER_MAX_TOKENS}"
        f" AND {mean} >= {GOPHER_MEAN_LEN_LO_X100}"
        f" AND {mean} <= {GOPHER_MEAN_LEN_HI_X100}"
        f" AND {alpha_x10k} >= {GOPHER_MIN_ALPHA_X10K}"
        f" AND {stop} >= {GOPHER_MIN_STOP_HITS}) AS INT)")
    return {
        "n_tokens": n,
        "mean_token_len_x100": mean,
        "alpha_frac_x10k": alpha_x10k,
        "stop_hits": stop,
        "gopher_pass": gpass,
    }


def top_run_columns(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Most-frequent word n-gram per document — the Gopher top-n-gram
    repetition signal — WITHOUT a (doc, gram) shuffle.

    Sort the gram array, then one aggregate() fold finds the longest equal
    run (= the modal gram; ties resolve to the lexicographically smallest,
    because a strictly-greater run is required to displace the incumbent and
    the array is ascending). Zero exchanges: at 100 TB the alternative
    explode→groupBy(doc, gram) shuffles one row per gram occurrence — this
    stays map-side in codegen. Docs with fewer than n tokens keep
    top_count = 0 and top_gram = '' (callers filter)."""
    g = F.array_sort(word_ngrams(F.col(text_col), n))
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("best"), F.lit("").alias("best_gram"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_gram"]).alias("best_gram"),
        )

    res = F.aggregate(g, init, step)
    return (
        df.withColumn("top_gram", res["best_gram"])
        .withColumn("top_count", res["best"].cast("bigint"))
    )


# ---------------------------------------------------------------------------
# PII scrubbing — regexes restricted to the Java-regex / RE2 common subset
# (character classes + bounded counts only; no lookaround, no backrefs, no
# ambiguous greediness) so Spark regexp_replace and the DuckDB twins agree
# byte-for-byte.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def scrub_pii(text: Column) -> Column:
    """Redact emails then phones (emails first: the email pattern can
    contain '+digits-' in its local part, the phone pattern can't contain
    '@'). Two codegen'd regexp_replace passes, zero-shuffle."""
    return F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text."""
    return (F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("bigint"),
            F.regexp_count(text, F.lit(PII_PHONE_RE)).cast("bigint"))


def sql_scrub_pii(t: str) -> str:
    """DuckDB twin of scrub_pii ('g' flag: Spark replaces all by default)."""
    return (f"regexp_replace(regexp_replace({t}, '{PII_EMAIL_RE}', "
            f"'<EMAIL>', 'g'), '{PII_PHONE_RE}', '<PHONE>', 'g')")


def sql_pii_counts(t: str) -> tuple[str, str]:
    """DuckDB twins of pii_counts via regexp_extract_all."""
    return (f"CAST(len(regexp_extract_all({t}, '{PII_EMAIL_RE}')) AS BIGINT)",
            f"CAST(len(regexp_extract_all({t}, '{PII_PHONE_RE}')) AS BIGINT)")


def rare_token_ratio(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", min_count: int = 3) -> DataFrame:
    """Per-document fraction of tokens that are corpus-rare (global
    frequency < min_count) — the 'gibberish detector' quality signal that
    needs a corpus-wide pass, unlike the per-doc Gopher rules.

    Shape for 100 TB: (1) per-(doc, token) counts — ONE shuffle with
    map-side combine, which collapses heavy hitters (the Zipf head is half
    the corpus) to one row per doc before anything global; (2) token totals
    re-aggregate those counts — the second shuffle moves only distinct
    (doc, token) pairs; (3) join totals back on token (the totals side is
    |vocab| rows — broadcast at any realistic vocabulary, AQE decides) and
    (4) fold to one row per doc. No explode survives past stage 1."""
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    per = toks.groupBy(id_col, "tok").agg(F.count("*").alias("m"))
    freq = per.groupBy("tok").agg(F.sum("m").alias("n_corpus"))
    rare = F.when(F.col("n_corpus") < min_count, F.col("m")).otherwise(F.lit(0))
    return (
        per.join(freq, "tok")
        .groupBy(id_col)
        .agg(F.sum("m").cast("bigint").alias("n_tokens_total"),
             F.sum(rare).cast("bigint").alias("n_rare"))
        .withColumn(
            "rare_x10k",
            F.floor(F.col("n_rare").cast("double") * 10000.0
                    / F.col("n_tokens_total").cast("double")).cast("bigint"))
    )
