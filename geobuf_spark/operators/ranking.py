"""Corpus ranking operators — fixed-point BM25 scoring and inverted-index
posting statistics.

A training-data pipeline ranks documents against seed queries (quality
retrieval, topic filtering) and inspects term statistics (vocabulary audit,
stopword discovery). Both operators here are expressed so the external
DuckDB oracle reproduces them bit-identically:

- BM25 is computed entirely in BIGINT fixed point. The classic formula's
  two float hazards are removed: ln() in the IDF is replaced by the
  Robertson–Sparck-Jones odds ratio itself, scaled ×1e6 (monotone in the
  same argument, so rankings for a fixed df ordering are preserved), and
  the dl/avgdl ratio is cleared by multiplying numerator and denominator
  through by the integer avgdl_x100. Every division is integral
  (Spark `div` / DuckDB `//`) on non-negative operands, where the two
  engines agree exactly.
- Per-document term frequencies come from array expressions over the
  token split (size(filter(tokens, = t))) — NO explode and NO shuffle for
  the tf stage; the corpus statistics (N, avgdl, per-term df) are ONE
  global aggregation whose single row broadcasts back. At 10^12 docs the
  whole score is two passes over the corpus with a 1-row broadcast
  between them.

Magnitude domain (int64-exact): the two ×1e6 rescale products are computed
by exact quotient/remainder DECOMPOSITION — (a·S) div d = (a·1000 div d)·
1000 + ((a·1000 mod d)·1000) div d and (idf·sat) div S = (idf div S)·sat +
((idf mod S)·sat) div S — so no intermediate ever carries the full ×1e6
factor. The resulting bounds: N ≤ 2·10^12 / n_terms documents (each term
score reaches (2N+1)·sat_max with sat_max = (10+k1)·100·1000, and the
final score SUMS n_terms of them) and tf·avgdl_x100 ≤ 4·10^12 per
document (e.g. tf ≤ 4·10^5 at avgdl 10^5 tokens). A naive idf·sat·1e6
chain would wrap int64 at N ≈ 1.4·10^7.

Reference analog: none (geobuf is a codec) — this extends the SURVEY §2
training-data-pipeline surface like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

IDF_SCALE = 1_000_000
S_SCALE = 1_000_000


def idf_expr(n: str, df: str, div: str) -> str:
    """The RSJ odds-ratio idf in IDF_SCALE millionths — the ONE rendering
    of the formula every scorer (BM25 here, more-like-this in the query
    registry) and both engines share (div='div' Spark, '//' DuckDB)."""
    return f"(((2 * {n} - 2 * {df} + 1) * {IDF_SCALE}) {div} (2 * {df} + 1))"


def _term_score_exprs(n_terms: int, k1_tenths: int, b_hundredths: int,
                      div: str) -> list[str]:
    """The per-term fixed-point score expression strings over columns
    (dl, tf_i, avgdl_x100, idf_i) — the ONE source both engines render
    (Spark passes div='div', DuckDB div='//'; operands are non-negative so
    the two operators agree). Overflow-safe per the module docstring:
    both ×S_SCALE products are exact two-stage decompositions."""
    num_f = (10 + k1_tenths) * 100
    k1t, bh = k1_tenths, b_hundredths
    out = []
    for i in range(n_terms):
        # dl/tf arrive as 32-bit ints from F.size — widen HERE, inside the
        # shared text, or Spark evaluates 75·dl·100 in int32 (overflow at
        # dl ≈ 2.9e5) while DuckDB's len() is already BIGINT
        dl, tf = "CAST(dl AS BIGINT)", f"CAST(tf_{i} AS BIGINT)"
        den = (f"({tf} * 1000 * avgdl_x100 + {k1t} * ({100 - bh} * avgdl_x100"
               f" + {bh} * {dl} * 100))")
        a1000 = f"({tf} * {num_f} * avgdl_x100 * 1000)"
        s1 = f"({a1000} {div} {den})"
        r1 = f"({a1000} % {den})"
        # sat == (tf·numf·avgdl_x100·S_SCALE) div den, without the ×S_SCALE
        # intermediate: a·S div d = (a·1000 div d)·1000 + (a·1000 % d)·1000 div d
        sat = f"({s1} * 1000 + ({r1} * 1000) {div} {den})"
        q, r = f"(idf_{i} {div} {S_SCALE})", f"(idf_{i} % {S_SCALE})"
        # (idf·sat) div S == q·sat + (r·sat) div S  (idf = q·S + r, exact)
        out.append(f"({q} * {sat} + ({r} * {sat}) {div} {S_SCALE})")
    return out


def bm25_scores(docs: DataFrame, terms: list[str], id_col: str = "doc_id",
                text_col: str = "text", k1_tenths: int = 12,
                b_hundredths: int = 75) -> DataFrame:
    """Per-document fixed-point BM25 score for a literal term set.

    k1/b arrive as integer tenths/hundredths (defaults 1.2 / 0.75). Output:
    (id_col, dl, score_ppm) with score_ppm = Σ_t idf_scaled_t · sat_t where
    sat_t = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) in millionths, and
    idf_scaled_t = (2N−2df_t+1)·1e6 // (2df_t+1) — the RSJ odds ratio, no
    logarithm, exact across engines.
    """
    if not terms:
        raise ValueError("terms must be a non-empty literal list")
    toks = F.split(F.col(text_col), " ")

    def tf(term):
        # closure, NOT a default-arg lambda: a two-parameter lambda would
        # make PySpark pass (element, index) and silently rebind the term
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sumdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
          for i in range(len(terms))],
    ).select(
        "n_docs",
        F.expr("(sumdl * 100) div n_docs").alias("avgdl_x100"),
        *[F.expr(idf_expr("n_docs", f"df_{i}", "div"))
          .alias(f"idf_{i}") for i in range(len(terms))],
    )
    scored = base.crossJoin(F.broadcast(stats))
    term_scores = _term_score_exprs(len(terms), k1_tenths, b_hundredths,
                                    div="div")
    return scored.select(
        id_col, "dl",
        F.expr(" + ".join(term_scores)).cast("bigint").alias("score_ppm"),
    )


def sql_bm25_scores(source_sql: str, terms: list[str], id_col: str = "doc_id",
                    text_col: str = "text", k1_tenths: int = 12,
                    b_hundredths: int = 75, prefix: str = "") -> str:
    """DuckDB twin of bm25_scores as a CTE chain ending in
    {prefix}bm25(id_col, dl, score_ppm). source_sql is a FROM-able fragment.
    Identical integer arithmetic; `//` matches Spark's `div` on the
    non-negative operands used here."""
    p = prefix
    tf_cols = ",\n                   ".join(
        f"len(list_filter(string_split({text_col}, chr(32)), x -> x = '{t}'))"
        f" AS tf_{i}" for i, t in enumerate(terms))
    df_cols = ",\n                   ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms)))
    idf_cols = ",\n                   ".join(
        f"{idf_expr('n_docs', f'df_{i}', '//')} AS idf_{i}"
        for i in range(len(terms)))
    score = " + ".join(_term_score_exprs(len(terms), k1_tenths,
                                         b_hundredths, div="//"))
    return f"""{p}bmb AS (SELECT {id_col},
                   len(string_split({text_col}, chr(32))) AS dl,
                   {tf_cols}
            FROM {source_sql}),
        {p}bms0 AS (SELECT count(*) AS n_docs, sum(dl) AS sumdl,
                   {df_cols}
            FROM {p}bmb),
        {p}bms AS (SELECT n_docs, (sumdl * 100) // n_docs AS avgdl_x100,
                   {idf_cols}
            FROM {p}bms0),
        {p}bm25 AS (SELECT {id_col}, dl,
                   CAST({score} AS BIGINT) AS score_ppm
            FROM {p}bmb, {p}bms)"""


def postings(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text", sample_k: int = 5) -> DataFrame:
    """Inverted-index posting statistics per term: document frequency,
    total term frequency, and the first `sample_k` doc ids (comma-joined,
    ascending) as a bounded posting sample.

    Plan shape — ONE pass over the exploded corpus, three exchanges:
    explode (1:L flatMap, no pre-shuffle) → ONE hash aggregate on
    (term, doc) with map-side partials (this collapses per-doc repeats
    before the shuffle, so shuffle rows are distinct pairs) → repartition
    to term for a row_number window → the final per-term agg reuses the
    window's partitioning (no fourth exchange). The sample collects only
    the rank-bounded rows (collect_list skips the NULLed rn > k docs),
    NOT the full posting list, so per-group state stays bounded at
    10^12-doc scale; nothing re-reads the explode.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"))
    pairs = toks.groupBy("term", "doc").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("term").orderBy("doc")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    # sort AFTER collecting — collect_list order is partition-arbitrary
    return ranked.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("tf_total"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(
                    F.when(F.col("rn") <= sample_k, F.col("doc")))),
                lambda d: d.cast("string")), ",").alias("first_docs"))


def sql_postings(source_sql: str, id_col: str = "doc_id",
                 text_col: str = "text", sample_k: int = 5,
                 prefix: str = "") -> str:
    """DuckDB twin of postings: CTE chain ending in
    {prefix}post(term, df, tf_total, first_docs)."""
    p = prefix
    return f"""{p}ptok AS (SELECT {id_col} AS doc, unnest(string_split({text_col}, chr(32))) AS term
              FROM {source_sql}),
        {p}ppair AS (SELECT term, doc, count(*) AS tf
              FROM {p}ptok GROUP BY 1, 2),
        {p}pstat AS (SELECT term, count(*) AS df,
                   CAST(sum(tf) AS BIGINT) AS tf_total
              FROM {p}ppair GROUP BY 1),
        {p}psamp AS (SELECT term,
                   array_to_string(list_transform(
                       (list_sort(list(doc)))[1:{sample_k}],
                       d -> CAST(d AS VARCHAR)), ',') AS first_docs
              FROM {p}ppair GROUP BY 1),
        {p}post AS (SELECT s.term, s.df, s.tf_total, m.first_docs
              FROM {p}pstat s JOIN {p}psamp m ON s.term = m.term)"""
