"""Batch-45 units: exact corpus statistics (Gini, Kendall τ-a, χ²,
Mann-Whitney U) verified against independent numpy brute force — not the
DuckDB twins, so same-formula blindness can't hide an algebra slip."""
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_gini_matches_mean_absolute_difference_form(spark, docs):
    # brute force via the OTHER Gini identity: G = Σ|xi−xj| / (2n²µ)
    # (pairwise form), vs the engine's sorted rank-mass form.
    got = {r["lang"]: r for r in
           em.q_gini_chars(spark, SF).collect()}
    for lang, g in docs.groupby("lang"):
        x = g["n_chars"].to_numpy(np.int64)
        n = len(x)
        mad = np.abs(x[:, None] - x[None, :]).sum()  # = 2·n²µ·G
        row = got[lang]
        assert row["n_docs"] == n
        assert row["total_chars"] == x.sum()
        # rank-mass form × 2n  ==  pairwise form × ... : compare as
        # exact fractions: gini_num/gini_den == mad / (2·n·Σx)
        assert row["gini_num"] * 2 * n * x.sum() \
            == mad * row["gini_den"]
        assert row["gini_ppm"] == row["gini_num"] * 10**6 // row["gini_den"]


def test_kendall_matches_numpy_pair_count(spark, events):
    ev = events[events["event_type"].isin(["view", "purchase"])]
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    piv = (pd.DataFrame({"day": day, "t": ev["event_type"]})
           .groupby("day")["t"]
           .agg(x=lambda s: int((s == "view").sum()),
                y=lambda s: int((s == "purchase").sum()))
           .sort_index())
    x, y = piv["x"].to_numpy(np.int64), piv["y"].to_numpy(np.int64)
    s = np.sign(np.subtract.outer(x, x) * np.subtract.outer(y, y))
    iu = np.triu_indices(len(x), 1)
    s = s[iu]
    row = em.q_kendall_daily(spark, SF).collect()[0]
    assert row["n_pairs"] == len(s)
    assert row["concordant"] == int((s == 1).sum())
    assert row["discordant"] == int((s == -1).sum())
    assert row["tied"] == int((s == 0).sum())


def test_chi2_terms_match_scipy_free_brute(spark, docs):
    ct = pd.crosstab(docs["lang"], docs["source"])
    n = int(ct.values.sum())
    rows = em.q_chi2_lang_source(spark, SF).collect()
    assert len(rows) == ct.shape[0] * ct.shape[1]  # zero cells included
    float_chi2 = 0.0
    for r in rows:
        o = int(ct.loc[r["lang"], r["source"]]) \
            if r["source"] in ct.columns else 0
        assert r["o"] == o
        dev = n * o - r["r"] * r["c"]
        assert r["dev2"] == dev * dev
        assert r["term_ppm"] == dev * dev * 10**6 // (n * r["r"] * r["c"])
        exp = r["r"] * r["c"] / n
        float_chi2 += (o - exp) ** 2 / exp
    # the ppm sum reconstructs the float χ² statistic to ppm precision
    assert abs(sum(r["term_ppm"] for r in rows) / 1e6 / n
               - float_chi2 / n) < 1e-4


def test_mannwhitney_matches_pairwise_brute(spark, docs):
    en = docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.int64)
    got = {r["lang"]: r for r in
           em.q_mannwhitney_len(spark, SF).collect()}
    others = sorted(set(docs["lang"]) - {"en"})
    assert set(got) == set(others)
    for lang in others:
        o = docs.loc[docs["lang"] == lang, "n_chars"].to_numpy(np.int64)
        gt = int((en[:, None] > o[None, :]).sum())
        eq = int((en[:, None] == o[None, :]).sum())
        row = got[lang]
        assert (row["n_en"], row["n_oth"]) == (len(en), len(o))
        assert row["u_x2"] == 2 * gt + eq
        assert row["auc_ppm"] == (2 * gt + eq) * 10**6 // (2 * len(en) * len(o))
