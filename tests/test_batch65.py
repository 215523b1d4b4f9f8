"""Batch-65 units: greedy max-coverage host selection (vs a pure-python
greedy over brute trigram sets) and the exact-rational Welch t² gate (vs
python-int algebra AND a float Welch recomputation)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.functions import text as TXT
from geobuf_spark.sources import pages as P

SF = "/root/testdata/sf0.001"


def test_max_coverage_hosts_vs_brute(spark):
    pg = P.pages(spark, 2000, 42).select(
        TXT.url_host("url").alias("host"), "text").toPandas()
    hosts = {}
    for r in pg.itertuples():
        t = r.text.split(" ")
        grams = {"\x1f".join(t[i:i + 3])
                 for i in range(max(len(t) - 2, 1))}
        hosts.setdefault(r.host, set()).update(grams)
    covered = set()
    exp = []
    cum = 0
    for rank in range(1, em.MAXCOV_K + 1):
        best = None
        for h in sorted(hosts):
            gain = len(hosts[h] - covered)
            key = (-gain, h)
            if best is None or key < best[0]:
                best = (key, h, gain)
        covered |= hosts[best[1]]
        cum += best[2]
        assert len(covered) == cum  # greedy identity
        exp.append((rank, best[1], best[2], cum))
    got = [(r["rank"], r["host"], r["gain"], r["covered_total"])
           for r in em.q_max_coverage_hosts(spark, SF)
           .orderBy("rank").collect()]
    assert got == exp
    # later gains must shrink-or-tie (submodularity) and stay positive
    gains = [g for _, _, g, _ in got]
    assert gains == sorted(gains, reverse=True)
    assert gains[-1] > 0


def test_welch_gate_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["source", "n_chars"])
    moms = {}
    for lang, g in d.groupby("source"):
        x = [int(v) for v in g["n_chars"]]
        moms[lang] = (len(x), sum(x), sum(v * v for v in x))
    langs = sorted(moms)
    exp = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1:]:
            n1, s1, q1 = moms[la]
            n2, s2, q2 = moms[lb]
            D = s1 * n2 - s2 * n1
            a1, a2 = n1 * q1 - s1 * s1, n2 * q2 - s2 * s2
            lhs = D * D * (n1 - 1) * (n2 - 1)
            den = a1 * n2 * n2 * (n2 - 1) + a2 * n1 * n1 * (n1 - 1)
            exp.append((la, lb, n1, n2, 10**6 * lhs // den,
                        lhs > den * em.WELCH_K))
            # cross-check the cleared-denominator algebra against the
            # float Welch statistic itself
            m1, m2 = s1 / n1, s2 / n2
            v1 = (q1 - n1 * m1 * m1) / (n1 - 1)
            v2 = (q2 - n2 * m2 * m2) / (n2 - 1)
            t2 = (m1 - m2) ** 2 / (v1 / n1 + v2 / n2)
            assert abs(t2 * 10**6 - (10**6 * lhs / den)) < 1e3
    got = [(r["src_a"], r["src_b"], r["n_a"], r["n_b"], r["t2_ppm"],
            r["significant"])
           for r in em.q_welch_gate(spark, SF).collect()]
    assert got == exp
    # the gate must split the fixture — some pairs flagged, some not
    flags = [f for *_, f in got]
    assert any(flags) and not all(flags)
