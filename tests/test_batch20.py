"""Batch-20 units: pigeonhole edit-distance blocking completeness."""
import itertools

from pyspark.sql import functions as F

from geobuf_spark.operators import dedup


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit1_near_pairs_complete_vs_bruteforce(spark):
    # adversarial set: shared prefixes, shared suffixes, length ±1 around
    # every boundary parity, edits in first half / second half / middle
    strs = [
        "site12.example", "site13.example", "site123.example",
        "site12.exampl", "xite12.example", "site12.exbmple",
        "abc", "abd", "ab", "abcd", "a", "b", "",
        "mirror-a", "mirror-b", "mirrorr-a",
        "aaaaaaaa", "aaaaaaab", "baaaaaaa", "aaaabaaa", "aaaaaaaaa",
        "odd1234", "odd1235", "odd123", "evn12345", "evn12346",
    ]
    expected = sorted(
        (a, b) for a, b in itertools.combinations(sorted(set(strs)), 2)
        if _lev(a, b) <= 1)
    df = spark.createDataFrame([(s,) for s in strs], "h string")
    got = sorted((r.s_a, r.s_b)
                 for r in dedup.edit1_near_pairs(df, "h").collect())
    assert got == expected
    assert expected  # the fixture actually exercises matches


def test_edit1_near_pairs_no_quadratic_candidates(spark):
    # disjoint halves on both sides → the join must emit zero candidates,
    # pinning that blocking (not the refine) does the pruning
    strs = [f"{i:04d}zz{i:04d}" for i in range(0, 400, 7)]
    df = spark.createDataFrame([(s,) for s in strs], "h string")
    assert dedup.edit1_near_pairs(df, "h").count() == 0
