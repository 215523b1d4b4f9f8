"""Dedup operators vs brute-force oracles on the documents table + planted
near-duplicates."""

import itertools

import pytest
from pyspark.sql import functions as F

from geobuf_spark.operators import dedup


@pytest.fixture(scope="module")
def docs_with_dups(spark, sf_small):
    """documents + planted exact and near duplicates with known ids."""
    d = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id", "text")
    base = d.filter(F.col("doc_id") < 20)
    exact = base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    # near-dup: append one token — high shingle overlap
    near = base.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    return d.unionByName(exact).unionByName(near).cache()


def brute_jaccard(texts: dict, k: int = 3):
    def shingles(t):
        toks = t.split(" ")
        if len(toks) < k:
            return {" ".join(toks)}
        return {"\x1f".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sh = {i: shingles(t) for i, t in texts.items()}
    out = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter:
            out[(a, b)] = inter / len(sh[a] | sh[b])
    return out


def test_dedup_exact_groups(docs_with_dups):
    res = dedup.dedup_exact(docs_with_dups, key="doc_id")
    groups = {r.rep_id: r.n_dups for r in res.collect()}
    for i in range(20):
        assert groups.get(i) == 2, f"doc {i} should pair with its exact copy"
    # near-dups are NOT exact dups
    assert res.filter(F.col("n_dups") > 2).count() == 0


def test_ngram_jaccard_exact(docs_with_dups):
    got = {
        (r.a, r.b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs_with_dups, key="doc_id", threshold=0.5).collect()
    }
    texts = {r.doc_id: r.text for r in docs_with_dups.collect()}
    want = {p: j for p, j in brute_jaccard(texts).items() if j >= 0.5}
    assert set(got) == set(want)
    for p in want:
        assert abs(got[p] - want[p]) < 1e-12


def test_minhash_lsh_finds_planted_pairs(docs_with_dups):
    pairs = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_pairs(
            docs_with_dups, key="doc_id", jaccard_threshold=0.5
        ).collect()
    }
    # every exact duplicate pair (jaccard 1.0) must be found
    for i in range(20):
        assert (i, i + 100000) in pairs, f"exact pair {i} missed by LSH"
    # estimated jaccard never promotes a genuinely low-overlap pair:
    texts = {r.doc_id: r.text for r in docs_with_dups.collect()}
    true_j = brute_jaccard(texts)
    for a, b in pairs:
        assert true_j.get((a, b), 0.0) > 0.2, f"false positive {(a, b)}"


def test_simhash_near_pairs(docs_with_dups):
    pairs = {
        (r.a, r.b)
        for r in dedup.simhash_near_pairs(docs_with_dups, key="doc_id", max_hamming=3).collect()
    }
    for i in range(20):
        assert (i, i + 100000) in pairs, f"exact pair {i} missed by simhash"


def test_simhash_hamming_is_exact(spark, docs_with_dups):
    """hamming column equals true popcount of signature xor."""
    sh = dedup.simhash64(docs_with_dups, key="doc_id")
    sigs = {r.key: r.simhash for r in sh.collect()}
    res = dedup.simhash_near_pairs(docs_with_dups, key="doc_id", max_hamming=3).collect()
    for r in res:
        assert r.hamming == bin(sigs[r.a] ^ sigs[r.b]).count("1")


def test_near_dup_components_vs_python_bfs(spark):
    """Min-label propagation must equal a driver-side union-find on the
    same edges — chains, stars, and singleton-free graphs."""
    import random

    rng = random.Random(7)
    edges = set()
    # several chains and stars with shuffled ids
    base = 0
    for size in (2, 3, 5, 8, 4):
        ids = [base + i * 7 + 3 for i in range(size)]
        rng.shuffle(ids)
        for x, y in zip(ids, ids[1:]):
            edges.add((min(x, y), max(x, y)))
        base += 100
    # a star
    hub = 1000
    for leaf in range(1001, 1012):
        edges.add((hub, leaf))
    pairs = spark.createDataFrame(sorted(edges), "a bigint, b bigint")

    got = {r.doc_id: r.rep_id for r in dedup.near_dup_components(pairs).collect()}

    # oracle: union-find
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    for x, y in edges:
        union(x, y)
    want = {x: find(x) for x in parent}
    assert got == want


def test_simhash_trailing_empty_docs_in_batch(spark):
    """A batch ending in zero-token (null-text) docs must not truncate the
    preceding doc's signature (reduceat clamp bug, review r2)."""
    rows = [(1, "alpha beta gamma delta"), (2, None), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    sig_all = {r.key: r.simhash for r in dedup.simhash64(df, key="doc_id").collect()}
    solo = spark.createDataFrame(rows[:1], "doc_id long, text string")
    sig_solo = dedup.simhash64(solo, key="doc_id").collect()[0].simhash
    assert sig_all[1] == sig_solo
    assert sig_all[2] == 0 and sig_all[3] == 0


def test_simhash_string_keys(spark):
    # r3: the key column passes through with its original type (the r2
    # kernel astype(int64)-crashed on string keys)
    df = spark.createDataFrame(
        [("u1", "alpha beta gamma"), ("u2", "alpha beta gamma"),
         ("u3", "totally different words here")], ["name", "text"])
    sh = {r.key: r.simhash for r in dedup.simhash64(df, key="name").collect()}
    assert set(sh) == {"u1", "u2", "u3"}
    assert sh["u1"] == sh["u2"] != sh["u3"]
    pairs = dedup.simhash_near_pairs(df, key="name", max_hamming=3).collect()
    assert {(r.a, r.b) for r in pairs} == {("u1", "u2")}


def test_containment_catches_short_in_long(spark):
    """A short doc embedded verbatim in a 4x longer one: containment = 1.0
    while symmetric Jaccard ~ 0.25 stays below any useful threshold — the
    asymmetric tier's reason to exist. Also pins the exactness claim: no
    shingle here exceeds max_df, so the score is exact, and the planted
    pair is the ONLY one reported at threshold 0.9."""
    short = " ".join(f"tok{i}" for i in range(30))
    long_ = short + " " + " ".join(f"pad{i}" for i in range(90))
    other = " ".join(f"zzz{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)], ["doc_id", "text"])
    got = dedup.containment_pairs(df, key="doc_id", shingle_k=3,
                                  threshold=0.9).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["a"], row["b"]) == (1, 2)
    assert row["containment"] == 1.0
    # symmetric Jaccard on the same pair stays low
    jac = dedup.ngram_jaccard_pairs(df, key="doc_id", shingle_k=3,
                                    threshold=0.9).collect()
    assert jac == []


def test_containment_df_cap_is_candidate_only(spark):
    """max_df drops frequent shingles from CANDIDATE GENERATION only: with
    the cap below the planted shingle's document frequency, the pair is
    simply not generated (lower-bound semantics), never mis-scored."""
    t = " ".join(f"c{i}" for i in range(20))
    df = spark.createDataFrame(
        [(i, t) for i in range(5)], ["doc_id", "text"])
    # every shingle appears in all 5 docs -> df = 5 > max_df = 4
    got = dedup.containment_pairs(df, key="doc_id", shingle_k=3,
                                  threshold=0.1, max_df=4).collect()
    assert got == []
    got2 = dedup.containment_pairs(df, key="doc_id", shingle_k=3,
                                   threshold=0.99, max_df=5).collect()
    assert len(got2) == 10 and all(r["containment"] == 1.0 for r in got2)
