"""Batch-70 units: BPE merge rounds (python brute with the same greedy
leftmost-non-overlapping rewrite; overlap and merged-token-remerge
fixtures) and the exact L1 medoid (numpy brute)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def _brute_bpe(texts, rounds):
    corp = ["\x02" + "\x02 \x02".join(t.split(" ")) + "\x02"
            for t in texts]
    out = []
    for r in range(1, rounds + 1):
        cnt = {}
        for s in corp:
            tk = s.split(" ")
            for i in range(len(tk) - 1):
                pr = tk[i] + " " + tk[i + 1]
                cnt[pr] = cnt.get(pr, 0) + 1
        pr = min(cnt, key=lambda p: (-cnt[p], p))
        merged = pr.replace("\x02 \x02", "\x01")
        out.append((r, pr.replace("\x02", ""), cnt[pr]))
        corp = [s.replace(pr, merged) for s in corp]
    return out, corp


def test_bpe_merges_vs_brute(spark):
    docs = em._docs(spark, SF).select("text").toPandas()["text"]
    exp, _ = _brute_bpe(list(docs), em.BPE_ROUNDS)
    got = [(r["round"], r["pair"], r["freq"])
           for r in em.q_bpe_merges(spark, SF).orderBy("round").collect()]
    assert got == exp
    # merge frequencies are non-increasing across rounds: the argmax of
    # round r+1 was available (or created, never larger than its
    # sources) in round r
    freqs = [f for _, _, f in got]
    assert all(a >= b for a, b in zip(freqs, freqs[1:]))
    assert freqs[-1] > 1


def test_bpe_overlap_and_remerge():
    # 'a a a' merges once (greedy leftmost, no overlap) …
    out, corp = _brute_bpe(["a a a"], 1)
    assert corp == ["\x02a\x01a\x02 \x02a\x02"]
    # … and a merged token is itself mergeable next round
    out, corp = _brute_bpe(["a b a b c", "a b c"], 2)
    assert out[0][1] == "a b"
    assert out[1][1] == "a\x01b c"
    assert corp[1] == "\x02a\x01b\x01c\x02"


def test_l1_medoid_vs_brute(spark):
    pts = minted.minted_cluster_points_q(spark, SF).toPandas()
    pts["g"] = pts["doc_id"] % minted.N_CLUSTERS
    exp = {}
    for g, grp in pts.groupby("g"):
        xs = np.sort(grp["qx"].to_numpy())
        ys = np.sort(grp["qy"].to_numpy())
        n = len(grp)
        medx, medy = int(xs[(n + 1) // 2 - 1]), int(ys[(n + 1) // 2 - 1])
        d = (np.abs(grp["qx"] - medx) + np.abs(grp["qy"] - medy))
        order = sorted(zip(d, grp["doc_id"]))
        exp[int(g)] = (n, medx, medy, int(order[0][1]), int(order[0][0]))
        # separability sanity: the per-axis median minimizes ΣL1 over
        # the plane — any member point must cost at least as much
        tot_med = int(d.sum())
        r0 = grp.iloc[0]
        tot_pt = int((np.abs(grp["qx"] - r0.qx)
                      + np.abs(grp["qy"] - r0.qy)).sum())
        assert tot_pt >= tot_med
    got = {r["g"]: (r["n"], r["medx"], r["medy"], r["medoid_doc"],
                    r["medoid_dist"])
           for r in em.q_l1_medoid(spark, SF).collect()}
    assert got == exp
