"""Batch-86 units: compaction bin-packing plan (sequential python NFD
brute + packing invariants + crafted oversized case) and the Simpson's-
paradox audit (pandas brute + pooled-equals-sum consistency)."""
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def brute_nfd(files, target):
    """files: [(lang, size)] → [(bin, n_files, fill)] — sort size DESC
    lang ASC, split the stream greedily at target."""
    files = sorted(files, key=lambda t: (-t[1], t[0]))
    bins, b, n, fill = [], 0, 0, 0
    for _, s in files:
        if b == 0 or fill + s > target:
            if b > 0:
                bins.append((b, n, fill))
            b, n, fill = b + 1, 1, s
        else:
            n, fill = n + 1, fill + s
    bins.append((b, n, fill))
    return bins


def test_compaction_plan_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["source", "lang", "n_chars"])
    sizes = (d.groupby(["source", "lang"])["n_chars"].sum() + 256)
    exp = {}
    for src, g in sizes.groupby(level=0):
        fs = [(lang, int(s)) for (_, lang), s in g.items()]
        for b, n, fill in brute_nfd(fs, em.COMPACT_TARGET):
            exp[(src, b)] = (n, fill, fill > em.COMPACT_TARGET)
    got = {(r["source"], r["bin"]): (r["n_files"], r["fill_bytes"],
                                     r["oversized"])
           for r in em.q_compaction_plan(spark, SF).collect()}
    assert got == exp
    # invariants: per-source bins are 1..k; fills conserve bytes;
    # non-oversized bins respect the target
    total = int(sizes.sum())
    assert sum(f for _, f, _ in got.values()) == total
    per_src = {}
    for (src, b), (n, f, ov) in got.items():
        per_src.setdefault(src, []).append(b)
        assert ov == (f > em.COMPACT_TARGET)
        if not ov:
            assert f <= em.COMPACT_TARGET
        assert n >= 1
    for bs in per_src.values():
        assert sorted(bs) == list(range(1, len(bs) + 1))
    assert any(n > 1 for n, _, _ in got.values())  # real packing


def test_compaction_crafted_oversized():
    # an oversized file opens (and closes) its own bin mid-stream
    bins = brute_nfd([("a", 5000), ("b", 3000), ("c", 3000),
                      ("d", 100)], target=4096)
    # sorted: 5000, 3000, 3000, 100 → [5000] | [3000] | [3000, 100]
    assert bins == [(1, 1, 5000), (2, 1, 3000), (3, 2, 3100)]
    # and a uniform case that actually packs
    bins2 = brute_nfd([(c, 1000) for c in "abcdefgh"], target=4096)
    assert bins2 == [(1, 4, 4000), (2, 4, 4000)]


def test_simpsons_paradox_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    df = pd.DataFrame({
        "treat": (ev["user_id"] % 2 == 1).astype(int),
        "dow": (day % 7).astype(int),
        "conv": (ev["event_type"] == "purchase").astype(int)})
    exp = {}
    cells = []
    for dow, g in df.groupby("dow"):
        tc = int(g[g.treat == 1]["conv"].sum())
        tt = int((g.treat == 1).sum())
        cc = int(g[g.treat == 0]["conv"].sum())
        ct = int((g.treat == 0).sum())
        d = tc * ct - cc * tt
        exp[dow] = (tc, tt, cc, ct, (d > 0) - (d < 0))
        cells.append((tc, tt, cc, ct))
    tc, tt, cc, ct = (sum(c[i] for c in cells) for i in range(4))
    d = tc * ct - cc * tt
    exp[-1] = (tc, tt, cc, ct, (d > 0) - (d < 0))
    got = {r["stratum"]: (r["t_conv"], r["t_tot"], r["c_conv"],
                          r["c_tot"], r["dir"])
           for r in em.q_simpsons_paradox(spark, SF).collect()}
    assert got == exp
    # pooled row equals the sum of the strata
    assert got[-1][:4] == tuple(
        sum(got[s][i] for s in range(7)) for i in range(4))
