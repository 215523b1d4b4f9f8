"""Batch-98 units: convex layers (python peeling brute reusing the
pytest-proven chain, layer-sum conservation, crafted nested squares)
and Soundex (textbook sequential coder + the published standard
examples pin the h/w-bridge and vowel-separator rules)."""
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators.hull import _chain

SF = "/root/testdata/sf0.001"


def brute_layers(pts):
    pts = sorted(set(pts))
    n0 = len(pts)
    layers = 0
    while True:
        h = _chain(pts)
        if not h:
            break
        layers += 1
        hs = set(h)
        pts = [p for p in pts if p not in hs]
    return (n0, layers, len(pts))


def test_convex_layers_crafted():
    # two nested squares + center: 2 layers, core = the center point
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    inner = [(3, 3), (7, 3), (7, 7), (3, 7)]
    assert brute_layers(outer + inner + [(5, 5)]) == (9, 2, 1)
    # collinear points never form a layer
    assert brute_layers([(0, 0), (1, 1), (2, 2)]) == (3, 0, 3)


def test_convex_layers_vs_brute(spark):
    from geobuf_spark.sources import minted
    rows = minted.minted_cluster_points_q(spark, SF).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["doc_id"] % minted.N_CLUSTERS, []).append(
            (r["qx"], r["qy"]))
    exp = {g: brute_layers(ps) for g, ps in groups.items()}
    got = {r["gid"]: (r["n_pts"], r["n_layers"], r["core_pts"])
           for r in em.q_convex_layers(spark, SF).collect()}
    assert got == exp
    assert any(v[1] >= 2 for v in got.values())  # real onion depth


def soundex_py(w):
    codes = {**{c: "1" for c in "bfpv"},
             **{c: "2" for c in "cgjkqsxz"},
             **{c: "3" for c in "dt"}, "l": "4",
             **{c: "5" for c in "mn"}, "r": "6",
             **{c: "0" for c in "aeiouy"}}
    seq = [codes[c] for c in w.lower() if c in codes]  # h/w dropped
    coll = [d for i, d in enumerate(seq)
            if i == 0 or d != seq[i - 1]]
    tail = coll if w[0].lower() in "hw" else coll[1:]
    digits = [d for d in tail if d != "0"][:3]
    return w[0].upper() + "".join(digits).ljust(3, "0")


def test_soundex_standard_examples():
    assert soundex_py("Robert") == "R163"
    assert soundex_py("Rupert") == "R163"
    assert soundex_py("Tymczak") == "T522"
    assert soundex_py("Pfister") == "P236"
    assert soundex_py("Honeyman") == "H555"
    assert soundex_py("Ashcraft") == "A261"  # h-bridge collapses s,c


def test_soundex_groups_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    cnt = {}
    for t in d["text"]:
        for tok in t.split(" "):
            cnt[tok] = cnt.get(tok, 0) + 1
    code = {t: soundex_py(t) for t in cnt}
    sizes = {}
    for t, c in code.items():
        sizes[c] = sizes.get(c, 0) + 1
    exp = {t: (code[t], cnt[t], sizes[code[t]]) for t in cnt}
    got = {r["tok"]: (r["soundex"], r["n_occ"], r["group_size"])
           for r in em.q_soundex_groups(spark, SF).collect()}
    assert got == exp
    # the 31-token vocab happens to produce all-distinct codes; the
    # crafted Robert/Rupert pair above pins real blocking. Here: codes
    # are well-formed L###
    import re
    for c, _, s in got.values():
        assert re.fullmatch(r"[A-Z][0-9]{3}", c) and s >= 1
