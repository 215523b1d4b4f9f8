"""Batch-68 units: content-defined chunking (vs a python brute with the
same rolling boundary rule, plus the edit-locality property CDC exists
for) and the k-anonymity audit (pandas brute)."""
import hashlib

import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _chunks(text: str) -> list:
    tk = text.split(" ")
    bp = [i for i in range(1, len(tk))
          if _h60(f"{tk[i - 1]}\x1e{tk[i]}") % em.CDC_P == 0]
    ed = [0] + bp + [len(tk)]
    return [" ".join(tk[ed[j]:ed[j + 1]]) for j in range(len(ed) - 1)]


def test_cdc_chunks_vs_brute(spark):
    docs = em._docs(spark, SF).select("doc_id", "text").toPandas()
    stats = {}
    for r in docs.itertuples():
        for c in _chunks(r.text):
            fp = _h60(c)
            occ, dset = stats.get(fp, (0, set()))
            dset.add(r.doc_id)
            stats[fp] = (occ + 1, dset)
    ranked = sorted(((len(d), occ, fp) for fp, (occ, d) in stats.items()),
                    key=lambda t: (-t[0], -t[1], t[2]))[:em.CDC_TOP]
    exp = [(fp, occ, nd) for nd, occ, fp in ranked]
    got = [(r["fp"], r["n_occ"], r["n_docs"])
           for r in em.q_cdc_chunks(spark, SF)
           .orderBy("n_docs", "n_occ", "fp", ascending=[False, False,
                                                        True]).collect()]
    assert got == exp
    # dedup has to find real sharing: the winner spans multiple docs
    assert got[0][2] > 1


def test_cdc_boundaries_are_edit_local():
    # THE property content-defined chunking buys: prepending tokens only
    # changes chunks up to the first boundary — everything after is
    # byte-identical (fixed-width blocks would shift every chunk)
    base = "the quick brown fox jumps over a lazy dog " * 30
    a = _chunks(base.strip())
    b = _chunks(("zzz qqq " + base).strip())
    assert len(a) > 3  # boundary rule actually fires on this text
    # all chunks of a except possibly the first must survive in b
    assert set(a[1:]) <= set(b)


def test_k_anonymity_audit_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["lang", "source", "n_chars"])
    d["len_bucket"] = d["n_chars"] // 200
    g = (d.groupby(["lang", "source", "len_bucket"]).size()
         .reset_index(name="n"))
    exp = {(r.lang, r.source, int(r.len_bucket)): int(r.n)
           for r in g.itertuples() if r.n < em.K_ANON}
    got = {(r["lang"], r["source"], r["len_bucket"]): r["n"]
           for r in em.q_k_anonymity_audit(spark, SF).collect()}
    assert got == exp
    # the gate must split: violations exist, but not every cell violates
    assert 0 < len(exp) < len(g)
