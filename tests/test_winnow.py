"""Winnowing fingerprints (functions/winnow.py) vs a brute-force
reference implementation, plus planted-overlap semantics."""

import hashlib

import pandas as pd
import pytest
import ray.data

from pdf_extractor_ray.functions.winnow import (
    _doc_fingerprints,
    winnow_fingerprints,
)


def brute_winnow(text: str, k: int, w: int):
    """O(n*w) straight-from-the-paper robust winnowing: min hash per
    window, rightmost on ties, distinct selected positions."""
    words = (text or "").lower().split()
    grams = [" ".join(words[j : j + k]) for j in range(max(len(words) - k + 1, 0))]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    ng = len(hs)
    sel = set()
    if ng:
        width = min(w, ng)
        for s in range(ng - width + 1):
            window = hs[s : s + width]
            m = min(window)
            # rightmost index of the min
            sel.add(s + max(i for i, h in enumerate(window) if h == m))
    return ng, sorted(sel), hs


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "a a a a a a a a a a",  # all-equal hashes: rightmost-tie path
    "short text",  # fewer words than k -> zero grams
    "",  # empty doc
    "one two three four",  # exactly one gram
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon",
]


@pytest.mark.parametrize("k,w", [(4, 5), (3, 4), (5, 2)])
def test_doc_fingerprints_match_brute(k, w):
    for t in TEXTS:
        ng_b, sel_b, hs = brute_winnow(t, k, w)
        ng, sel, hexes = _doc_fingerprints(t, k, w)
        assert ng == ng_b
        assert list(sel) == sel_b
        assert hexes == [hs[p] for p in sel_b]


def test_winnow_dataset_end_to_end(ray_session):
    # doc 2 is a verbatim copy of doc 0 -> every fingerprint shared;
    # doc 3 shares a long substring -> partial overlap; doc 4 disjoint
    base = (
        "we hold these truths to be self evident that all men are "
        "created equal endowed with certain unalienable rights"
    )
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": base},
        {"doc_id": 3, "text": base + " and extra trailing words here"},
        {"doc_id": 4, "text": "completely different content with no overlap "
                              "whatsoever in any gram of this text"},
    ]
    ds = ray.data.from_items(rows)
    out = winnow_fingerprints(ds, k=4, w=5).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 5

    for _, r in out.iterrows():
        ng_b, sel_b, hs = brute_winnow(rows[int(r.doc_id)]["text"], 4, 5)
        assert r.n_grams == ng_b
        assert r.n_fp == len(sel_b)
        want = hashlib.md5("".join(hs[p] for p in sel_b).encode()).hexdigest()
        assert r.fp_digest == want

    by_id = out.set_index("doc_id")
    # identical docs share their entire (distinct) fingerprint set
    n_distinct_0 = len({h for h in brute_hexes(rows[0]["text"])})
    assert by_id.loc[0, "n_shared"] == n_distinct_0
    assert by_id.loc[2, "n_shared"] == n_distinct_0
    assert by_id.loc[0, "fp_digest"] == by_id.loc[2, "fp_digest"]
    # prefix-sharing doc overlaps partially
    assert 0 < by_id.loc[3, "n_shared"] <= by_id.loc[3, "n_fp"]
    # disjoint + empty docs share nothing
    assert by_id.loc[4, "n_shared"] == 0
    assert by_id.loc[1, "n_shared"] == 0
    assert by_id.loc[1, "n_fp"] == 0
    assert by_id.loc[1, "fp_digest"] == hashlib.md5(b"").hexdigest()


def brute_hexes(text: str, k: int = 4, w: int = 5):
    ng, sel, hs = brute_winnow(text, k, w)
    return {hs[p] for p in sel}
