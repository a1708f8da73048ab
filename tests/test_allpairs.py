"""tfidf_cosine_pairs vs a brute-force in-memory replay: identical
weights (bit_length idf), identical df-band participation, identical
sqrt-free threshold — on a corpus with planted similar pairs."""

import re

import numpy as np
import pandas as pd
import pytest

import ray

from pdf_extractor_ray.functions.allpairs import tfidf_cosine_pairs

_WORD = re.compile(r"[a-z0-9]+")


def _brute(docs: pd.DataFrame, t_pm: int, df_cap: int) -> pd.DataFrame:
    n = len(docs)
    tf: dict[tuple[int, str], int] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        ws = _WORD.findall(text.lower())
        for i in range(len(ws) - 2):
            g = f"{ws[i]} {ws[i+1]} {ws[i+2]}"
            tf[(did, g)] = tf.get((did, g), 0) + 1
    df: dict[str, int] = {}
    for (_, g) in tf:
        df[g] = df.get(g, 0) + 1
    w = {
        (d, g): c * (n // df[g]).bit_length()
        for (d, g), c in tf.items()
        if 2 <= df[g] <= df_cap
    }
    ids = sorted(docs["doc_id"])
    norm = {d: sum(v * v for (dd, _), v in w.items() if dd == d) for d in ids}
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dot = sum(
                v * w.get((b, g), 0) for (dd, g), v in w.items() if dd == a
            )
            if dot and dot * dot * 1_000_000 >= t_pm * t_pm * norm[a] * norm[b]:
                rows.append((a, b, dot, norm[a], norm[b]))
    return pd.DataFrame(
        rows, columns=["doc_a", "doc_b", "dot", "norm_a", "norm_b"]
    ).astype(np.int64)


def test_matches_bruteforce(ray_session):
    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(30):
        words = [vocab[rng.randint(0, 40)] for _ in range(25)]
        texts.append(" ".join(words))
    # planted near-identical pair: doc 30 = doc 0 with one word changed
    texts.append(texts[0].replace(texts[0].split()[5], "zz", 1))
    docs = pd.DataFrame({"doc_id": range(31), "text": texts})

    got = tfidf_cosine_pairs(
        ray.data.from_pandas(docs).repartition(6),
        threshold_pm=400, df_cap=25,
    )
    want = _brute(docs, 400, 25)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
    )
    # the planted pair must clear the bar
    assert ((got["doc_a"] == 0) & (got["doc_b"] == 30)).any()


def test_df_band_is_the_contract(ray_session):
    # a gram shared by EVERY doc (df > cap) must not create pairs
    docs = pd.DataFrame(
        {
            "doc_id": range(5),
            "text": ["common gram here unique%d tail" % i for i in range(5)],
        }
    )
    out = tfidf_cosine_pairs(
        ray.data.from_pandas(docs), threshold_pm=100, df_cap=4
    )
    assert len(out) == 0


def test_containment_catches_partial_copy(ray_session):
    from pdf_extractor_ray.functions.allpairs import containment_pairs

    rng = np.random.RandomState(21)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(vocab[rng.randint(0, 60)] for _ in range(40))
        for _ in range(10)
    ]
    # doc 10 = first quarter of doc 0 embedded in fresh text: low
    # cosine, high containment of the smaller set
    quote = " ".join(texts[0].split()[:10])
    texts.append(quote)
    docs = pd.DataFrame({"doc_id": range(11), "text": texts})
    out = containment_pairs(
        ray.data.from_pandas(docs).repartition(4),
        threshold_pm=700, df_cap=15,
    )
    assert ((out["doc_a"] == 0) & (out["doc_b"] == 10)).any()
    row = out[(out["doc_a"] == 0) & (out["doc_b"] == 10)].iloc[0]
    assert row["n_common"] * 1000 >= 700 * min(row["size_a"], row["size_b"])
