"""Prefix-filter exact set-similarity join (dedup.jaccard_join_prefix)."""

import itertools

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_ray.functions.dedup import (
    jaccard_join_prefix,
    ngram_jaccard,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(2)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(80):
        words = [vocab[j] for j in rng.randint(0, 300, size=30)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    # planted near-dups: one word changed (3-gram jaccard ~0.8)
    for i in range(0, 80, 10):
        w = rows[i]["text"].split()
        w[3] = "CHANGED"
        rows.append({"doc_id": 1000 + i, "text": " ".join(w)})
    return pd.DataFrame(rows)


def _brute(df: pd.DataFrame, t: float) -> set:
    want = set()
    recs = sorted(zip(df["doc_id"], df["text"]))
    for (ia, ta), (ib, tb) in itertools.combinations(recs, 2):
        if ngram_jaccard(ta, tb) >= t:
            want.add((ia, ib))
    return want


class TestJaccardJoinPrefix:
    @pytest.mark.parametrize("t_pm", [500, 600, 800])
    def test_completeness_vs_bruteforce(self, ray_session, corpus, t_pm):
        """Prefix filtering is LOSSLESS: the result must equal the
        full cross-join pair set at every threshold."""
        import ray.data

        ds = ray.data.from_pandas(corpus).repartition(5)
        out = jaccard_join_prefix(ds, threshold_pm=t_pm).to_pandas()
        got = set(zip(out["doc_a"], out["doc_b"]))
        assert got == _brute(corpus, t_pm / 1000.0)

    def test_partition_invariance(self, ray_session, corpus):
        import ray.data

        outs = []
        for parts in (2, 9):
            out = jaccard_join_prefix(
                ray.data.from_pandas(corpus).repartition(parts),
                threshold_pm=600,
            ).to_pandas()
            outs.append(
                sorted(zip(out["doc_a"], out["doc_b"]))
            )
        assert outs[0] == outs[1]
