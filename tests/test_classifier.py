"""Hashed-feature linear classifier: distributed == serial, smoothing,
broadcast-scoring semantics."""

import hashlib

import numpy as np
import pandas as pd
import pytest

import ray as _ray

from pdf_extractor_ray.functions.classifier import (
    hash_feature,
    score_hashed_linear,
    train_hashed_linear,
    weights_to_dense,
)

F = 4096
SCALE = 1_000_000


def _serial_train(texts, labels):
    counts = {}
    for t, lab in zip(texts, labels):
        for tok in t.split():
            f = hash_feature(tok, F)
            c = counts.setdefault(f, [0, 0])
            c[1 if lab else 0] += 1
    return {
        f: (c0, c1, SCALE * (c1 + 1) // (c0 + c1 + 2))
        for f, (c0, c1) in counts.items()
    }


def _mk_corpus(n=400):
    texts, labels = [], []
    for d in range(n):
        toks = [f"c{d % 5}", f"c{(d * 3) % 5}"]
        toks += [f"s{d % 7}", f"s{(d * 2) % 7}"] if d % 2 else [f"h{d % 9}"]
        texts.append(" ".join(toks))
        labels.append(d % 2)
    return pd.DataFrame(
        {"doc_id": np.arange(n), "text": texts, "label": labels}
    )


class TestTrain:
    def test_matches_serial_counts_and_weights(self, ray_session):
        df = _mk_corpus()
        want = _serial_train(df.text, df.label)
        got = (
            train_hashed_linear(
                _ray.data.from_pandas(df), n_features=F
            )
            .to_pandas()
            .set_index("feat")
        )
        assert len(got) == len(want)
        for f, (c0, c1, w) in want.items():
            row = got.loc[f]
            assert (int(row.c0), int(row.c1), int(row.w)) == (c0, c1, w)

    def test_partitioning_invariance(self, ray_session):
        df = _mk_corpus()
        a = (
            train_hashed_linear(_ray.data.from_pandas(df), n_features=F)
            .to_pandas()
            .sort_values("feat")
            .reset_index(drop=True)
        )
        b = (
            train_hashed_linear(
                _ray.data.from_pandas(df).repartition(11), n_features=F
            )
            .to_pandas()
            .sort_values("feat")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_empty_and_null_texts_ignored(self, ray_session):
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["tok tok", "", None],
                "label": [1, 0, 0],
            }
        )
        got = train_hashed_linear(
            _ray.data.from_pandas(df), n_features=F
        ).to_pandas()
        assert len(got) == 1
        assert int(got.iloc[0].c1) == 2 and int(got.iloc[0].c0) == 0


class TestScore:
    def test_scores_match_serial_and_separate_classes(self, ray_session):
        df = _mk_corpus()
        model = _serial_train(df.text, df.label)
        weights = train_hashed_linear(
            _ray.data.from_pandas(df), n_features=F
        ).to_pandas()
        dense = weights_to_dense(weights, F)
        out = (
            score_hashed_linear(_ray.data.from_pandas(df), dense)
            .to_pandas()
            .set_index("doc_id")
        )
        for d, t in zip(df.doc_id, df.text):
            toks = t.split()
            s = sum(model[hash_feature(x, F)][2] for x in toks) // len(toks)
            assert int(out.loc[d, "score"]) == s
            assert int(out.loc[d, "n_tokens"]) == len(toks)
            assert int(out.loc[d, "predicted"]) == (s >= SCALE // 2)
        # the planted corpus is separable
        acc = (out["predicted"].to_numpy() == df.label.to_numpy()).mean()
        assert acc == 1.0

    def test_unseen_feature_defaults_to_half_scale(self, ray_session):
        dense = weights_to_dense(
            pd.DataFrame({"feat": [0], "w": [999_999]}), F
        )
        df = pd.DataFrame({"doc_id": [0], "text": ["zzz_never_trained"]})
        out = score_hashed_linear(
            _ray.data.from_pandas(df), dense
        ).to_pandas()
        assert int(out.iloc[0].score) == SCALE // 2

    def test_empty_doc_scores_zero_not_crash(self, ray_session):
        dense = weights_to_dense(pd.DataFrame({"feat": [], "w": []}), F)
        df = pd.DataFrame({"doc_id": [0, 1], "text": ["", None]})
        out = score_hashed_linear(
            _ray.data.from_pandas(df), dense
        ).to_pandas()
        assert out.score.tolist() == [0, 0]
        assert out.n_tokens.tolist() == [0, 0]


class TestHashFeature:
    def test_matches_sql_idiom(self):
        import duckdb

        toks = ["alpha", "beta", "common_3", "spam_11", "café"]
        for t in toks:
            sql = duckdb.sql(
                "SELECT ('0x' || substring(md5(?), 1, 8))::UBIGINT % "
                f"{F}", params=[t]
            ).fetchone()[0]
            assert hash_feature(t, F) == int(sql)
