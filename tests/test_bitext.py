"""Margin-based bitext mining (functions/bitext.py)."""

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_ray.functions.bitext import bitext_margin_pairs


def _reference_margin(x_ids, x_mat, y_ids, y_mat, k, top_n):
    """Plain-numpy replay of the margin spec."""

    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    xs, ys = norm(x_mat.astype(np.float64)), norm(y_mat.astype(np.float64))
    sims = xs @ ys.T  # (X, Y)
    kk = min(k, sims.shape[1])
    rows = []
    # per-x and per-y top-k averages
    ax = np.sort(sims, axis=1)[:, ::-1][:, :kk].sum(axis=1) / kk
    ay = np.sort(sims, axis=0)[::-1][: min(k, sims.shape[0])].sum(
        axis=0
    ) / min(k, sims.shape[0])
    for i in range(sims.shape[0]):
        order = np.argsort(-sims[i], kind="stable")[:kk]
        for j in order:
            rows.append(
                (
                    x_ids[i],
                    y_ids[j],
                    sims[i, j] / ((ax[i] + ay[j]) / 2.0),
                )
            )
    df = pd.DataFrame(rows, columns=["src_id", "tgt_id", "margin"])
    df = df.sort_values(
        ["margin", "src_id", "tgt_id"], ascending=[False, True, True]
    ).head(top_n)
    df = df.reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["src_id", "tgt_id", "rank"]]


@pytest.fixture(scope="module")
def sides():
    rng = np.random.RandomState(11)
    d = 16
    y_mat = rng.randn(40, d)
    x_mat = rng.randn(100, d)
    # plant 3 exact "translations": x rows that equal a y row (cos=1,
    # maximal margin) — the miner must surface all three at the top
    planted = [(5, 7), (42, 19), (77, 33)]
    for xi, yj in planted:
        x_mat[xi] = y_mat[yj]
    x_ids = np.arange(1000, 1100, dtype=np.int64)
    y_ids = np.arange(2000, 2040, dtype=np.int64)
    return x_ids, x_mat, y_ids, y_mat, planted


def _mk_ds(ray_session, ids, mat, parts):
    import ray.data

    df = pd.DataFrame(
        {"vec_id": ids, "embedding": [list(map(float, v)) for v in mat]}
    )
    return ray.data.from_pandas(df).repartition(parts)


class TestBitextMargin:
    def test_matches_numpy_reference(self, ray_session, sides):
        x_ids, x_mat, y_ids, y_mat, _ = sides
        got = bitext_margin_pairs(
            _mk_ds(ray_session, x_ids, x_mat, 4), y_ids, y_mat, k=4, top_n=15
        )
        want = _reference_margin(x_ids, x_mat, y_ids, y_mat, k=4, top_n=15)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_planted_translations_surface(self, ray_session, sides):
        x_ids, x_mat, y_ids, y_mat, planted = sides
        got = bitext_margin_pairs(
            _mk_ds(ray_session, x_ids, x_mat, 4), y_ids, y_mat, k=4, top_n=10
        )
        top = set(zip(got["src_id"].head(3), got["tgt_id"].head(3)))
        want = {(1000 + xi, 2000 + yj) for xi, yj in planted}
        assert top == want

    def test_partition_invariance(self, ray_session, sides):
        x_ids, x_mat, y_ids, y_mat, _ = sides
        a = bitext_margin_pairs(
            _mk_ds(ray_session, x_ids, x_mat, 1), y_ids, y_mat, k=3, top_n=12
        )
        b = bitext_margin_pairs(
            _mk_ds(ray_session, x_ids, x_mat, 9), y_ids, y_mat, k=3, top_n=12
        )
        pd.testing.assert_frame_equal(a, b)

    def test_unsorted_y_side(self, ray_session, sides):
        """The broadcast side may arrive in any id order."""
        x_ids, x_mat, y_ids, y_mat, _ = sides
        perm = np.random.RandomState(3).permutation(len(y_ids))
        a = bitext_margin_pairs(
            _mk_ds(ray_session, x_ids, x_mat, 4),
            y_ids[perm],
            y_mat[perm],
            k=4,
            top_n=10,
        )
        b = bitext_margin_pairs(
            _mk_ds(ray_session, x_ids, x_mat, 4), y_ids, y_mat, k=4, top_n=10
        )
        pd.testing.assert_frame_equal(a, b)


class TestSmallSides:
    """ADVICE r4: divisor convention when a side has fewer than k rows.

    Pinned convention: both neighbor averages are TRUE averages over the
    neighbors actually available — forward sum / min(k, |Y|), backward
    sum / min(k, |X|) — matching the oracle's ``avg(cos)``.
    """

    def test_y_smaller_than_k(self, ray_session):
        rng = np.random.RandomState(21)
        y_mat = rng.randn(2, 8)  # |Y| = 2 < k = 4
        x_mat = rng.randn(30, 8)
        x_ids = np.arange(100, 130, dtype=np.int64)
        y_ids = np.array([900, 901], dtype=np.int64)
        got = bitext_margin_pairs(
            _mk_ds(ray_session, x_ids, x_mat, 3), y_ids, y_mat, k=4, top_n=8
        )
        want = _reference_margin(x_ids, x_mat, y_ids, y_mat, k=4, top_n=8)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_x_smaller_than_k(self, ray_session):
        rng = np.random.RandomState(22)
        y_mat = rng.randn(25, 8)
        x_mat = rng.randn(3, 8)  # |X| = 3 < k = 4
        x_ids = np.array([7, 8, 9], dtype=np.int64)
        y_ids = np.arange(500, 525, dtype=np.int64)
        got = bitext_margin_pairs(
            _mk_ds(ray_session, x_ids, x_mat, 2), y_ids, y_mat, k=4, top_n=6
        )
        want = _reference_margin(x_ids, x_mat, y_ids, y_mat, k=4, top_n=6)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )
