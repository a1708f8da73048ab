"""Greedy k-center coreset selection (functions/coreset.py)."""

import numpy as np
import pandas as pd

from pdf_extractor_ray.functions.coreset import kcenter_select


def _reference(ids, mat, k):
    """Serial farthest-first over centi-quantized integer distances."""
    q = np.floor(mat.astype(np.float64) * 100.0 + 0.5).astype(np.int64)
    order = np.argsort(ids)
    ids, q = np.asarray(ids)[order], q[order]
    sel = [0]  # lowest id is first after the sort
    mind = np.full(len(ids), np.iinfo(np.int64).max)
    for _ in range(1, k):
        diff = q - q[sel[-1]][None, :]
        mind = np.minimum(mind, np.einsum("ij,ij->i", diff, diff))
        # argmax with (mind DESC, id ASC) tie order
        best = np.lexsort((ids, -mind))[0]
        sel.append(int(best))
    return [int(ids[j]) for j in sel]


def _mk(ray_session, ids, mat, parts=4):
    import ray.data

    df = pd.DataFrame(
        {"vec_id": ids, "embedding": [list(map(float, v)) for v in mat]}
    )
    return ray.data.from_pandas(df).repartition(parts)


class TestKCenter:
    def test_matches_serial_reference(self, ray_session):
        rng = np.random.RandomState(3)
        ids = rng.permutation(500)[:120].astype(np.int64)
        mat = rng.randn(120, 12)
        got = kcenter_select(_mk(ray_session, ids, mat), k=7)
        assert list(got["center_id"]) == _reference(ids, mat, 7)
        assert list(got["rank"]) == list(range(7))

    def test_planted_outliers_selected_first(self, ray_session):
        rng = np.random.RandomState(4)
        mat = rng.randn(80, 8) * 0.01  # tight cluster
        mat[17] = 50.0  # two extreme outliers
        mat[63] = -50.0
        ids = np.arange(80, dtype=np.int64)
        got = kcenter_select(_mk(ray_session, ids, mat), k=3)
        # seed is id 0; the two outliers must be picked next
        assert set(got["center_id"].iloc[1:]) == {17, 63}

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(5)
        ids = np.arange(100, dtype=np.int64)
        mat = rng.randn(100, 6)
        a = kcenter_select(_mk(ray_session, ids, mat, parts=1), k=5)
        b = kcenter_select(_mk(ray_session, ids, mat, parts=13), k=5)
        pd.testing.assert_frame_equal(a, b)


class TestKExceedsPoints:
    """ADVICE r4: k past the number of distinct points must early-stop,
    never emit duplicate center_ids."""

    def test_k_larger_than_n(self, ray_session):
        rng = np.random.RandomState(9)
        ids = np.arange(6, dtype=np.int64)
        mat = rng.randn(6, 4)
        got = kcenter_select(_mk(ray_session, ids, mat, parts=2), k=10)
        assert len(got) == 6
        assert got["center_id"].is_unique
        assert list(got["rank"]) == list(range(6))

    def test_duplicate_points_early_stop(self, ray_session):
        # 3 distinct locations, each duplicated — farthest-first is
        # exhausted after 3 picks even though n = 6 and k = 5
        mat = np.array(
            [[0.0, 0.0], [0.0, 0.0], [10.0, 0.0],
             [10.0, 0.0], [0.0, 10.0], [0.0, 10.0]]
        )
        ids = np.arange(6, dtype=np.int64)
        got = kcenter_select(_mk(ray_session, ids, mat, parts=3), k=5)
        assert len(got) == 3
        assert got["center_id"].is_unique
