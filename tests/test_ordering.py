"""Range-partition sort: boundary determinism, tiling, export replay."""

import glob

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest

import ray as _ray

from pdf_extractor_ray.functions.ordering import (
    range_partition_map,
    range_sort_manifest,
    range_sorted_export,
)


def _keys_df(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    # lognormal-ish skewed int keys
    keys = (rng.lognormal(10, 2, n)).astype(np.int64)
    return pd.DataFrame({"doc_id": np.arange(n), "key": keys})


class TestManifest:
    def test_parts_tile_and_cover(self, ray_session):
        df = _keys_df()
        m = (
            range_sort_manifest(
                _ray.data.from_pandas(df), "key", n_parts=8, cell_shift=10
            )
            .to_pandas()
            .sort_values("part")
            .reset_index(drop=True)
        )
        assert m.n_rows.sum() == len(df)
        assert sorted(m.part.tolist()) == list(range(len(m)))
        # parts tile the key space in order: max of part i < min of i+1
        for i in range(len(m) - 1):
            assert m.max_key[i] < m.min_key[i + 1]
        # balanced within cell granularity: no empty parts, largest
        # part bounded by a small multiple of the ideal size
        assert (m.n_rows > 0).all()
        assert m.n_rows.max() < len(df) / 8 * 3

    def test_fingerprint_is_global_sort(self, ray_session):
        import hashlib

        df = _keys_df(800)
        m = (
            range_sort_manifest(
                _ray.data.from_pandas(df), "key", n_parts=4, cell_shift=10
            )
            .to_pandas()
            .sort_values("part")
        )
        # concatenating the per-part sorted key strings in part order
        # must equal the md5s of the globally sorted key sequence
        all_sorted = np.sort(df.key.to_numpy())
        pos = 0
        for _, row in m.iterrows():
            seg = all_sorted[pos : pos + row.n_rows]
            want = hashlib.md5(
                ",".join(str(x) for x in seg).encode()
            ).hexdigest()
            assert row.keys_md5 == want
            pos += row.n_rows
        assert pos == len(df)

    def test_partitioning_invariance(self, ray_session):
        df = _keys_df(2000)
        a = (
            range_sort_manifest(
                _ray.data.from_pandas(df), "key", 8, 10
            )
            .to_pandas()
            .sort_values("part")
            .reset_index(drop=True)
        )
        b = (
            range_sort_manifest(
                _ray.data.from_pandas(df).repartition(17), "key", 8, 10
            )
            .to_pandas()
            .sort_values("part")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestExport:
    def test_written_parts_replay_global_sort(self, ray_session, tmp_path):
        df = _keys_df(3000)
        out = str(tmp_path / "sorted")
        m = range_sorted_export(
            _ray.data.from_pandas(df), out, "key", n_parts=4, cell_shift=10
        ).to_pandas()
        assert m.n_rows.sum() == len(df)
        got = []
        for p in sorted(
            int(d.split("part=")[1].split("/")[0])
            for d in glob.glob(out + "/part=*")
        ):
            t = pads.dataset(
                out + f"/part={p}", format="parquet"
            ).to_table(columns=["key"])
            keys = t["key"].to_pylist()
            assert keys == sorted(keys)  # sorted within part
            got.extend(keys)
        assert got == sorted(df.key.tolist())  # global order replayed


class TestPartitionMap:
    def test_deterministic_and_monotone(self, ray_session):
        df = _keys_df(1000)
        pm = range_partition_map(
            _ray.data.from_pandas(df), "key", 8, cell_shift=10
        )
        cells = sorted(pm)
        parts = [pm[c] for c in cells]
        assert parts == sorted(parts)  # monotone over cells
        assert parts[0] == 0 and parts[-1] == 7

    def test_empty_input(self, ray_session):
        df = pd.DataFrame({"doc_id": [], "key": []}).astype("int64")
        assert (
            range_partition_map(_ray.data.from_pandas(df), "key", 8) == {}
        )
