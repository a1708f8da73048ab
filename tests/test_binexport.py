"""Binary token-shard export (functions/binexport.py)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_ray.functions.binexport import (
    export_token_bin_shards,
    read_token_bin_manifest,
)


def _chunks_df():
    rng = np.random.RandomState(5)
    rows = []
    for cid in range(11):  # 11 chunks over 3 shards (mod 3)
        n = 64 if cid < 10 else 17  # short tail chunk
        rows.append(
            {
                "chunk_id": cid,
                "ids": rng.randint(0, 32000, size=n).astype(np.int32).tolist(),
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture()
def exported(ray_session, tmp_path):
    import ray.data

    df = _chunks_df()
    ds = ray.data.from_pandas(df).repartition(4)
    shards = export_token_bin_shards(ds, str(tmp_path), n_shards=3)
    return df, str(tmp_path), shards


class TestBinExport:
    def test_round_trip_bytes(self, exported):
        df, out, shards = exported
        assert shards == [0, 1, 2]
        for s in shards:
            want = df[df["chunk_id"] % 3 == s].sort_values("chunk_id")
            toks = np.concatenate([np.asarray(x) for x in want["ids"]])
            with open(os.path.join(out, f"shard-{s:05d}.bin"), "rb") as f:
                raw = f.read()
            assert raw == toks.astype("<u2").tobytes()
            idx = np.frombuffer(
                open(os.path.join(out, f"shard-{s:05d}.idx"), "rb").read(),
                dtype="<i8",
            ).reshape(-1, 3)
            assert list(idx[:, 0]) == list(want["chunk_id"])
            assert list(idx[:, 2]) == [len(x) for x in want["ids"]]
            # offsets are the exclusive prefix sum of lengths
            assert list(idx[:, 1]) == list(
                np.concatenate([[0], np.cumsum(idx[:, 2])[:-1]])
            )

    def test_memmap_chunk_lookup(self, exported):
        """The .idx triples let a dataloader mmap any chunk directly."""
        df, out, _ = exported
        s = 1
        m = np.memmap(
            os.path.join(out, f"shard-{s:05d}.bin"), dtype="<u2", mode="r"
        )
        idx = np.frombuffer(
            open(os.path.join(out, f"shard-{s:05d}.idx"), "rb").read(),
            dtype="<i8",
        ).reshape(-1, 3)
        for cid, off, n in idx:
            want = np.asarray(df.loc[df["chunk_id"] == cid, "ids"].iloc[0])
            assert np.array_equal(m[off : off + n], want.astype("<u2"))

    def test_manifest_matches_disk(self, exported, ray_session):
        df, out, shards = exported
        man = read_token_bin_manifest(out, shards)
        assert list(man["shard"]) == shards
        for _, row in man.iterrows():
            raw = open(
                os.path.join(out, f"shard-{row['shard']:05d}.bin"), "rb"
            ).read()
            assert row["n_tokens"] == len(raw) // 2
            assert (
                row["bin_md5"]
                == hashlib.md5(raw.hex().encode()).hexdigest()
            )

    def test_no_tmp_leftovers(self, exported):
        _, out, _ = exported
        assert not [p for p in os.listdir(out) if p.endswith(".tmp")]

    def test_uint16_overflow_raises(self, ray_session, tmp_path):
        import ray.data

        df = pd.DataFrame(
            {"chunk_id": [0], "ids": [[70000]]}
        )
        ds = ray.data.from_pandas(df)
        with pytest.raises(Exception, match="uint16|RayTaskError"):
            export_token_bin_shards(ds, str(tmp_path), n_shards=2)
