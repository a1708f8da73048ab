"""Distributed pipeline vs single-doc oracle: the byte-identity gate.

Runs on the session-scoped Ray fixture (conftest.py). The pipeline
output for every url must byte-equal the kernel oracle run in-process on
the same row (BASELINE.json per-row invariant).
"""

import os
import shutil

import pyarrow.dataset as pads
import pytest

from pdf_extractor_ray.kernel.extract import extract_document
from pdf_extractor_ray.sources.corpus import make_page_row, write_pages_parquet

N_ROWS = 300


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    write_pages_parquet(d, N_ROWS, rows_per_file=100)
    return d


@pytest.fixture(scope="module")
def extracted(ray_session, corpus_dir):
    from pdf_extractor_ray.pipelines import extract_pages

    rows = extract_pages(corpus_dir).take_all()
    return {r["url"]: r for r in rows}


class TestByteIdentity:
    def test_row_count_and_unique_urls(self, extracted):
        assert len(extracted) == N_ROWS

    def test_no_errors(self, extracted):
        errs = [r for r in extracted.values() if r["status"] != "ok"]
        assert errs == []

    def test_extracted_text_byte_identical_to_oracle(self, extracted):
        mismatches = []
        for i in range(N_ROWS):
            row = make_page_row(i)
            oracle = extract_document(
                row["url"], row["warc_ts"], row["html"], row["text"], row["lang"]
            )
            got = extracted[row["url"]]
            if got["extracted_text"] != oracle["extracted_text"]:
                mismatches.append(row["url"])
        assert mismatches == []

    def test_element_stream_matches_oracle(self, extracted):
        for i in range(0, N_ROWS, 23):
            row = make_page_row(i)
            oracle = extract_document(
                row["url"], row["warc_ts"], row["html"], row["text"], row["lang"]
            )
            got = extracted[row["url"]]
            assert got["n_elements"] == oracle["n_elements"]
            for ge, oe in zip(got["elements"], oracle["elements"]):
                assert ge["type"] == oe["type"]
                assert ge["content"] == oe["content"]
                assert ge["token_count"] == oe["token_count"]
                assert list(ge["section_path"]) == list(oe["section_path"])
                assert ge["metadata_json"] == oe["metadata_json"]

    def test_counts_consistent(self, extracted):
        for r in extracted.values():
            assert r["n_elements"] == (
                r["n_text"] + r["n_heading"] + r["n_table"]
                + r["n_code"] + r["n_image"]
            )


class TestResume:
    def test_resume_skips_committed_and_fills_gaps(
        self, ray_session, corpus_dir, tmp_path
    ):
        from pdf_extractor_ray.pipelines import run_resumable_extraction
        from pdf_extractor_ray.state.lineage import read_lineage

        out_dir = str(tmp_path / "out")
        files = sorted(
            os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
        )
        res1 = run_resumable_extraction(files, out_dir)
        assert res1["ran"] == [0, 1, 2]

        # simulate a crash: partition 1 lost its sidecar, stale tmp left
        os.remove(os.path.join(out_dir, "_lineage", "part-00001.json"))
        os.makedirs(os.path.join(out_dir, "part=00001.tmp"), exist_ok=True)

        res2 = run_resumable_extraction(files, out_dir)
        assert res2["ran"] == [1]
        assert res2["skipped"] == [0, 2]
        assert not os.path.exists(os.path.join(out_dir, "part=00001.tmp"))

        urls = (
            pads.dataset(out_dir, format="parquet")
            .to_table(columns=["url"])["url"]
            .to_pylist()
        )
        src = (
            pads.dataset(corpus_dir, format="parquet")
            .to_table(columns=["url"])["url"]
            .to_pylist()
        )
        assert sorted(urls) == sorted(src)

        lineage = read_lineage(out_dir)
        assert [l["partition_id"] for l in lineage] == [0, 1, 2]
        assert sum(l["row_count"] for l in lineage) == N_ROWS

    def test_lineage_checksum_stable(self, ray_session, corpus_dir, tmp_path):
        from pdf_extractor_ray.pipelines import run_resumable_extraction
        from pdf_extractor_ray.state.lineage import read_lineage

        out_a = str(tmp_path / "a")
        out_b = str(tmp_path / "b")
        files = sorted(
            os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
        )[:1]
        run_resumable_extraction(files, out_a)
        run_resumable_extraction(files, out_b)
        la, lb = read_lineage(out_a), read_lineage(out_b)
        assert la[0]["url_sha256"] == lb[0]["url_sha256"]
        assert la[0]["row_count"] == lb[0]["row_count"]


class TestMidRunFailure:
    def test_failed_shard_leaves_earlier_commits_and_resumes(
        self, ray_session, corpus_dir, tmp_path
    ):
        """Operational story end-to-end: a shard that CRASHES mid-run
        (corrupt input) leaves every earlier partition committed and no
        partial output for itself; after the input is repaired, a rerun
        executes only the missing shards and the final url set is
        exact."""
        import pyarrow.parquet as pq

        from pdf_extractor_ray.pipelines import run_resumable_extraction
        from pdf_extractor_ray.state.lineage import read_lineage

        work = str(tmp_path / "pages")
        shutil.copytree(corpus_dir, work)
        files = sorted(os.path.join(work, f) for f in os.listdir(work))
        # poison shard 1: truncate its parquet file mid-byte
        good = open(files[1], "rb").read()
        with open(files[1], "wb") as f:
            f.write(good[: len(good) // 3])

        out_dir = str(tmp_path / "out")
        with pytest.raises(Exception):
            run_resumable_extraction(files, out_dir)

        # shard 0 committed; shard 1 neither committed nor half-written
        lineage = read_lineage(out_dir)
        assert [l["partition_id"] for l in lineage] == [0]
        assert not os.path.exists(os.path.join(out_dir, "part=00001"))
        leftovers = [
            d for d in os.listdir(out_dir) if d.endswith(".tmp")
        ]
        # a stale .tmp from the crash is allowed; a committed dir is not

        # repair and resume
        with open(files[1], "wb") as f:
            f.write(good)
        res = run_resumable_extraction(files, out_dir)
        assert res["skipped"] == [0]
        assert sorted(res["ran"]) == [1, 2]
        urls = (
            pads.dataset(
                out_dir, format="parquet",
                partitioning="hive", ignore_prefixes=["_lineage", "."],
            )
            .to_table(columns=["url"])["url"]
            .to_pylist()
        )
        src = (
            pads.dataset(work, format="parquet")
            .to_table(columns=["url"])["url"]
            .to_pylist()
        )
        assert sorted(urls) == sorted(src)
