"""Benchmark decontamination (functions/decontaminate.py)."""

import pyarrow as pa


def _ds(ray, rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    ).repartition(3)


class TestContaminationFlags:
    def test_exact_copy_and_partial_overlap_flagged(self, ray_session):
        from pdf_extractor_ray.functions.decontaminate import (
            contamination_flags,
        )

        bench_text = " ".join(f"b{i}" for i in range(20))
        corpus = [
            (1, bench_text),                                  # exact copy
            (2, "prefix words " + bench_text + " suffix"),    # containing
            (3, " ".join(f"b{i}" for i in range(8))),         # one shared 8-gram
            (4, " ".join(f"c{i}" for i in range(30))),        # clean
            (5, " ".join(f"b{i}" for i in range(7))),         # too short to share
        ]
        out = (
            contamination_flags(
                _ds(ray_session, corpus),
                _ds(ray_session, [(100, bench_text)]),
                n=8,
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[1, "contaminated"]) is True
        assert out.loc[1, "n_hits"] == 13  # 20 - 8 + 1 distinct 8-grams
        assert bool(out.loc[2, "contaminated"]) is True
        assert out.loc[2, "n_hits"] == 13  # the benchmark grams it contains
        assert bool(out.loc[3, "contaminated"]) is True
        assert out.loc[3, "n_hits"] == 1
        assert bool(out.loc[4, "contaminated"]) is False
        assert out.loc[4, "n_hits"] == 0
        assert bool(out.loc[5, "contaminated"]) is False

    def test_empty_benchmark_flags_nothing(self, ray_session):
        from pdf_extractor_ray.functions.decontaminate import (
            contamination_flags,
        )

        out = contamination_flags(
            _ds(ray_session, [(1, "some words here " * 10)]),
            _ds(ray_session, []),
            n=8,
        ).to_pandas()
        assert not out["contaminated"].any()
