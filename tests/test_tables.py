"""Multi-page table merge matrix — port of the reference's merger
validation (improved_table_merger.py:311-471) and FIXTURES.md F3."""

import pytest

from pdf_extractor_ray.kernel.tables import (
    calculate_table_similarity,
    has_matching_headers,
    marker_table_similarity,
    merge_multi_page_tables,
    merge_table_data_safely,
    parse_table_data,
    process_and_merge_tables,
)


def standard_tables():
    return [
        {
            "page": 1,
            "data": [
                ["Signal", "IO", "Description", "Connection", "Type"],
                ["signal1", "in", "test1", "conn1", "type1"],
            ],
            "bbox": (50, 700, 550, 750),
            "rows": 2,
            "cols": 5,
            "accuracy": 100.0,
        },
        {
            "page": 2,
            "data": [
                ["Signal", "IO", "Description", "Connection", "Type"],
                ["signal2", "out", "test2", "conn2", "type2"],
                ["signal3", "in", "test3", "conn3", "type3"],
            ],
            "bbox": (50, 700, 550, 750),
            "rows": 3,
            "cols": 5,
            "accuracy": 100.0,
        },
        {
            "page": 3,
            "data": [
                ["Different", "Header", "Structure"],
                ["data1", "data2", "data3"],
            ],
            "bbox": (50, 700, 550, 750),
            "rows": 2,
            "cols": 3,
            "accuracy": 95.0,
        },
    ]


def tricky_tables():
    return [
        {
            "page": 1,
            "data": [
                ["Signal Name", "I/O", "Description", "Connection", "Type"],
                ["signal1", "in", "test1", "conn1", "type1"],
            ],
            "bbox": (50, 700, 550, 750),
        },
        {
            "page": 2,
            "data": [
                ["Signal", "IO", "Desc.", "Connection", "Type"],
                ["signal2", "out", "test2", "conn2", "type2"],
                ["signal3", "in", "test3", "conn3", "type3"],
            ],
            "bbox": (50, 700, 550, 750),
        },
    ]


class TestStandardMatrix:
    """The exact EXPECTED_RESULTS of the reference validation block."""

    def test_conservative_merges_standard(self):
        merged = process_and_merge_tables(standard_tables(), "conservative")
        assert len(merged) == 2
        first = merged[0]
        assert first["rows"] == 4  # header + 1 + 2 (dup header dropped)
        assert first["is_multi_page"] is True
        assert first["page_range"] == "1-2"

    def test_aggressive_merges_standard(self):
        merged = process_and_merge_tables(standard_tables(), "aggressive")
        assert len(merged) == 2

    def test_none_never_merges(self):
        merged = process_and_merge_tables(standard_tables(), "none")
        assert len(merged) == 3
        merged_tricky = process_and_merge_tables(tricky_tables(), "none")
        assert len(merged_tricky) == 2

    def test_default_threshold_merges_standard(self):
        merged = merge_multi_page_tables(standard_tables())
        assert len(merged) == 2
        assert merged[0]["rows"] == 4
        assert merged[0]["page_range"] == "1-2"

    def test_input_not_mutated(self):
        tables = standard_tables()
        process_and_merge_tables(tables, "conservative")
        assert tables[0]["rows"] == 2  # originals untouched


class TestTrickyHeaders:
    def test_aggressive_merges_tricky(self):
        merged = merge_multi_page_tables(tricky_tables(), similarity_threshold=0.6)
        assert len(merged) == 1

    def test_conservative_keeps_tricky_separate(self):
        merged = merge_multi_page_tables(tricky_tables(), similarity_threshold=0.8)
        assert len(merged) == 2

    def test_tricky_similarity_in_band(self):
        t1, t2 = tricky_tables()
        sim = calculate_table_similarity(t1, t2)
        assert 0.6 <= sim < 0.8  # why aggressive merges and conservative doesn't


class TestMergeMechanics:
    def test_non_consecutive_pages_never_merge(self):
        tables = standard_tables()[:2]
        tables[1]["page"] = 3
        assert len(merge_multi_page_tables(tables, 0.0)) == 2

    def test_three_page_run_merges_first_two_only(self):
        # Reference semantics: the merged table keeps its original
        # ``page``, so page 3 fails the consecutive-page check against
        # the page-1 anchor (improved_table_merger.py:136 vs :225-241) —
        # a 3-page run folds its first two parts only.
        t = standard_tables()
        t3 = {
            "page": 3,
            "data": [
                ["Signal", "IO", "Description", "Connection", "Type"],
                ["signal4", "in", "test4", "conn4", "type4"],
            ],
            "bbox": (50, 700, 550, 750),
        }
        merged = merge_multi_page_tables([t[0], t[1], t3], 0.8)
        assert len(merged) == 2
        assert merged[0]["page_range"] == "1-2"
        assert merged[0]["rows"] == 4
        assert merged[1]["page"] == 3

    def test_column_count_mismatch_returns_none(self):
        t = standard_tables()
        assert merge_table_data_safely(t[0], t[2]) is None

    def test_header_dropped_only_when_matching(self):
        t1, t2 = tricky_tables()
        merged = merge_table_data_safely(t1, t2)
        # headers DON'T match (0.5 < 0.7) -> second header row kept
        assert len(merged) == 2 + 3

    def test_empty_sides(self):
        assert merge_table_data_safely({"data": []}, {"data": [["a"]]}) == [["a"]]
        assert merge_table_data_safely({"data": [["a"]]}, {"data": []}) == [["a"]]


class TestHeaderSimilarity:
    def test_identical(self):
        assert has_matching_headers(["Signal", "IO"], ["Signal", "IO"])

    def test_case_whitespace_insensitive(self):
        assert has_matching_headers([" signal ", "io"], ["Signal", "IO"])

    def test_arity_mismatch(self):
        assert not has_matching_headers(["a", "b"], ["a"])

    def test_partial_counts_half(self):
        # 1 exact + 1 partial of 2 -> 0.75 >= 0.7
        assert has_matching_headers(["Signal Name", "IO"], ["Signal", "IO"])

    def test_empty(self):
        assert not has_matching_headers([], [])


class TestMarkerSimilarity:
    def test_identical_headers_high(self):
        t = {"header": ["Signal", "IO", "Type"]}
        assert marker_table_similarity(t, dict(t)) > 0.9

    def test_different_headers_low(self):
        t1 = {"header": ["Signal", "IO", "Type"]}
        t2 = {"header": ["Alpha", "Beta", "Gamma"]}
        sim = marker_table_similarity(t1, t2)
        assert sim < 0.7

    def test_no_headers_zero(self):
        assert marker_table_similarity({}, {}) == 0.0


class TestParseTableData:
    def test_pad_and_truncate(self):
        out = parse_table_data(
            [["A", "B", "C"], ["1", "2"], ["1", "2", "3", "4"]]
        )
        assert out["headers"] == ["A", "B", "C"]
        assert out["rows"] == [["1", "2", ""], ["1", "2", "3"]]

    def test_cells_stripped(self):
        out = parse_table_data([[" A ", "B"], [" x ", " y "]])
        assert out["headers"] == ["A", "B"]
        assert out["rows"] == [["x", "y"]]

    def test_too_small(self):
        assert parse_table_data([["only header"]]) == {"headers": [], "rows": []}
        assert parse_table_data([]) == {"headers": [], "rows": []}

    def test_clean_grid_preserves_integers_beyond_2_53(self):
        from pdf_extractor_ray.kernel.tables import clean_table_grid

        out = clean_table_grid([["9007199254740993", "1,234.50", "12"]])
        # float() would silently round ...993 -> ...992
        assert out == [["9007199254740993", "1234.5", "12"]]
