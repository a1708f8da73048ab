"""Main-content extraction: block segmenter + NumWordsRules
classifier (kernel/content_extract.py) and the distributed
content_blocks / main_content operators."""

import numpy as np
import pyarrow as pa

from pdf_extractor_ray.kernel.content_extract import (
    classify_blocks,
    extract_main_content,
    segment_blocks,
)


def words(n, tag="w"):
    return " ".join(f"{tag}{i}" for i in range(n))


class TestSegmentBlocks:
    def test_basic_blocks_and_word_counts(self):
        html = "<p>one two three</p><div>four five</div>"
        assert segment_blocks(html) == [
            ("one two three", 3, 0),
            ("four five", 2, 0),
        ]

    def test_link_words_counted(self):
        html = '<p>intro <a href="/x">link one</a> tail</p>'
        assert segment_blocks(html) == [("intro link one tail", 4, 2)]

    def test_all_link_block(self):
        html = '<div><a href="/a">home</a> <a href="/b">about us</a></div>'
        assert segment_blocks(html) == [("home about us", 3, 3)]

    def test_script_style_head_invisible(self):
        html = (
            "<head><title>t</title><p>head para</p></head>"
            "<script>var p='<p>decoy decoy</p>';</script>"
            "<style>.x{}</style>"
            "<p>real</p>"
        )
        assert segment_blocks(html) == [("real", 1, 0)]

    def test_comments_and_entities(self):
        html = "<p>a &amp; b<!-- <p>ghost</p> --></p>"
        assert segment_blocks(html) == [("a & b", 3, 0)]

    def test_whitespace_collapsed(self):
        html = "<p>  a\t\tb\n c  </p>"
        assert segment_blocks(html) == [("a b c", 3, 0)]

    def test_inline_tags_do_not_split(self):
        html = "<p>one <b>two</b> three</p>"
        assert segment_blocks(html) == [("one two three", 3, 0)]

    def test_empty_blocks_dropped(self):
        html = "<p></p><div>  </div><p>x</p>"
        assert segment_blocks(html) == [("x", 1, 0)]

    def test_anchor_reset_at_block_boundary(self):
        # an anchor left open across a block boundary does not leak
        # link state into the next block
        html = '<p><a href="/x">one</a></p><p>two three</p>'
        assert segment_blocks(html) == [("one", 1, 1), ("two three", 2, 0)]

    def test_br_and_hr_split_blocks(self):
        html = "one two<br>three<hr>four"
        assert segment_blocks(html) == [
            ("one two", 2, 0),
            ("three", 1, 0),
            ("four", 1, 0),
        ]


class TestClassifyBlocks:
    def test_high_density_is_boilerplate(self):
        # density > 1/3 -> boilerplate regardless of words
        lab = classify_blocks(np.array([6]), np.array([3]))
        assert lab.tolist() == [False]

    def test_density_exactly_one_third_is_kept_branch(self):
        # 3*nl == nw sits on the <= boundary: falls into the low branch
        lab = classify_blocks(np.array([30, 30]), np.array([10, 0]))
        # curr 30 words > 16 -> content
        assert lab.tolist() == [True, True]

    def test_long_block_is_content(self):
        lab = classify_blocks(np.array([17]), np.array([0]))
        assert lab.tolist() == [True]

    def test_short_isolated_block_is_boilerplate(self):
        # 16 words, prev/next zero -> boilerplate
        lab = classify_blocks(np.array([16]), np.array([0]))
        assert lab.tolist() == [False]

    def test_short_block_after_wordy_prev_is_content(self):
        # curr 10 words, prev 5 words (>4), next 0 (<=15) -> content
        lab = classify_blocks(np.array([5, 10]), np.array([0, 0]))
        assert lab.tolist()[1] is True

    def test_short_block_before_wordy_next_is_content(self):
        # curr 10, next 16 (>15) -> content
        lab = classify_blocks(np.array([10, 16]), np.array([0, 0]))
        assert lab.tolist() == [True, False] or lab.tolist() == [True, True]
        assert lab.tolist()[0] is True

    def test_after_linky_prev_needs_long_next(self):
        # prev density 1 (>5/9): curr 20 (<=40), next 0 -> boilerplate
        lab = classify_blocks(np.array([4, 20]), np.array([4, 0]))
        assert lab.tolist()[1] is False
        # same but curr 41 (>40) -> content
        lab2 = classify_blocks(np.array([4, 41]), np.array([4, 0]))
        assert lab2.tolist()[1] is True

    def test_prev_density_five_ninths_boundary(self):
        # prev 9 words 5 links: 9*5 <= 5*9 -> still "low" branch
        lab = classify_blocks(np.array([9, 17]), np.array([5, 0]))
        assert lab.tolist()[1] is True

    def test_empty(self):
        assert classify_blocks(np.array([]), np.array([])).size == 0


class TestExtractMainContent:
    def test_nav_and_footer_stripped(self):
        html = (
            '<div><a href="/">home</a> <a href="/a">about</a></div>'
            f"<p>{words(20, 'a')}</p>"
            f"<p>{words(18, 'b')}</p>"
            '<div><a href="/c">contact</a> <a href="/p">privacy</a></div>'
        )
        r = extract_main_content(html)
        assert r["n_blocks"] == 4
        assert r["n_content_blocks"] == 2
        assert r["main_text"] == words(20, "a") + "\n\n" + words(18, "b")
        assert r["total_words"] == 42
        assert r["content_words"] == 38

    def test_empty_page(self):
        r = extract_main_content("")
        assert r["main_text"] == ""
        assert r["n_blocks"] == 0


class TestOperators:
    def _pages(self):
        import ray

        rows = [
            {
                "url": "https://e/0",
                "html": (
                    '<div><a href="/">home</a> <a href="/a">about</a></div>'
                    # 45 > 40 words: content even after a linky prev block
                    f"<p>{words(45, 'a')}</p>"
                    '<div><a href="/c">contact</a></div>'
                ).encode(),
            },
            {
                "url": "https://e/1",
                "html": f"<p>{words(17, 'x')}</p>".encode(),
            },
            {"url": "https://e/2", "html": None},
        ]
        return ray.data.from_items(rows)

    def test_content_blocks_rows(self):
        from pdf_extractor_ray.functions.content import content_blocks

        t = pa.concat_tables(
            [
                b
                for b in content_blocks(self._pages()).iter_batches(
                    batch_format="pyarrow"
                )
            ]
        ).sort_by([("url", "ascending"), ("block_idx", "ascending")])
        assert t.num_rows == 4
        assert t["is_content"].to_pylist() == [False, True, False, True]
        assert t["n_link_words"].to_pylist()[0] == 2

    def test_main_content_rollup(self):
        import hashlib

        from pdf_extractor_ray.functions.content import main_content

        t = pa.concat_tables(
            [
                b
                for b in main_content(self._pages()).iter_batches(
                    batch_format="pyarrow"
                )
            ]
        ).sort_by([("url", "ascending")])
        assert t["main_text"].to_pylist() == [
            words(45, "a"),
            words(17, "x"),
            "",
        ]
        assert (
            t["main_md5"].to_pylist()[0]
            == hashlib.md5(words(45, "a").encode()).hexdigest()
        )
        assert t["content_words"].to_pylist() == [45, 17, 0]


class TestPageHtmlTables:
    def test_cells_decoys_and_arity_drop(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.content import page_html_tables

        html = (
            "<html><body>"
            "<!-- <table><tr><th>DECOY</th></tr></table> -->"
            "<script>var t='<table><tr><td>S</td></tr></table>';</script>"
            "<table>"
            "<tr><th>A</th><th>B</th></tr>"
            "<tr><td>1</td><td>2</td></tr>"
            "<tr><td>x</td><td>y</td><td>EXTRA</td></tr>"  # arity drop
            "<tr><td>3</td><td>4</td></tr>"
            "</table>"
            "<table><tr><th>Z</th></tr><tr><td>q</td></tr></table>"
            "</body></html>"
        ).encode()
        df = pd.DataFrame({"url": ["u"], "html": [html]})
        out = page_html_tables(_ray.data.from_pandas(df)).to_pandas()
        t0 = out[out.table_idx == 0].sort_values(["row_idx", "col_idx"])
        assert t0.cell.tolist() == ["A", "B", "1", "2", "3", "4"]
        # the arity-mismatched row is gone and indices don't skip
        assert sorted(t0.row_idx.unique()) == [0, 1, 2]
        t1 = out[out.table_idx == 1]
        assert t1.cell.tolist() == ["Z", "q"]
        assert "DECOY" not in set(out.cell) and "S" not in set(out.cell)

    def test_no_tables_no_rows(self, ray_session):
        import pandas as pd
        import ray as _ray

        from pdf_extractor_ray.functions.content import page_html_tables

        df = pd.DataFrame(
            {"url": ["u"], "html": [b"<html><body><p>x</p></body></html>"]}
        )
        assert page_html_tables(_ray.data.from_pandas(df)).count() == 0
