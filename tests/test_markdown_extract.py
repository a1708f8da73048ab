"""Markdown element-stream extraction semantics (SURVEY.md M1-M6)."""

import json

from pdf_extractor_ray.kernel.markdown_extract import (
    extract_from_markdown_text,
    parse_markdown_image,
    parse_markdown_table,
)
from pdf_extractor_ray.kernel.textutils import hash_string


class TestParseMarkdownTable:
    def test_valid(self):
        out = parse_markdown_table("| A | B |\n|---|---|\n| 1 | 2 |")
        assert out == {"headers": ["A", "B"], "rows": [["1", "2"]]}

    def test_colon_separators(self):
        out = parse_markdown_table("| A | B |\n|:--|--:|\n| 1 | 2 |")
        assert out is not None

    def test_invalid_separator(self):
        assert parse_markdown_table("| A | B |\n| xx | yy |\n| 1 | 2 |") is None

    def test_arity_mismatch_rows_dropped(self):
        out = parse_markdown_table("| A | B |\n|---|---|\n| 1 | 2 | 3 |\n| 4 | 5 |")
        assert out["rows"] == [["4", "5"]]

    def test_too_short(self):
        assert parse_markdown_table("| A | B |") is None

    def test_empty(self):
        assert parse_markdown_table("") is None


class TestParseMarkdownImage:
    def test_valid(self):
        assert parse_markdown_image("![alt text](path/img.png)") == {
            "alt": "alt text",
            "src": "path/img.png",
        }

    def test_empty_alt(self):
        assert parse_markdown_image("![](x.png)") == {"alt": "", "src": "x.png"}

    def test_not_image(self):
        assert parse_markdown_image("[link](x)") is None


def types_of(elements):
    return [e["type"] for e in elements]


class TestExtraction:
    def test_explicit_numbered_heading(self):
        md = "# 4.1.5.4. BHT submodule\n\nSome text here."
        els = extract_from_markdown_text(md)
        assert types_of(els) == ["heading", "text"]
        assert els[0]["content"] == "4.1.5.4. BHT submodule"
        assert els[0]["section_path"] == ["4.1.5.4. BHT submodule"]
        assert els[1]["section_path"] == ["4.1.5.4. BHT submodule"]
        assert els[1]["section_hash_path"] == [hash_string("BHT submodule")]

    def test_auto_numbering_with_level_reset(self):
        md = "# One\n\n## Sub A\n\n## Sub B\n\n# Two\n\n## Sub C"
        els = [e for e in extract_from_markdown_text(md) if e["type"] == "heading"]
        assert [e["content"] for e in els] == [
            "1. One",
            "1.1. Sub A",
            "1.2. Sub B",
            "2. Two",
            "2.1. Sub C",
        ]

    def test_hierarchical_section_path(self):
        md = "# Top\n\n## Mid\n\npara under mid\n\n# Next\n\npara under next"
        els = extract_from_markdown_text(md)
        texts = [e for e in els if e["type"] == "text"]
        assert texts[0]["section_path"] == ["1. Top", "1.1. Mid"]
        assert texts[1]["section_path"] == ["2. Next"]

    def test_single_blank_line_joins_two_blank_lines_split(self):
        # the reference's token.map gap rule: >= 2 blank lines flushes
        md_one = "para one.\n\npara two."
        md_two = "para one.\n\n\npara two."
        els_one = extract_from_markdown_text(md_one)
        els_two = extract_from_markdown_text(md_two)
        assert types_of(els_one) == ["text"]
        assert els_one[0]["content"] == "para one.\npara two."
        assert types_of(els_two) == ["text", "text"]

    def test_list_items_join_text_markers_stripped(self):
        md = "intro line\n- item one\n- item two\n1. numbered"
        els = extract_from_markdown_text(md)
        assert types_of(els) == ["text"]
        assert els[0]["content"] == "intro line\nitem one\nitem two\nnumbered"

    def test_page_markers(self):
        md = "<!-- page: 1 -->\n\ntext on p1\n\n<!-- page: 2 -->\n\ntext on p2"
        els = extract_from_markdown_text(md)
        assert [(e["type"], e["page"]) for e in els] == [("text", 1), ("text", 2)]

    def test_table_element(self):
        md = "before\n\n| A | B |\n|---|---|\n| 1 | 2 |\n\nafter"
        els = extract_from_markdown_text(md)
        assert types_of(els) == ["text", "table", "text"]
        table = els[1]
        meta = table["metadata"]
        assert meta["table"] == {"headers": ["A", "B"], "rows": [["1", "2"]]}
        assert meta["validation"]["valid"] is True
        assert table["content"] == "| A | B |\n|---|---|\n| 1 | 2 |"

    def test_table_at_eof(self):
        md = "| A | B |\n|---|---|\n| 1 | 2 |"
        els = extract_from_markdown_text(md)
        assert types_of(els) == ["table"]

    def test_invalid_table_dropped(self):
        md = "| A | B |\n| no separator |"
        els = extract_from_markdown_text(md)
        assert "table" not in types_of(els)

    def test_fenced_code(self):
        md = "```python\ndef f():\n    return 1\n```"
        els = extract_from_markdown_text(md)
        assert types_of(els) == ["code"]
        assert els[0]["content"] == "def f():\n    return 1"
        assert els[0]["metadata"]["code_type"] == "python"

    def test_fence_without_info_uses_default(self):
        els = extract_from_markdown_text("```\nx\n```", default_code_type="md")
        assert els[0]["metadata"]["code_type"] == "md"

    def test_unclosed_fence_consumes_rest(self):
        els = extract_from_markdown_text("```py\nx = 1\ny = 2")
        assert types_of(els) == ["code"]
        assert els[0]["content"] == "x = 1\ny = 2"

    def test_image_element(self):
        md = "![diagram](fig.png)"
        els = extract_from_markdown_text(md)
        assert types_of(els) == ["image"]
        assert els[0]["metadata"]["alt"] == "diagram"
        assert els[0]["metadata"]["src"] == "fig.png"
        assert els[0]["metadata"]["source"] == "markdown"

    def test_section_id_is_content_md5(self):
        els = extract_from_markdown_text("hello world")
        assert els[0]["section_id"] == hash_string("hello world")

    def test_envelope_fields_present(self):
        els = extract_from_markdown_text(
            "# H\n\ntext", url="u://x", extraction_date="2025-01-01T00:00:00"
        )
        for e in els:
            assert e["file_path"] == "u://x"
            assert e["extraction_date"] == "2025-01-01T00:00:00"
            assert isinstance(e["token_count"], int) and e["token_count"] > 0
            assert len(e["line_span"]) == 2
            assert e["line_span"][0] >= 1

    def test_table_cache_semi_join(self):
        md = "| A | B |\n|---|---|\n| 1 | 2 |"
        cache_hit = [{"page": 1, "bbox": None}]
        cache_miss = [{"page": 9, "bbox": None}]
        valid = extract_from_markdown_text(md, table_cache=cache_hit)[0]
        invalid = extract_from_markdown_text(md, table_cache=cache_miss)[0]
        assert valid["metadata"]["validation"]["valid"] is True
        assert invalid["metadata"]["validation"]["valid"] is False
        assert invalid["metadata"]["validation"]["issues"] == [
            "No matching table in table_cache"
        ]

    def test_deterministic(self):
        md = "# A\n\ntext\n\n| A |\n|---|\n| 1 |\n\n```py\nx\n```"
        a = extract_from_markdown_text(md, extraction_date="T")
        b = extract_from_markdown_text(md, extraction_date="T")
        assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True)

    def test_empty_input(self):
        assert extract_from_markdown_text("") == []
        assert extract_from_markdown_text("\n\n\n") == []

    def test_heading_without_number_unnamed(self):
        els = extract_from_markdown_text("# \u0007\n\ntext")
        # control-only title cleans to "Unnamed Section"
        assert els[0]["content"].endswith("Unnamed Section")
