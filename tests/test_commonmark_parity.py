"""Differential tests for the commonmark constructs the reference's
markdown-it walk parses (markdown_extractor.py:200-642) and the
line-based scanner must agree on — the classic drift points named in
the round-1 verdict: setext headings, lazy list continuation, indented
code, nested blockquotes, thematic breaks.

Documented deviations from full commonmark (each asserted below so a
future change is caught):
  - a 4-space-indented line that directly continues a paragraph stays
    text (commonmark agrees: indented code cannot interrupt a
    paragraph).

Inside a list the indented-code threshold moves to content-col + 4
(commonmark): a blank-separated 4-space run after `- item` is a
PARAGRAPH of the loose item (merged into the item's text by the
<2-line-gap rule, as the reference's markdown-it walk would), and only
content-col + 4 columns strip from true in-list code blocks.

A multi-line paragraph followed by a setext underline promotes the
WHOLE paragraph into the heading (commonmark / markdown-it inline
content), whose soft breaks clean_section_title's category-C strip
then drops — 'l1\nl2\n===' titles as 'l1l2', byte-identical to the
reference's clean_section_title (markdown_extractor.py:116-140).
"""

from pdf_extractor_ray.kernel.markdown_extract import (
    extract_from_markdown_text,
)


def tc(md, **kw):
    return [(e["type"], e["content"]) for e in extract_from_markdown_text(md, **kw)]


class TestSetextHeadings:
    def test_h1_equals_underline(self):
        els = extract_from_markdown_text("Title\n=====\n\nbody")
        assert els[0]["type"] == "heading"
        assert els[0]["metadata"]["level"] == 1
        assert els[0]["content"] == "1. Title"
        assert els[1] == els[1] and els[1]["content"] == "body"

    def test_h2_dash_underline(self):
        els = extract_from_markdown_text("Sub\n---\n\nbody")
        assert els[0]["type"] == "heading"
        assert els[0]["metadata"]["level"] == 2

    def test_explicit_number_kept(self):
        els = extract_from_markdown_text("2.1. Named\n===")
        assert els[0]["content"] == "2.1. Named"
        assert els[0]["metadata"]["section_number"] == "2.1"

    def test_setext_updates_hierarchy(self):
        els = extract_from_markdown_text("Top\n===\n\nchild text")
        assert els[1]["section_path"] == ["1. Top"]

    def test_multiline_paragraph_promotes_whole_paragraph(self):
        # commonmark promotes "l1\nl2" wholly into the heading; the
        # newline drops in clean_section_title's category-C strip
        assert tc("l1\nl2\n===") == [("heading", "1. l1l2")]

    def test_blank_line_bounds_the_promoted_paragraph(self):
        # a blank line ends the paragraph: only "l2" underlines
        assert tc("p\n\nl2\n===") == [("text", "p"), ("heading", "1. l2")]

    def test_hr_bounds_the_promoted_paragraph(self):
        # a thematic break ends the paragraph WITHOUT flushing text
        # (reference walk has no hr branch) — the pre-break text then
        # flushes when the heading does
        assert tc("a\n***\nb\n===") == [("text", "a"), ("heading", "1. b")]

    def test_promoted_paragraph_spans_merged_gap_correctly(self):
        # one blank merges paragraphs into one text element (flush gap
        # is >= 2), but the setext underline still binds only to the
        # blank-free run it terminates
        assert tc("keep\n\nl1\nl2\n===\n\nbody") == [
            ("text", "keep"),
            ("heading", "1. l1l2"),
            ("text", "body"),
        ]


class TestThematicBreaks:
    def test_break_line_vanishes_without_flush(self):
        # the reference walk has no hr branch: text keeps accumulating
        assert tc("a\n- - -\nb") == [("text", "a\nb")]

    def test_break_between_gapped_paragraphs(self):
        assert tc("p1\n\n\n***\n\n\np2") == [("text", "p1"), ("text", "p2")]

    def test_underscores(self):
        assert tc("x\n___\ny") == [("text", "x\ny")]

    def test_dash_after_paragraph_is_setext_not_break(self):
        out = tc("para\n---")
        assert out == [("heading", "1. para")]

    def test_break_line_counts_toward_the_gap(self):
        # reference flush rule compares SOURCE lines (token.map[0] >
        # last_line + 1): one blank + the hr line = a 2-line gap, so
        # 'a' and 'b' flush separately even though only one line is
        # blank
        assert tc("a\n\n***\nb") == [("text", "a"), ("text", "b")]


class TestIndentedCode:
    def test_block_after_blank_is_code(self):
        out = tc("para\n\n    def f():\n        return 1\n\nafter")
        assert out == [
            ("text", "para"),
            ("code", "def f():\n    return 1"),
            ("text", "after"),
        ]

    def test_document_leading_code(self):
        assert tc("    x = 1\n\ntext") == [("code", "x = 1"), ("text", "text")]

    def test_indented_hash_is_code_not_heading(self):
        out = tc("\n    # not a heading\n")
        assert out == [("code", "# not a heading")]

    def test_lazy_indent_inside_paragraph_stays_text(self):
        # commonmark: indented code cannot interrupt a paragraph
        assert tc("a\n    b") == [("text", "a\nb")]

    def test_tab_indent(self):
        assert tc("\tcode line") == [("code", "code line")]

    def test_interior_blank_lines_kept(self):
        out = tc("    a = 1\n\n    b = 2")
        assert out == [("code", "a = 1\n\nb = 2")]


class TestLooseListContinuation:
    def test_blank_separated_indented_run_is_item_paragraph(self):
        # commonmark: 4 spaces < content-col(2) + 4 -> paragraph of the
        # loose item; 1-line gap merges it into the item's text
        assert tc("- item\n\n    continued") == [("text", "item\ncontinued")]

    def test_six_space_run_inside_list_is_code(self):
        out = tc("- item\n\n      code")
        assert out == [("text", "item"), ("code", "code")]

    def test_deep_indent_keeps_extra_columns(self):
        out = tc("- item\n\n        x = 1")
        assert out == [("text", "item"), ("code", "  x = 1")]

    def test_unindented_paragraph_ends_the_list(self):
        # 'para' after a blank at column 0 closes the list, so a later
        # 4-space run is plain indented code again
        out = tc("- item\n\npara\n\n    code")
        assert out == [("text", "item\npara"), ("code", "code")]

    def test_ordered_item_content_column(self):
        # '1. ' puts content at column 3 -> threshold 7; a 4-space run
        # stays item text, a 7-space run is code
        assert tc("1. item\n\n    cont") == [("text", "item\ncont")]
        out = tc("1. item\n\n       code")
        assert out == [("text", "item"), ("code", "code")]

    def test_heading_resets_list_context(self):
        out = tc("- item\n\n# H\n\n    code")
        assert out == [
            ("text", "item"),
            ("heading", "1. H"),
            ("code", "code"),
        ]


class TestLazyContinuation:
    def test_list_item_continuation_joins(self):
        # "continuation" is a lazy continuation line of the item; the
        # reference's inline content is "item\ncontinuation" — ours
        # joins identically via per-line append
        assert tc("- item\ncontinuation") == [("text", "item\ncontinuation")]

    def test_paragraph_lazy_lines_join(self):
        assert tc("one\ntwo\nthree") == [("text", "one\ntwo\nthree")]


class TestBlockquotes:
    def test_markers_stripped(self):
        assert tc("> quoted\n> lines") == [("text", "quoted\nlines")]

    def test_nested_markers_stripped(self):
        assert tc("> > deep\n>> deeper") == [("text", "deep\ndeeper")]

    def test_structures_inside_quotes_parse(self):
        out = tc("> # Head\n>\n> body")
        assert out == [("heading", "1. Head"), ("text", "body")]

    def test_blank_quote_line_is_paragraph_gap(self):
        out = tc("> a\n>\n>\n> b")
        # two blank quote lines = a 2-line gap = markdown-path flush
        assert out == [("text", "a"), ("text", "b")]

    def test_quoted_table(self):
        out = extract_from_markdown_text("> | a | b |\n> |---|---|\n> | 1 | 2 |")
        assert out[0]["type"] == "table"
        assert out[0]["metadata"]["table"]["rows"] == [["1", "2"]]


class TestHtmlBlocks:
    """markdown-it emits html_block tokens the reference walk has no
    branch for: raw block-level HTML (through the next blank line)
    vanishes from the element stream without flushing text."""

    def test_div_block_vanishes_without_flush(self):
        assert tc("a\n\n<div>\nraw\n</div>\n\nb") == [
            ("text", "a"),
            ("text", "b"),
        ]

    def test_block_interrupting_paragraph_vanishes(self):
        # kind-6 blocks interrupt paragraphs; the block swallows the
        # blank-free run after it, text resumes past the blank
        assert tc("para\n<div>x</div>\nswallowed\n\nafter") == [
            ("text", "para"),
            ("text", "after"),
        ]

    def test_non_page_comment_vanishes_page_marker_survives(self):
        out = extract_from_markdown_text(
            "<!-- note -->\n\n<!-- page: 2 -->\n\ntext"
        )
        assert [(e["type"], e["content"]) for e in out] == [("text", "text")]
        assert out[0]["page"] == 2

    def test_html_block_bounds_setext_paragraph(self):
        # the vanished block is still a paragraph boundary: '===' binds
        # only to 'b', and 'a' flushes as its own text element
        assert tc("a\n<br/>\nswallowed\n\nb\n===") == [
            ("text", "a"),
            ("heading", "1. b"),
        ]

    def test_inline_html_mid_line_stays_text(self):
        # html_INLINE (mid-paragraph markup) is part of the inline
        # content markdown-it hands the reference — it stays
        assert tc("keep <b>this</b> line") == [
            ("text", "keep <b>this</b> line")
        ]

    def test_lt_without_tag_shape_stays_text(self):
        assert tc("< 3 and <3 stay") == [("text", "< 3 and <3 stay")]


class TestLinkReferenceDefinitions:
    def test_definition_vanishes_at_block_start(self):
        assert tc("[ref]: https://example.org\n\ntext [x][ref]") == [
            ("text", "text [x][ref]")
        ]

    def test_definition_cannot_interrupt_paragraph(self):
        # mid-paragraph it is ordinary text (commonmark agrees)
        assert tc("a\n[ref]: /url") == [("text", "a\n[ref]: /url")]

    def test_definition_line_widens_the_gap(self):
        # blank + def line = 2-line gap -> separate text elements
        assert tc("a\n\n[r]: /u\nb") == [("text", "a"), ("text", "b")]

    def test_plain_bracket_text_stays(self):
        assert tc("[not a def] plain") == [("text", "[not a def] plain")]
