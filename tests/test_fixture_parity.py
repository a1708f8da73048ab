"""Golden-for-golden parity with the reference fixture.

The reference's marker path extracted BHT_CV32A65X.pdf into
/root/reference/src/test_fixtures/BHT_CV32A65X_expected.json (12
elements with tiktoken cl100k_base token counts); the sibling .md file
is the same document as markdown. extract_from_markdown_text(...,
marker_style=True) must reproduce every element: same sequence of
types, byte-identical texts, and the reference's exact cl100k token
counts (pinned via kernel/cl100k_calibration.py — tiktoken itself is
unavailable offline).

Pages are NOT compared: the fixture's page numbers come from marker
block metadata that the markdown rendering does not carry.
"""

import json

import pytest

FIXTURE_MD = "/root/reference/src/test_fixtures/BHT_CV32A65X_expected.md"
FIXTURE_JSON = "/root/reference/src/test_fixtures/BHT_CV32A65X_expected.json"


@pytest.fixture(scope="module")
def fixture_pair():
    with open(FIXTURE_MD) as f:
        md = f.read()
    with open(FIXTURE_JSON) as f:
        expected = json.load(f)
    from pdf_extractor_ray.kernel.markdown_extract import (
        extract_from_markdown_text,
    )

    return extract_from_markdown_text(md, marker_style=True), expected


class TestFixtureParity:
    def test_element_count(self, fixture_pair):
        ours, expected = fixture_pair
        assert len(ours) == len(expected) == 12

    def test_type_sequence(self, fixture_pair):
        ours, expected = fixture_pair
        assert [e["type"] for e in ours] == [e["type"] for e in expected]

    def test_texts_byte_identical(self, fixture_pair):
        ours, expected = fixture_pair
        for o, f in zip(ours, expected):
            if f["type"] == "table":
                continue  # fixture table text is empty; ours is the md block
            assert o["content"] == f["text"], (o["type"], o["content"][:60])

    def test_token_counts_match_reference_cl100k(self, fixture_pair):
        """The criterion from the round-1 verdict: element token counts
        equal the fixture's tiktoken cl100k_base values."""
        ours, expected = fixture_pair
        got = [e["token_count"] for e in ours]
        want = [e["token_count"] for e in expected]
        assert got == want

    def test_heading_levels_and_titles(self, fixture_pair):
        ours, expected = fixture_pair
        heads = [(e["metadata"]["level"], e["content"]) for e in ours
                 if e["type"] == "heading"]
        assert heads == [
            (1, "4.1.5.4. BHT (Branch History Table) submodule"),
            (2, "State Diagram"),
        ]

    def test_section_paths_carry_raw_titles(self, fixture_pair):
        ours, expected = fixture_pair
        last = ours[-1]
        assert last["section_path"] == [
            "4.1.5.4. BHT (Branch History Table) submodule",
            "State Diagram",
        ] == expected[-1]["section_path"]

    def test_table_grid_matches_fixture_metadata(self, fixture_pair):
        ours, expected = fixture_pair
        our_table = next(e for e in ours if e["type"] == "table")
        fix_table = next(e for e in expected if e["type"] == "table")
        assert our_table["metadata"]["table"]["headers"] == (
            fix_table["metadata"]["headers"]
        )
        assert our_table["metadata"]["table"]["rows"] == (
            fix_table["metadata"]["rows"]
        )

    def test_markdown_path_unchanged_by_marker_mode(self):
        """The default (markdown-it-faithful) path still merges
        single-blank-separated paragraphs — marker_style must not leak
        into it."""
        from pdf_extractor_ray.kernel.markdown_extract import (
            extract_from_markdown_text,
        )

        md = "para one\n\npara two"
        default = extract_from_markdown_text(md)
        marker = extract_from_markdown_text(md, marker_style=True)
        assert [e["content"] for e in default] == ["para one\npara two"]
        assert [e["content"] for e in marker] == ["para one", "para two"]
