"""Markdown -> element-stream extraction kernel (SURVEY.md M1-M6).

Behavioral spec: /root/reference/src/pdf_extractor/markdown_extractor.py:200-642
(`extract_from_markdown`). Re-implemented from scratch as a line-based
block scanner (markdown-it is unavailable offline; the reference used its
token stream only as a block segmenter). Semantics kept:

  - text blocks: consecutive paragraphs / list items accumulate into ONE
    text element; a gap of >= 2 blank lines flushes (the reference's
    ``token.map[0] > last_line + 1`` rule, markdown_extractor.py:317-319)
  - headings: update the section hierarchy; explicit ``N.N.`` numeric
    prefixes are honored, otherwise per-level auto-counters numbered with
    counters below the level reset (markdown_extractor.py:337-357)
  - section hierarchy: a *correct* hierarchical stack (path of titles
    root -> current), md5 title hashes — the fixture-validated behavior
    (SURVEY.md §1.4; the reference's importable fallback was a flat list)
  - page markers ``<!-- page: N -->`` switch current_page and flush
    (markdown_extractor.py:373-379)
  - images ``![alt](src)`` on their own line flush text and emit an
    image element (markdown_extractor.py:383-435)
  - pipe-table runs parse via parse_markdown_table; invalid tables are
    dropped silently (markdown_extractor.py:437-519)
  - fenced code emits a code element with code_type from the fence info
    string (markdown_extractor.py:524-562)
  - every element carries the envelope {type, content, line_span,
    token_count, section_id, section_path, section_hash_path, page,
    metadata} (markdown_extractor.py:289-304)

Determinism deltas vs the reference (deliberate, SURVEY.md §7.4):
  - ``extraction_date`` is the caller-supplied warc_ts, never wall clock
  - token counts use the deterministic tokenizer in textutils.py
  - heading elements ARE emitted (the golden fixture
    BHT_CV32A65X_expected.json contains heading nodes with token counts;
    the markdown_extractor path only tracked hierarchy)
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pdf_extractor_ray.kernel.textutils import (
    clean_section_title,
    hash_string,
    token_count,
    token_count_cl100k,
)

__all__ = [
    "SectionHierarchy",
    "parse_markdown_table",
    "parse_markdown_image",
    "extract_from_markdown_text",
]

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_SECTION_NUM_RE = re.compile(r"(\d+(?:\.\d+)*\.?)\s*(.*)")
_PAGE_MARKER_RE = re.compile(r"<!--\s*page:\s*(\d+)\s*-->")
_IMAGE_RE = re.compile(r"!\[(.*?)\]\((.*?)\)")
_TABLE_LINE_RE = re.compile(r"\|.*\|")
_TABLE_SEP_CELL_RE = re.compile(r"[-: ]+")
_LIST_ITEM_RE = re.compile(r"^(\s*)(?:[-*+]|\d{1,9}[.)])\s+(.*)$")
_FENCE_RE = re.compile(r"^(`{3,}|~{3,})\s*(.*)$")
# commonmark structures the markdown-it path parses and this scanner
# must agree on (tests/test_commonmark_parity.py):
_SETEXT_RE = re.compile(r"^(=+|-+)\s*$")
# commonmark html_block start (kinds 1-6 union, approximated): an
# open/close tag, comment, declaration, CDATA, or processing
# instruction at line start. markdown-it emits an html_block token the
# reference walk has NO branch for — the whole block (through the next
# blank line) vanishes from the element stream without flushing text.
_HTML_BLOCK_RE = re.compile(
    r"<(?:/?[A-Za-z][A-Za-z0-9-]*(?:[\s/>]|$)|!--|![A-Za-z]|!\[CDATA\[|\?)"
)
# link reference definition '[label]: dest' — consumed by the
# commonmark parser itself (no token at all reaches the reference
# walk); single-line form only, and only at a block start (a ref def
# cannot interrupt a paragraph).
_LINK_DEF_RE = re.compile(r"\[[^\]\[]+\]:\s*\S+")
_HR_RE = re.compile(r"^(?:-\s*){3,}$|^(?:\*\s*){3,}$|^(?:_\s*){3,}$")
_BLOCKQUOTE_RE = re.compile(r"^(?:>\s?)+")
_INDENT_CODE_RE = re.compile(r"^(?:    |\t)(.*)$")


def _indent_width(line: str) -> int:
    """Leading-indent width in columns (commonmark tab stop = 4)."""
    w = 0
    for ch in line:
        if ch == " ":
            w += 1
        elif ch == "\t":
            w += 4 - (w % 4)
        else:
            break
    return w


def _strip_indent_cols(line: str, cols: int) -> str:
    """Remove ``cols`` columns of leading indentation."""
    w = 0
    i = 0
    for ch in line:
        if w >= cols:
            break
        if ch == " ":
            w += 1
        elif ch == "\t":
            w += 4 - (w % 4)
        else:
            break
        i += 1
    return line[i:]

# Paired inline emphasis/code markers, stripped by the marker-style
# path (marker's JSON blocks carry plain text + style spans; the
# markers never reach its element texts — marker_processor.py).
_EMPH_RES = (
    re.compile(r"\*\*(.+?)\*\*", re.S),
    re.compile(r"__(.+?)__", re.S),
    re.compile(r"\*([^*\n]+)\*"),
    re.compile(r"(?<![A-Za-z0-9_])_([^_\n]+)_(?![A-Za-z0-9_])"),
    re.compile(r"`([^`\n]+)`"),
)


def _strip_emphasis(text: str) -> str:
    for rx in _EMPH_RES:
        text = rx.sub(r"\1", text)
    return text


class SectionHierarchy:
    """Hierarchical section path: a stack of (level, display, hash).

    ``update`` pops every entry at the same or deeper level, then pushes
    the new section, so ``get_titles()`` returns the root->current path
    (single entry for an h1-only document, matching the golden fixture).
    """

    def __init__(self) -> None:
        self._stack: list[tuple[int, str, str]] = []

    def update(self, number: str, title: str, level: int) -> None:
        while self._stack and self._stack[-1][0] >= level:
            self._stack.pop()
        display = f"{number}. {title}" if number else title
        self._stack.append((level, display, hash_string(title)))

    def get_titles(self) -> list[str]:
        return [entry[1] for entry in self._stack]

    def get_hashes(self) -> list[str]:
        return [entry[2] for entry in self._stack]


def parse_markdown_table(content: str) -> Optional[dict[str, Any]]:
    """``| a | b |`` header + ``|---|---|`` separator + rows -> {headers,
    rows}; rows whose arity differs from the header are dropped; None on
    any structural failure."""
    lines = [line.strip() for line in content.strip().split("\n") if line.strip()]
    if len(lines) < 2:
        return None
    headers = [h.strip() for h in lines[0].strip("|").split("|") if h.strip()]
    if not headers:
        return None
    separator = lines[1].strip("|").split("|")
    if not all(_TABLE_SEP_CELL_RE.fullmatch(s.strip()) for s in separator):
        return None
    rows = []
    for line in lines[2:]:
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) == len(headers):
            rows.append(cells)
    return {"headers": headers, "rows": rows}


def parse_markdown_image(content: str) -> Optional[dict[str, str]]:
    """``![alt](src)`` -> {alt, src}; None when not an image."""
    match = _IMAGE_RE.match(content.strip())
    if match:
        return {"alt": match.group(1).strip(), "src": match.group(2).strip()}
    return None


def extract_from_markdown_text(
    markdown_content: str,
    url: str = "",
    repo_link: str = "",
    extraction_date: str = "",
    table_cache: Optional[list[dict[str, Any]]] = None,
    marker_tables: Optional[list[dict[str, Any]]] = None,
    marker_images: Optional[list[dict[str, Any]]] = None,
    default_code_type: str = "md",
    marker_style: bool = False,
) -> list[dict[str, Any]]:
    """Extract the element stream from a markdown string.

    Returns a list of element dicts with the reference envelope. Pure and
    deterministic: same input -> same output, byte for byte.

    ``marker_tables`` / ``marker_images`` are the row-local enrichment
    joins (markdown_extractor.py:460-472 / :398-413): the FIRST marker
    record on the same page attaches its table data / bbox to the
    element and flips ``source`` to "marker_json". The bbox set by the
    table join then participates in the ``table_cache`` IoU validation,
    matching the reference's ordering.

    ``marker_style=True`` emulates the reference's MARKER path
    (marker_processor.py — the path that produced the golden fixture
    BHT_CV32A65X_expected.json) instead of its markdown-it path:
    every block flushes separately (single blank line splits text, vs
    the markdown path's two — markdown_extractor.py:317-319 only
    flushes when ``token.map[0] > last_line + 1``), list-item lines
    keep their markers, paired emphasis/code markers are stripped
    (marker's JSON blocks carry plain text), heading content is the
    raw title without auto-number recombination, and token counts use
    the cl100k-pinned calibration (kernel/cl100k_calibration.py).
    Validated golden-for-golden against the fixture in
    tests/test_fixture_parity.py.
    """
    hierarchy = SectionHierarchy()
    elements: list[dict[str, Any]] = []
    section_counts = [0] * 6
    current_page = 1

    text_content: list[str] = []
    text_start_line = 0
    text_last_line = 0
    flush_gap = 1 if marker_style else 2
    tcount = token_count_cl100k if marker_style else token_count

    def envelope(
        etype: str,
        content: str,
        line_span: tuple[int, int],
        page: int,
        metadata: dict[str, Any],
    ) -> dict[str, Any]:
        return {
            "file_path": url,
            "repo_link": repo_link,
            "extraction_date": extraction_date,
            "type": etype,
            "content": content,
            "line_span": [line_span[0], line_span[1]],
            "token_count": tcount(content),
            "section_id": hash_string(content),
            "section_path": hierarchy.get_titles(),
            "section_hash_path": hierarchy.get_hashes(),
            "page": page,
            "metadata": metadata,
        }

    def flush_text() -> None:
        nonlocal text_content, text_start_line
        if text_content:
            content = "\n".join(text_content).strip()
            if marker_style:
                content = _strip_emphasis(content)
            if content:
                elements.append(
                    envelope(
                        "text", content, (text_start_line, text_last_line),
                        current_page, {},
                    )
                )
            text_content = []
            text_start_line = 0

    def emit_table(table_lines: list[str], start: int, end: int) -> None:
        content = "\n".join(table_lines)
        table_data = parse_markdown_table(content)
        if table_data is None:
            return
        validation: dict[str, Any] = {"valid": True, "issues": [], "source": "markdown"}
        if marker_tables:
            # J1: first marker table on the same page enriches the
            # element (markdown_extractor.py:460-472).
            matching = next(
                (t for t in marker_tables if t.get("page") == current_page), None
            )
            if matching is not None:
                if matching.get("table_data") is not None:
                    table_data["marker_data"] = matching["table_data"]
                validation["source"] = "marker_json"
                if matching.get("bbox") is not None:
                    validation["bbox"] = list(matching["bbox"])
        if table_cache:
            # Semi-join vs the cached table records for this document:
            # valid iff any cache entry on the same page overlaps
            # (IoU > 0.5) or carries no bbox (markdown_extractor.py:474-493).
            from pdf_extractor_ray.kernel.tables import calculate_iou

            bbox = validation.get("bbox")
            ok = any(
                t.get("page") == current_page
                and (
                    bbox is None
                    or t.get("bbox") is None
                    or calculate_iou(list(t["bbox"]), list(bbox)) > 0.5
                )
                for t in table_cache
            )
            if not ok:
                validation["issues"].append("No matching table in table_cache")
                validation["valid"] = False
        elements.append(
            envelope(
                "table", content, (start, end), current_page,
                {"table": table_data, "validation": validation},
            )
        )

    def emit_heading(raw_title: str, level: int, start: int, end: int) -> None:
        cleaned = clean_section_title(raw_title, to_ascii=True)
        num_match = _SECTION_NUM_RE.match(raw_title)
        if num_match and num_match.group(1):
            section_number = num_match.group(1).rstrip(".")
            cleaned = clean_section_title(
                num_match.group(2) or "Unnamed Section", to_ascii=True
            )
        else:
            for j in range(level, len(section_counts)):
                section_counts[j] = 0
            section_counts[level - 1] += 1
            parts = [
                str(section_counts[j])
                for j in range(level)
                if section_counts[j] > 0
            ]
            section_number = ".".join(parts) if parts else str(level)
        if marker_style:
            # marker path: heading text is the raw (cleaned) title —
            # auto-numbers live only in metadata, and the section path
            # carries the title as written (fixture headings
            # '4.1.5.4. BHT ...' and 'State Diagram')
            display = clean_section_title(raw_title, to_ascii=True)
            hierarchy.update("", display, level)
        else:
            hierarchy.update(section_number, cleaned, level)
            display = f"{section_number}. {cleaned}"
        elements.append(
            envelope(
                "heading", display, (start, end), current_page,
                {"level": level, "section_number": section_number},
            )
        )

    lines = markdown_content.split("\n")
    n = len(lines)
    i = 0
    blank_run = 0  # blank lines seen since the last content line

    # Current blank-free paragraph run inside text_content — a setext
    # underline promotes exactly this run (commonmark binds the
    # underline to the whole preceding paragraph, and markdown-it hands
    # the reference its full multi-line inline content).
    para_start_idx = 0  # index in text_content where the run began
    para_start_lineno = 0  # 1-based source line of the run's first line
    para_prev_last = 0  # text_last_line before the run began
    hr_break_pending = False  # a thematic break ends the paragraph
    # without flushing text (the reference walk has no hr branch)

    # Active list context: content column of the most recent list item
    # (None outside lists). Inside a list, commonmark moves the
    # indented-code threshold to content-col + 4 — a 4-space line after
    # a blank is a PARAGRAPH of the loose item, not code — and
    # markdown-it hands the reference that paragraph's inline content,
    # which the <2-line-gap rule then merges into the item's text.
    list_ctx: int | None = None

    in_table = False
    table_lines: list[str] = []
    table_start_line = 0

    while i < n:
        raw = lines[i]
        lineno = i + 1  # 1-based
        stripped = raw.strip()

        # blockquote markers strip off and the remainder re-classifies
        # (markdown-it parses block structure INSIDE quotes; its token
        # walk sees the dequoted inline content — the reference never
        # emits '>' into text)
        if stripped.startswith(">"):
            stripped = _BLOCKQUOTE_RE.sub("", stripped).strip()
            raw = stripped

        if not stripped:
            if in_table:
                emit_table(table_lines, table_start_line, lineno - 1)
                in_table = False
                table_lines = []
            blank_run += 1
            i += 1
            continue

        # markdown path: >= 2 blank lines between blocks flushes the
        # accumulated text (markdown_extractor.py:317-319); marker
        # path: every blank line is a block boundary
        if blank_run >= flush_gap:
            flush_text()
        gap_flushed = blank_run >= flush_gap
        prev_blank = blank_run > 0
        prev_gap = blank_run  # lines separating this line from the
        # last content; vanished tokens (hr, html_block) re-enter this
        # count below, because the reference's flush rule compares
        # SOURCE line numbers (token.map[0] > last_line + 1) and the
        # vanished token's lines widen that gap
        blank_run = 0

        # indented code block (4 spaces / tab at a block start — after
        # a blank line or at a structural boundary): markdown-it
        # tokenizes it as code_block, which the reference emits as a
        # code element after flushing text (markdown_extractor.py:524).
        # Checked before the first-char dispatch — '    # x' is code,
        # not a heading, and an indented fence/table line is code too.
        # Inside a list the threshold is content-col + 4 (commonmark);
        # below it the line falls through to the text path as a
        # paragraph of the loose item.
        code_strip = 4 if list_ctx is None else list_ctx + 4
        if (
            not marker_style
            and (prev_blank or not text_content)
            and not in_table
            and _INDENT_CODE_RE.match(raw)
            and _indent_width(raw) >= code_strip
        ):
            flush_text()
            start = lineno
            code_lines = []
            while i < n and (
                not lines[i].strip()
                or _indent_width(lines[i]) >= code_strip
            ):
                code_lines.append(
                    _strip_indent_cols(lines[i], code_strip)
                    if lines[i].strip()
                    else ""
                )
                i += 1
            while code_lines and not code_lines[-1].strip():
                code_lines.pop()
            code = "\n".join(code_lines).strip("\n")
            if code.strip():
                elements.append(
                    envelope(
                        "code", code, (start, start + len(code_lines) - 1),
                        current_page,
                        {
                            "code_type": default_code_type,
                            "code_metadata": {
                                "language": default_code_type,
                                "length": len(code),
                            },
                        },
                    )
                )
            blank_run = 1  # the run ended on a blank or block boundary
            continue

        # First-char dispatch: every special line class is identified
        # by stripped[0], so plain prose (the overwhelming majority)
        # skips all five class regexes entirely. Byte-identical: each
        # class regex anchors on that same first character.
        c0 = stripped[0]

        # fenced code block
        fence = _FENCE_RE.match(stripped) if c0 in "`~" else None
        if fence:
            flush_text()
            if in_table:
                emit_table(table_lines, table_start_line, lineno - 1)
                in_table = False
                table_lines = []
            list_ctx = None
            marker, info = fence.group(1), fence.group(2).strip()
            code_lines: list[str] = []
            start = lineno
            i += 1
            while i < n and not lines[i].strip().startswith(marker):
                code_lines.append(lines[i])
                i += 1
            end = min(i + 1, n)
            i += 1  # skip closing fence
            code = "\n".join(code_lines).strip()
            code_type = info.split()[0].lower() if info else default_code_type
            elements.append(
                envelope(
                    "code", code, (start, end), current_page,
                    {
                        "code_type": code_type,
                        "code_metadata": {"language": code_type, "length": len(code)},
                    },
                )
            )
            continue

        # page marker
        page_match = _PAGE_MARKER_RE.match(stripped) if c0 == "<" else None
        if page_match:
            flush_text()
            if in_table:
                emit_table(table_lines, table_start_line, lineno - 1)
                in_table = False
                table_lines = []
            current_page = int(page_match.group(1))
            list_ctx = None
            i += 1
            continue

        # raw HTML block (markdown-it html_block): skip through the
        # next blank line WITHOUT flushing accumulated text — the
        # reference walk has no branch for the token, so the block
        # leaves no trace; it still ends the current paragraph (a
        # following setext underline must not bind across it) and any
        # open list.
        if (
            c0 == "<"
            and not marker_style
            and _HTML_BLOCK_RE.match(stripped)
        ):
            if in_table:
                emit_table(table_lines, table_start_line, lineno - 1)
                in_table = False
                table_lines = []
            start_i = i
            while i < n and lines[i].strip():
                i += 1
            hr_break_pending = True
            list_ctx = None
            # the block's source lines widen the paragraph gap (see
            # prev_gap note above)
            blank_run = prev_gap + (i - start_i)
            continue

        # link reference definition: vanishes before tokenization (the
        # walk never sees it); its source line still widens the gap
        if (
            c0 == "["
            and not marker_style
            and (prev_blank or not text_content or hr_break_pending)
            and _LINK_DEF_RE.match(stripped)
        ):
            blank_run = prev_gap + 1
            i += 1
            continue

        # heading (ATX)
        heading = _HEADING_RE.match(stripped) if c0 == "#" else None
        if heading:
            flush_text()
            if in_table:
                emit_table(table_lines, table_start_line, lineno - 1)
                in_table = False
                table_lines = []
            list_ctx = None
            emit_heading(
                heading.group(2).strip(), len(heading.group(1)), lineno, lineno
            )
            i += 1
            continue

        # thematic break: markdown-it emits an hr token that the
        # reference walk has no branch for — the line vanishes from the
        # element stream WITHOUT flushing accumulated text
        # (markdown_extractor.py token loop). Checked before list-item
        # classification because '- - -' is a break, not a bullet.
        if c0 in "-*_" and _HR_RE.match(stripped):
            if in_table:
                emit_table(table_lines, table_start_line, lineno - 1)
                in_table = False
                table_lines = []
            hr_break_pending = True
            list_ctx = None  # a thematic break ends any open list
            if not marker_style:
                # the hr's own source line widens the paragraph gap
                blank_run = prev_gap + 1
            i += 1
            continue

        # image on its own line
        if c0 == "!" and _IMAGE_RE.match(stripped):
            flush_text()
            if in_table:
                emit_table(table_lines, table_start_line, lineno - 1)
                in_table = False
                table_lines = []
            list_ctx = None
            image_data = parse_markdown_image(stripped)
            metadata = {
                "alt": image_data["alt"] if image_data else "",
                "src": image_data["src"] if image_data else "",
                "source": "markdown",
            }
            if marker_images:
                # J2: first marker image on the same page contributes a
                # bbox (markdown_extractor.py:398-413).
                matching = next(
                    (m for m in marker_images if m.get("page") == current_page),
                    None,
                )
                if matching is not None:
                    if matching.get("bbox") is not None:
                        metadata["bbox"] = list(matching["bbox"])
                    metadata["source"] = "marker_json"
            elements.append(
                envelope("image", stripped, (lineno, lineno), current_page, metadata)
            )
            i += 1
            continue

        # table line
        if c0 == "|" and _TABLE_LINE_RE.match(stripped):
            flush_text()
            if not in_table:
                in_table = True
                table_start_line = lineno
                table_lines = []
                list_ctx = None
            table_lines.append(stripped)
            i += 1
            continue
        elif in_table:
            emit_table(table_lines, table_start_line, lineno - 1)
            in_table = False
            table_lines = []

        # plain text: paragraph line or list item. markdown path strips
        # the list marker (one entry per item — mirrors the reference's
        # per-inline append); marker path keeps the line as written
        # (fixture texts carry their '- ' markers)
        item = (
            _LIST_ITEM_RE.match(raw)
            if not marker_style and c0 in "-*+0123456789"
            else None
        )

        # setext heading: a paragraph underlined by === (h1) or ---
        # (h2) on the very next line (commonmark; markdown-it emits
        # heading_open h1/h2 for it). The underline binds to the WHOLE
        # preceding blank-free paragraph run — markdown-it hands the
        # reference a multi-line inline content whose soft breaks
        # clean_section_title then drops (category-C strip,
        # markdown_extractor.py:116-140), so 'l1\nl2\n===' titles as
        # 'l1l2' here exactly as it does there.
        if (
            not marker_style
            and item is None
            and i + 1 < n
            and lines[i + 1][:1] in ("=", "-", " ", "\t")  # cheap gate:
            # almost every next line starts with prose; only candidate
            # underlines (possibly indented) pay the strip + regex
        ):
            nxt = lines[i + 1].strip()
            if nxt and nxt[0] in "=-" and _SETEXT_RE.match(nxt):
                continues_para = (
                    text_content and not prev_blank and not hr_break_pending
                )
                if continues_para:
                    para = text_content[para_start_idx:]
                    del text_content[para_start_idx:]
                    text_last_line = para_prev_last
                    title = "\n".join(para + [stripped])
                    start = para_start_lineno
                else:
                    title = stripped
                    start = lineno
                flush_text()
                list_ctx = None
                emit_heading(
                    title, 1 if nxt[0] == "=" else 2, start, lineno + 1
                )
                i += 2
                continue

        content_line = item.group(2) if item else stripped
        if item:
            list_ctx = item.start(2)  # content column of the item
        elif (
            prev_blank
            and list_ctx is not None
            and _indent_width(raw) < list_ctx
        ):
            # an unindented paragraph after a blank ends the list
            list_ctx = None
        if not text_content:
            text_start_line = lineno
        elif gap_flushed:
            text_start_line = lineno
        if not text_content or prev_blank or hr_break_pending:
            para_start_idx = len(text_content)
            para_start_lineno = lineno
            para_prev_last = text_last_line
        hr_break_pending = False
        text_content.append(content_line)
        text_last_line = lineno
        i += 1

    if in_table:
        emit_table(table_lines, table_start_line, n)
    flush_text()
    return elements
