"""HTML -> markdown/text conversion kernel (SURVEY.md M18 / S2).

Behavioral spec: the reference converts HTML with
``html2text.html2text(html)`` then strips any remaining tags with
``bleach.clean(text, tags=[], strip=True)``
(/root/reference/src/pdf_extractor/llm_integration/utils/corpus_utils.py:138-147).
Neither library is available offline, so this module re-implements the
needed subset on the stdlib ``html.parser``:

  - <script>/<style>/<head>/<template>/<noscript> contents dropped
    entirely (the reference test corpus requires the <script> body to be
    absent from the output, /root/reference/tests/corpus/test_corpus.html:16)
  - h1..h6 -> ``#``-style markdown headings
  - p / div / br -> paragraph breaks
  - b/strong -> ``**..**``, i/em -> ``*..*``
  - a -> link text only (boilerplate-strip semantics: hrefs are noise at
    corpus scale)
  - ul/ol/li -> ``- item`` lines
  - table/tr/td/th -> pipe-markdown rows with a ``|---|`` separator after
    the first row (feeds parse_markdown_table downstream)
  - pre > code -> fenced code block, language from ``class="language-x"``
  - img -> ``![alt](src)``
  - HTML comments preserved ONLY when they are page markers
    ``<!-- page: N -->`` (the multi-page PDF-to-markdown convention the
    markdown extractor understands, markdown_extractor.py:373-379)
  - entities unescaped (stdlib HTMLParser convert_charrefs)

Output is deterministic markdown suitable for
``extract_from_markdown_text``; collapsing of inter-block whitespace is
normalized to single blank lines between blocks.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["html_to_markdown", "strip_html_tags"]

_SKIP_CONTENT = {"script", "style", "head", "template", "noscript"}
_BLOCK_BREAK = {"p", "div", "section", "article", "main", "body", "blockquote"}
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_PAGE_COMMENT_RE = re.compile(r"^\s*page:\s*\d+\s*$")
_LANG_CLASS_RE = re.compile(r"language-([\w+-]+)")
_TAG_RE = re.compile(r"<[^>]+>")


class _MarkdownHTMLParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._inline: list[str] = []
        self._skip_depth = 0
        self._heading_level = 0
        self._in_pre = False
        self._pre_lines: list[str] = []
        self._code_lang = ""
        self._list_depth = 0
        self._in_li = False
        # table state
        self._in_table = False
        self._row_cells: list[str] = []
        self._table_rows: list[list[str]] = []
        self._in_cell = False

    # -- helpers -------------------------------------------------------
    def _flush_inline(self) -> None:
        text = _WS_RE.sub(" ", "".join(self._inline)).strip()
        self._inline = []
        if text:
            self.blocks.append(text)

    def _append_text(self, text: str) -> None:
        if self._in_pre:
            self._pre_lines.append(text)
        elif self._in_cell:
            self._row_cells[-1] += text
        else:
            self._inline.append(text)

    # -- parser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list) -> None:
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        attrd = dict(attrs)
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self._flush_inline()
            self._heading_level = int(tag[1])
        elif tag == "pre":
            self._flush_inline()
            self._in_pre = True
            self._pre_lines = []
            self._code_lang = ""
        elif tag == "code":
            if self._in_pre:
                m = _LANG_CLASS_RE.search(attrd.get("class") or "")
                if m:
                    self._code_lang = m.group(1)
            else:
                self._append_text("`")
        elif tag in ("b", "strong"):
            self._append_text("**")
        elif tag in ("i", "em"):
            self._append_text("*")
        elif tag == "br":
            self._append_text("\n")
        elif tag in ("ul", "ol"):
            self._flush_inline()
            self._list_depth += 1
        elif tag == "li":
            self._flush_inline()
            self._in_li = True
        elif tag == "img":
            alt = (attrd.get("alt") or "").strip()
            src = (attrd.get("src") or "").strip()
            self._flush_inline()
            self.blocks.append(f"![{alt}]({src})")
        elif tag == "table":
            self._flush_inline()
            self._in_table = True
            self._table_rows = []
        elif tag == "tr" and self._in_table:
            self._row_cells = []
        elif tag in ("td", "th") and self._in_table:
            self._row_cells.append("")
            self._in_cell = True
        elif tag in _BLOCK_BREAK:
            self._flush_inline()

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            text = _WS_RE.sub(" ", "".join(self._inline)).strip()
            self._inline = []
            if text:
                self.blocks.append("#" * self._heading_level + " " + text)
            self._heading_level = 0
        elif tag == "pre":
            self._in_pre = False
            code = "".join(self._pre_lines).strip("\n")
            self.blocks.append(f"```{self._code_lang}\n{code}\n```")
            self._pre_lines = []
        elif tag == "code":
            if not self._in_pre:
                self._append_text("`")
        elif tag in ("b", "strong"):
            self._append_text("**")
        elif tag in ("i", "em"):
            self._append_text("*")
        elif tag in ("ul", "ol"):
            self._flush_inline()
            self._list_depth = max(0, self._list_depth - 1)
        elif tag == "li":
            text = _WS_RE.sub(" ", "".join(self._inline)).strip()
            self._inline = []
            if text:
                self.blocks.append(f"- {text}")
            self._in_li = False
        elif tag in ("td", "th"):
            self._in_cell = False
        elif tag == "tr" and self._in_table:
            if self._row_cells:
                cells = [_WS_RE.sub(" ", c).strip() for c in self._row_cells]
                self._table_rows.append(cells)
            self._row_cells = []
        elif tag == "table":
            self._in_table = False
            if self._table_rows:
                lines = ["| " + " | ".join(self._table_rows[0]) + " |"]
                lines.append("|" + "---|" * len(self._table_rows[0]))
                for row in self._table_rows[1:]:
                    lines.append("| " + " | ".join(row) + " |")
                self.blocks.append("\n".join(lines))
            self._table_rows = []
        elif tag in _BLOCK_BREAK:
            self._flush_inline()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._append_text(data)

    def handle_comment(self, data: str) -> None:
        if self._skip_depth:
            return
        if _PAGE_COMMENT_RE.match(data):
            self._flush_inline()
            self.blocks.append(f"<!--{data}-->")

    def close(self) -> None:  # flush trailing inline text
        super().close()
        self._flush_inline()


def html_to_markdown(html: str) -> str:
    """Convert an HTML document to deterministic markdown text."""
    parser = _MarkdownHTMLParser()
    parser.feed(html)
    parser.close()
    return "\n\n".join(parser.blocks)


def strip_html_tags(text: str) -> str:
    """Remove any residual angle-bracket tags (the bleach ``tags=[]``
    pass of corpus_utils.py:143)."""
    return _TAG_RE.sub("", text)
