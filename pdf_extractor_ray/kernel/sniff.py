"""Charset sniffing and content-type detection for raw fetch bodies.

A Common-Crawl-style fetch stores the response body as opaque bytes;
before any text operator can run, the body must be classified (is it
HTML? a PDF? an image?) and, for text, decoded under the right
charset. The reference handles only the utf-8 -> latin-1 fallback
(corpus_utils.py:150-156, the same fallback :mod:`payload` routing
keeps); real crawl bodies additionally declare charsets via BOMs and
``<meta charset=...>`` / ``http-equiv`` headers. This kernel is the
WHATWG-style sniff cascade, in priority order:

  1. binary magic numbers (``%PDF-``, PNG, GIF8, ``PK\\x03\\x04``)
     -> a binary content type, no charset, no text;
  2. Unicode BOMs (UTF-8 / UTF-16LE / UTF-16BE) -> decode accordingly,
     BOM stripped from the text;
  3. an in-document declaration within the first 4096 bytes, scanned
     on a latin-1 shadow of the prefix (charset declarations are
     ASCII by spec): ``<meta charset=X>`` or
     ``<meta http-equiv="content-type" content="text/html; charset=X">``;
  4. utf-8, with the latin-1 fallback on decode error (the reference's
     rule, corpus_utils.py:150-156).

Content type for decoded text is ``text/html`` when the text sniffs as
an HTML document (same regexes as payload routing), else
``text/plain``. Pure functions, no Ray imports (kernel contract).
"""

from __future__ import annotations

import re
from typing import Optional

__all__ = ["sniff_payload", "SniffResult"]

_MAGIC: tuple[tuple[bytes, str], ...] = (
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
)

# Declarations are matched on a latin-1 decode of the first 4 KiB:
# every byte maps to exactly one codepoint, so ASCII declarations
# survive any single-byte charset, and multi-byte charsets that could
# hide one (UTF-16) are already handled by the BOM step above.
_META_CHARSET_RE = re.compile(
    r"<meta[^>]{0,4096}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_][a-zA-Z0-9._-]{0,38})",
    re.IGNORECASE,
)
_HTML_SNIFF_RE = re.compile(
    r"^\s*(?:<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>])",
    re.IGNORECASE,
)
_HTML_TAG_RE = re.compile(
    r"<(?:p|div|h[1-6]|table|ul|ol|span|a|br|script|title)[\s>/]",
    re.IGNORECASE,
)

# Charset labels are normalized to the canonical names below so the
# output column is a small closed enum (WHATWG labels -> Python codecs).
_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "us-ascii": "us-ascii",
    "ascii": "us-ascii",
}


class SniffResult:
    """(content_type, charset, text). ``charset`` is '' and ``text``
    '' for binary payloads; ``charset`` records what was actually used
    to decode, with '-sig' BOM variants reported as the base name."""

    __slots__ = ("content_type", "charset", "text")

    def __init__(self, content_type: str, charset: str, text: str):
        self.content_type = content_type
        self.charset = charset
        self.text = text


def _text_type(text: str) -> str:
    if _HTML_SNIFF_RE.match(text) or _HTML_TAG_RE.search(text):
        return "text/html"
    return "text/plain"


def sniff_payload(data: Optional[bytes]) -> SniffResult:
    if not data:
        return SniffResult("application/octet-stream", "", "")
    for magic, ctype in _MAGIC:
        if data.startswith(magic):
            return SniffResult(ctype, "", "")
    if data.startswith(b"\xef\xbb\xbf"):
        text = data[3:].decode("utf-8", errors="replace")
        return SniffResult(_text_type(text), "utf-8", text)
    if data.startswith(b"\xff\xfe"):
        text = data[2:].decode("utf-16-le", errors="replace")
        return SniffResult(_text_type(text), "utf-16-le", text)
    if data.startswith(b"\xfe\xff"):
        text = data[2:].decode("utf-16-be", errors="replace")
        return SniffResult(_text_type(text), "utf-16-be", text)
    shadow = data[:4096].decode("latin-1")
    m = _META_CHARSET_RE.search(shadow)
    if m:
        label = _CHARSET_ALIASES.get(m.group(1).lower())
        if label is not None:
            codec = "ascii" if label == "us-ascii" else label
            try:
                text = data.decode(codec)
                return SniffResult(_text_type(text), label, text)
            except (UnicodeDecodeError, LookupError):
                pass  # mislabeled page: fall through to the default rule
    try:
        text = data.decode("utf-8")
        return SniffResult(_text_type(text), "utf-8", text)
    except UnicodeDecodeError:
        text = data.decode("latin-1")
        return SniffResult(_text_type(text), "latin-1", text)
