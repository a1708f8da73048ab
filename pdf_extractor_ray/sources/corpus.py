"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1).

Schema (BASELINE.json input_hint, authoritative):
    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

Row ``i`` is generated from a per-row RNG seeded by ``(seed, i)`` so the
corpus is reproducible bit-for-bit regardless of how rows are batched or
which worker generates them. Payload kind by ``i % 10``:

    0-6  HTML page (headings numbered+unnumbered, paragraphs with inline
         bold/links, <ul> list, a 5-col Signal/IO table, fenced code,
         an <img>, a <script> that MUST NOT appear in extracted text,
         non-ASCII samples)
    7-8  pdf-shaped layout JSON (multi-page; even rows carry a table
         continued across pages with identical headers -> merge
         expected; odd rows carry differing headers -> no merge)
    9    edge cases rotating by i//10 % 4: empty payload, latin-1-only
         bytes, <script>-heavy page, giant ~1 MB body (skew bucket)

No external data; no wall clock (warc_ts = 2025-01-01T00:00:00Z + i s).
"""

from __future__ import annotations

import datetime
import json
import random

import pyarrow as pa

__all__ = ["PAGES_SCHEMA", "make_page_row", "pages_table", "write_pages_parquet"]

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

_EPOCH = datetime.datetime(2025, 1, 1, 0, 0, 0)

_WORDS = (
    "signal branch history table memory entry virtual address prediction "
    "counter instruction module configuration parameter subsystem clock "
    "reset update fetch execute cache frontend pipeline register state "
    "diagram transition outcome saturating implemented resolved stored"
).split()

_FR_WORDS = "le la les dans avec pour une des est sont table signal mémoire".split()
_DE_WORDS = "der die das und mit für eine ist sind Tabelle Signal Speicher".split()

_SIGNAL_ROWS = [
    ("clk_i", "in", "Subsystem Clock", "SUBSYSTEM", "logic"),
    ("rst_ni", "in", "Asynchronous reset active low", "SUBSYSTEM", "logic"),
    ("vpc_i", "in", "Virtual PC", "CACHE", "logic[VLEN-1:0]"),
    ("bht_update_i", "in", "Update with resolved address", "EXECUTE", "bht_update_t"),
    ("bht_prediction_o", "out", "Prediction output", "FRONTEND", "bht_prediction_t"),
    ("flush_bp_i", "in", "Flush branch predictor", "CONTROLLER", "logic"),
    ("debug_mode_i", "in", "Debug mode active", "CSR", "logic"),
]

_NON_ASCII = [
    "naïve café résumé",
    "Größe über Straße",
    "数据处理 — 引擎",
    "élan × Δt ≥ 0",
]


def _sentence(rng: random.Random, words: list[str], n: int) -> str:
    picked = [words[rng.randrange(len(words))] for _ in range(n)]
    picked[0] = picked[0].capitalize()
    return " ".join(picked) + "."


def _paragraph(rng: random.Random, words: list[str], n_sent: int = 3) -> str:
    return " ".join(_sentence(rng, words, rng.randint(6, 14)) for _ in range(n_sent))


def _html_payload(i: int, rng: random.Random, lang: str) -> bytes:
    words = {"fr": _FR_WORDS, "de": _DE_WORDS}.get(lang, _WORDS)
    parts = [
        "<!DOCTYPE html>",
        "<html>",
        f"<head><title>Document {i}</title>",
        '<style>body { color: red; }</style>',
        "</head>",
        "<body>",
    ]
    n_sections = rng.randint(1, 3)
    for s in range(n_sections):
        if rng.random() < 0.5:
            parts.append(f"<h1>{s + 4}.1.{i % 7}. Section {_sentence(rng, words, 3)[:-1]}</h1>")
        else:
            parts.append(f"<h1>Overview {_sentence(rng, words, 2)[:-1]}</h1>")
        parts.append(f"<p>{_paragraph(rng, words)} It has <b>bold text</b> and "
                     f'a <a href="https://example.org/{i}">link</a>.</p>')
        parts.append(f"<p>{_paragraph(rng, words, 2)}</p>")
        if rng.random() < 0.6:
            parts.append(f"<h2>Details {s}</h2>")
            parts.append("<ul>")
            for k in range(rng.randint(2, 4)):
                parts.append(f"<li>List item {k}: {_sentence(rng, words, 5)}</li>")
            parts.append("</ul>")
    if rng.random() < 0.7:
        n_rows = rng.randint(2, 5)
        parts.append("<table>")
        parts.append(
            "<tr><th>Signal</th><th>IO</th><th>Description</th>"
            "<th>connection</th><th>Type</th></tr>"
        )
        for r in range(n_rows):
            row = _SIGNAL_ROWS[(i + r) % len(_SIGNAL_ROWS)]
            parts.append("<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>")
        parts.append("</table>")
    if rng.random() < 0.5:
        parts.append(
            '<pre><code class="language-python">def predict(pc):\n'
            f"    return bht[pc % {1 << (4 + i % 6)}]\n</code></pre>"
        )
    if rng.random() < 0.4:
        parts.append(f'<img alt="state diagram {i}" src="figs/fig_{i % 50}.png">')
    if rng.random() < 0.3:
        parts.append(f"<p>{_NON_ASCII[i % len(_NON_ASCII)]}</p>")
    parts.append(f'<script>console.log("tracker-{i} should never appear");</script>')
    parts.append("</body>")
    parts.append("</html>")
    return "\n".join(parts).encode("utf-8")


def _pdf_payload(i: int, rng: random.Random) -> bytes:
    n_pages = rng.randint(2, 3)
    continued = i % 2 == 0  # identical headers across pages -> merge expected
    headers = ["Signal", "IO", "Description", "connection", "Type"]
    alt_headers = ["Name", "Dir", "Meaning", "Src"]
    pages = []
    for p in range(1, n_pages + 1):
        y = 72.0
        blocks = []
        blocks.append(
            {
                "type": "heading",
                "level": 1 if p == 1 else 2,
                "bbox": [72.0, y, 540.0, y + 18],
                "text": f"{p}.{i % 9}. Page {p} heading",
            }
        )
        y += 30
        blocks.append(
            {
                "type": "text",
                "bbox": [72.0, y, 540.0, y + 40],
                "spans": [
                    {"text": _sentence(rng, _WORDS, 8)},
                    {"text": _sentence(rng, _WORDS, 6)},
                ],
            }
        )
        y += 52
        if continued or p == 1:
            hdr = headers if continued else (headers if p == 1 else alt_headers)
            n_rows = rng.randint(2, 4)
            cells = [
                {"row": 0, "col": c, "text": h} for c, h in enumerate(hdr)
            ]
            for r in range(1, n_rows + 1):
                row = _SIGNAL_ROWS[(i + p + r) % len(_SIGNAL_ROWS)]
                for c in range(len(hdr)):
                    cells.append(
                        {"row": r, "col": c, "text": row[c % len(row)]}
                    )
            blocks.append(
                {
                    "type": "table",
                    "bbox": [72.0, y, 540.0, y + 14.0 * (n_rows + 1)],
                    "cells": cells,
                    "accuracy": round(90 + 10 * rng.random(), 2),
                }
            )
            y += 14.0 * (n_rows + 1) + 12
        elif p > 1:
            # differing headers: parsed as a separate table, no merge
            cells = [{"row": 0, "col": c, "text": h} for c, h in enumerate(alt_headers)]
            for c in range(len(alt_headers)):
                cells.append({"row": 1, "col": c, "text": f"v{c}"})
            blocks.append(
                {
                    "type": "table",
                    "bbox": [72.0, y, 500.0, y + 28.0],
                    "cells": cells,
                    "accuracy": round(85 + 10 * rng.random(), 2),
                }
            )
            y += 40
        blocks.append(
            {
                "type": "text",
                "bbox": [72.0, y, 540.0, y + 26],
                "spans": [{"text": _sentence(rng, _WORDS, 10)}],
            }
        )
        pages.append({"page_number": p, "width": 612, "height": 792, "blocks": blocks})
    doc = {"kind": "pdf", "pages": pages}
    return json.dumps(doc, sort_keys=True).encode("utf-8")


def _edge_payload(i: int, rng: random.Random) -> bytes:
    variant = (i // 10) % 4
    if variant == 0:
        return b""
    if variant == 1:
        return f"Vall{i}: s\xe9rie t\xe9l\xe9vis\xe9e \xe0 th\xe8me".encode("latin-1")
    if variant == 2:
        body = "\n".join(
            f"<script>var x{k} = {k};</script>" for k in range(20)
        )
        return (
            f"<html><body><p>visible {i}</p>{body}</body></html>".encode("utf-8")
        )
    # giant body for the skew bucket: ~1 MB of paragraphs
    para = _paragraph(rng, _WORDS, 5)
    blocks = [f"<p>{para} chunk {k}</p>" for k in range(1500)]
    return (
        "<html><body><h1>Giant document</h1>" + "\n".join(blocks) + "</body></html>"
    ).encode("utf-8")


def make_page_row(i: int, seed: int = 42) -> dict:
    """Generate row ``i`` of the corpus, independent of batching."""
    rng = random.Random((seed << 32) ^ i)
    lang = "en" if i % 10 < 9 else ("fr" if i % 20 == 9 else "de")
    kind = i % 10
    if kind <= 6:
        payload = _html_payload(i, rng, lang)
        text = ""
    elif kind <= 8:
        payload = _pdf_payload(i, rng)
        text = ""
    else:
        payload = _edge_payload(i, rng)
        # empty-payload rows carry pre-extracted plain text (the
        # "upstream already extracted" case of the text column)
        text = _paragraph(rng, _WORDS, 2) if (i // 10) % 4 == 0 else ""
    return {
        "url": f"https://example.org/{i % 100:04d}/{i:08d}",
        "warc_ts": _EPOCH + datetime.timedelta(seconds=i),
        "html": payload,
        "text": text,
        "lang": lang,
    }


def pages_table(start: int, stop: int, seed: int = 42) -> pa.Table:
    """Rows [start, stop) as one Arrow table."""
    rows = [make_page_row(i, seed) for i in range(start, stop)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_pages_parquet(
    path: str, n_rows: int, seed: int = 42, rows_per_file: int = 20_000
) -> list[str]:
    """Write the corpus as partitioned parquet (one file per shard, so a
    scaled-up generation parallelizes and reruns can skip shards)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    files = []
    for shard, start in enumerate(range(0, n_rows, rows_per_file)):
        stop = min(start + rows_per_file, n_rows)
        fname = os.path.join(path, f"pages-{shard:05d}.parquet")
        # Small row groups so a distributed read can split WITHIN a
        # file — one row group per file caps read parallelism at the
        # file count (real CC dumps have thousands of shards; small
        # local corpora don't, so the row-group granularity carries
        # the parallelism instead).
        pq.write_table(pages_table(start, stop, seed), fname, row_group_size=1024)
        files.append(fname)
    return files
