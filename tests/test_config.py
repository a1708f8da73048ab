"""Engine config env overrides (SURVEY.md §2.10 parity: the reference's
PYMUPDF_DPI/TABLE_ACCURACY_THRESHOLD-style env surface)."""

import subprocess
import sys


def test_defaults_match_reference_constants():
    from pdf_extractor_ray.config import CONFIG

    assert CONFIG.table_confidence_floor == 75.0
    assert CONFIG.merge_conservative == 0.8
    assert CONFIG.merge_aggressive == 0.6
    assert CONFIG.giant_payload_bytes == 256 * 1024
    assert CONFIG.scanned_check_max_pages == 5
    assert CONFIG.scanned_min_chars_per_page == 100


def test_env_overrides_apply_at_import():
    # fresh interpreter so the import-time env read is exercised
    code = (
        "from pdf_extractor_ray.config import CONFIG;"
        "from pdf_extractor_ray.kernel import pdfshape;"
        "print(CONFIG.table_confidence_floor, pdfshape.SCANNED_MIN_CHARS_PER_PAGE)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={
            "PATH": "/usr/bin:/bin",
            "PYTHONPATH": ".",
            "GRAFT_TABLE_CONFIDENCE_FLOOR": "50.5",
            "GRAFT_SCANNED_MIN_CHARS": "7",
        },
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.split() == ["50.5", "7"]
