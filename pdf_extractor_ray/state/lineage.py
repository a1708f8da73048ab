"""Per-partition lineage sidecars -> resumable runs (north rule).

Layout under ``out_dir``:

    part=00000/ *.parquet        extraction rows for partition 0
    part=00001/ ...
    _lineage/part-00000.json     {partition_id, input_files, url_min,
                                  url_max, row_count, url_sha256, wall_s}

Commit protocol: data is written into ``part=N.tmp`` first, the sidecar
is computed from the *written* files (cheap single-column re-read of
``url``), the directory is atomically renamed to ``part=N`` and only
then the sidecar lands. A crash mid-partition therefore leaves either a
``.tmp`` directory (ignored and overwritten on rerun) or a fully
committed partition — never duplicates, never gaps
(SURVEY.md §4.2 "Resumable output").
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

__all__ = [
    "completed_partitions",
    "write_partition_with_lineage",
    "read_lineage",
]


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def _sidecar_path(out_dir: str, pid: int) -> str:
    return os.path.join(_lineage_dir(out_dir), f"part-{pid:05d}.json")


def completed_partitions(out_dir: str) -> set[int]:
    """Partition ids with a committed sidecar."""
    ldir = _lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return set()
    done = set()
    for name in os.listdir(ldir):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                done.add(int(name[len("part-"):-len(".json")]))
            except ValueError:
                continue
    return done


def write_partition_with_lineage(
    ds,
    out_dir: str,
    pid: int,
    input_files: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> dict:
    """Consume ``ds`` into partition ``pid`` with the commit protocol.

    ``partition_cols`` additionally hive-partitions the parquet INSIDE
    the shard directory (e.g. ``part=00000/lang=en/...``) — keyed
    layout for downstream readers without touching the resume unit.
    """
    import pyarrow.dataset as pads

    part_dir = os.path.join(out_dir, f"part={pid:05d}")
    tmp_dir = part_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    if os.path.isdir(part_dir):
        shutil.rmtree(part_dir)  # uncommitted leftover (no sidecar)
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)

    t0 = time.monotonic()
    if partition_cols:
        ds.write_parquet(tmp_dir, partition_cols=partition_cols)
    else:
        ds.write_parquet(tmp_dir)
    wall_s = time.monotonic() - t0

    # Sidecar facts come from the files actually written (single narrow
    # column re-read; never re-executes the pipeline).
    urls = (
        pads.dataset(tmp_dir, format="parquet")
        .to_table(columns=["url"])
        .column("url")
        .to_pylist()
    )
    urls_sorted = sorted(urls)
    digest = hashlib.sha256("\n".join(urls_sorted).encode()).hexdigest()

    os.replace(tmp_dir, part_dir)
    sidecar = {
        "partition_id": pid,
        "input_files": input_files or [],
        "url_min": urls_sorted[0] if urls_sorted else "",
        "url_max": urls_sorted[-1] if urls_sorted else "",
        "row_count": len(urls),
        "url_sha256": digest,
        "wall_s": round(wall_s, 3),
    }
    tmp_sidecar = _sidecar_path(out_dir, pid) + ".tmp"
    with open(tmp_sidecar, "w") as f:
        json.dump(sidecar, f, indent=1)
    os.replace(tmp_sidecar, _sidecar_path(out_dir, pid))
    return sidecar


def read_lineage(out_dir: str) -> list[dict]:
    """All committed sidecars, ordered by partition id."""
    out = []
    for pid in sorted(completed_partitions(out_dir)):
        with open(_sidecar_path(out_dir, pid)) as f:
            out.append(json.load(f))
    return out
