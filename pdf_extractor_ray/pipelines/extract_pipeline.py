"""The flagship pipeline: pages parquet -> extraction rows -> parquet.

Shape (SURVEY.md §3.5):

    read_parquet(pages)                      # column-pruned read
      -> size split (small | giant payloads)  # skew isolation, no shuffle
      -> map_batches(ExtractDocuments, ...)   # actor pool per lane
      -> union
      -> write_parquet + lineage sidecars     # resumable (state/lineage.py)

Skew handling: instead of a global sort/repartition (an all-to-all
exchange that at 100 TB would move every block just to co-locate sizes),
the dataset is *split* by payload byte length with two vectorized
filters — a cheap narrow op. The giant-payload lane runs with
``batch_size=4`` so one multi-MB document never sits in a batch next to
thousands of small ones (straggler isolation, SURVEY.md §4.2); the small
lane uses large batches for throughput. Both lanes stream; the union is
a logical concat, not a shuffle.

At cluster scale the only stateful stage is the extraction actor pool;
everything else is stateless tasks, so the streaming executor can
pipeline read -> extract -> write with backpressure and object-store
spilling. Nothing materializes the full dataset.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_extractor_ray.stages.extract_stage import ExtractDocuments

__all__ = ["extract_pages", "run_resumable_extraction", "GIANT_PAYLOAD_BYTES"]

# Payloads above this byte length go to the low-batch-size lane. p99 of
# web pages is far below this; synthetic giant rows are ~1 MB.
GIANT_PAYLOAD_BYTES = 256 * 1024

_PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def _filter_by_size(small: bool):
    threshold = GIANT_PAYLOAD_BYTES

    def fn(batch: pa.Table) -> pa.Table:
        sizes = pc.binary_length(batch["html"])
        sizes = pc.fill_null(sizes, 0)
        mask = pc.less(sizes, threshold) if small else pc.greater_equal(sizes, threshold)
        return batch.filter(mask)

    return fn


def extract_pages(
    source: "str | list[str] | ray.data.Dataset",
    merge_strategy: str = "conservative",
    concurrency: Optional[int] = None,
    small_batch_size: int = 256,
    giant_batch_size: int = 4,
    split_by_size: bool = True,
) -> ray.data.Dataset:
    """Build the (lazy) extraction pipeline over a pages table.

    ``source`` is a parquet path/paths or an existing Dataset with the
    pages schema. Returns the lazy extraction Dataset — consume it with
    ``write_parquet`` / ``iter_batches`` / an aggregate.
    """
    if isinstance(source, ray.data.Dataset):
        ds = source
    else:
        ds = ray.data.read_parquet(source, columns=_PAGE_COLUMNS)

    # Autoscaling actor pools sized to the cluster: the small lane may
    # grow to (cpus - 2) actors — leaving headroom so the read and write
    # stages never starve — and the rare giant lane to cpus // 8.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if concurrency is None:
        small_conc: "int | tuple" = (1, max(2, cpus - 2))
        giant_conc: "int | tuple" = (1, max(1, cpus // 8))
    else:
        small_conc = concurrency
        giant_conc = (1, max(1, min(4, int(concurrency if isinstance(concurrency, int) else 4))))

    if not split_by_size:
        return ds.map_batches(
            ExtractDocuments,
            fn_constructor_kwargs={"merge_strategy": merge_strategy},
            batch_format="pyarrow",
            batch_size=small_batch_size,
            concurrency=small_conc,
        )

    small = ds.map_batches(
        _filter_by_size(small=True), batch_format="pyarrow"
    ).map_batches(
        ExtractDocuments,
        fn_constructor_kwargs={"merge_strategy": merge_strategy},
        batch_format="pyarrow",
        batch_size=small_batch_size,
        concurrency=small_conc,
    )
    giant = ds.map_batches(
        _filter_by_size(small=False), batch_format="pyarrow"
    ).map_batches(
        ExtractDocuments,
        fn_constructor_kwargs={"merge_strategy": merge_strategy},
        batch_format="pyarrow",
        batch_size=giant_batch_size,
        concurrency=giant_conc,
    )
    return small.union(giant)


def run_resumable_extraction(
    input_files: list[str],
    out_dir: str,
    merge_strategy: str = "conservative",
    shard_size: int = 1,
    concurrency: Optional[int] = None,
) -> dict:
    """Run the pipeline shard-by-shard with per-partition lineage.

    Each shard (``shard_size`` input parquet files) writes to its own
    ``part={pid}`` directory plus a ``_lineage/part-{pid}.json`` sidecar
    recording url range, row count and a url-set checksum. A rerun skips
    every shard whose sidecar already exists — resume from the last
    committed partition (north rule). See state/lineage.py.
    """
    from pdf_extractor_ray.state.lineage import (
        completed_partitions,
        write_partition_with_lineage,
    )

    done = completed_partitions(out_dir)
    shards = [
        (pid, input_files[i : i + shard_size])
        for pid, i in enumerate(range(0, len(input_files), shard_size))
    ]
    ran, skipped = [], []
    for pid, files in shards:
        if pid in done:
            skipped.append(pid)
            continue
        ds = extract_pages(
            files, merge_strategy=merge_strategy, concurrency=concurrency
        )
        write_partition_with_lineage(ds, out_dir, pid, input_files=files)
        ran.append(pid)
    return {"ran": ran, "skipped": skipped, "out_dir": out_dir}
