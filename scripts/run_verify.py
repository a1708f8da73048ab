"""The /verify skill's drive-and-check recipe as one executable:
flagship resumable extraction + invariants 1-4 (url exactness,
resume, byte-identity, poison tolerance). Exits non-zero on any
failure. Run from the repo root."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import shutil

from pdf_extractor_ray import kernel
from pdf_extractor_ray.pipelines import run_resumable_extraction
from pdf_extractor_ray.sources import make_page_row, write_pages_parquet

for p in ("/tmp/v_pages", "/tmp/v_out"):
    shutil.rmtree(p, ignore_errors=True)

files = write_pages_parquet("/tmp/v_pages", 600, rows_per_file=200)
run_resumable_extraction(files, "/tmp/v_out")

import pyarrow.dataset as pads

inp = set(
    pads.dataset("/tmp/v_pages").to_table(columns=["url"])["url"].to_pylist()
)
outt = pads.dataset("/tmp/v_out", partitioning="hive").to_table()
out = outt["url"].to_pylist()
assert len(out) == len(set(out)) == len(inp) and set(out) == inp, "inv1"
print("inv1 OK: urls exact, no dups,", len(out))

row = make_page_row(7)
k = kernel.extract_document(**row)
assert (
    k["extracted_text"] == outt["extracted_text"].to_pylist()[out.index(row["url"])]
), "inv3"
print("inv3 OK: byte-identical extracted_text")

lin = sorted(glob.glob("/tmp/v_out/_lineage/part-*.json"))
os.remove(lin[1])
os.makedirs("/tmp/v_out/part=00001.tmp", exist_ok=True)
run_resumable_extraction(files, "/tmp/v_out")
assert not os.path.exists("/tmp/v_out/part=00001.tmp"), "tmp not cleaned"
out2 = pads.dataset("/tmp/v_out", partitioning="hive").to_table(
    columns=["url"]
)["url"].to_pylist()
assert set(out2) == inp and len(out2) == len(inp), "inv2"
print("inv2 OK: resumed one partition, url set exact")

bad = make_page_row(3); bad["html"] = b"\x00\x01\x02 not html or json"
assert kernel.extract_document(**bad).get("status") in ("ok", "error"), "inv4"
bad2 = make_page_row(4); bad2["html"] = None; bad2["text"] = None
assert kernel.extract_document(**bad2).get("status") in ("ok", "error"), "inv4b"
print("inv4 OK: poison rows handled")
ray.shutdown()
print("VERIFY OK")
