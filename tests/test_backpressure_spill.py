"""Streaming under object-store pressure: a deliberately tiny object store
forces spilling; the pipeline must complete without OOM or deadlock (the
100 TB posture in miniature — output far exceeds store capacity)."""

import json
import subprocess
import sys

SCRIPT = r"""
import json, shutil, sys
import ray
# ~210MB object store (the floor Ray allows) vs ~500MB of pipeline output.
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", object_store_memory=210 * 1024 * 1024)
sys.path.insert(0, "/root/repo")
import pyarrow.parquet as pq, pyarrow.compute as pc
from yomitoku_ray.synth.pages import generate_pages_table
from yomitoku_ray.pipelines.extract import extract_pages, ExtractConfig

pq.write_table(generate_pages_table(8000), "/tmp/spill_pages.parquet")
shutil.rmtree("/tmp/spill_out", ignore_errors=True)
cfg = ExtractConfig(detect_concurrency=6, detect_batch_size=16, read_num_blocks=64)
extract_pages("/tmp/spill_pages.parquet", cfg).write_parquet("/tmp/spill_out")
t = pq.read_table("/tmp/spill_out", columns=["url", "error"])
print(json.dumps({"rows": t.num_rows,
                  "ok": t.filter(pc.is_null(t["error"])).num_rows}))
ray.shutdown()
"""


def test_pipeline_completes_under_store_pressure():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["rows"] == 8000
    assert result["ok"] > 7500
