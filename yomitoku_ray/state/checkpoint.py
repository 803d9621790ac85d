"""Checkpointed, resumable pipeline runs (per-partition lineage + metrics).

The reference has no checkpointing (a re-run overwrites per-page output
files, cli/main.py:140-143); the north rule requires a killed
``ray job submit`` run to resume from the last committed partition. Design:

- the unit of commit is a **wave**: a deterministic chunk of the sorted
  input file list. Each wave runs the full extraction pipeline as one
  streaming Dataset execution and writes to ``data/wave-<k>.tmp`` ->
  atomic ``os.replace`` to ``data/wave-<k>`` -> manifest JSON written
  tmp+rename. A kill loses at most the in-flight wave.
- the manifest row carries lineage (input files + sizes, engine version,
  config echo) and metrics (row count, ok/error/truncated counts, output
  bytes, wall seconds) — the per-partition "lineage + row-count/byte-count
  metrics" of the north rule.
- resume = list manifests, subtract their input files from the input
  listing, process the remainder. Input files already covered are never
  re-read (skip happens at the read, not after).

At cluster scale the wave size trades resume granularity against scheduling
overhead; within a wave the streaming executor distributes blocks across
the cluster, so a wave is NOT a parallelism boundary — only a commit
boundary.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow.dataset as pads

from .. import __version__
from ..pipelines.extract import ExtractConfig, build_extract_pipeline, read_pages


def _list_input_files(pages_path: str) -> list[str]:
    if os.path.isdir(pages_path):
        return sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    return [pages_path]


def _manifest_dir(out_root: str) -> str:
    return os.path.join(out_root, "manifest")


def completed_input_files(out_root: str) -> set[str]:
    done = set()
    for path in glob.glob(os.path.join(_manifest_dir(out_root), "wave-*.json")):
        try:
            with open(path) as f:
                manifest = json.load(f)
            data_dir = os.path.join(out_root, "data", manifest["wave"])
            if os.path.isdir(data_dir):
                done.update(manifest["input_files"])
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn manifest: treat its wave as not done
    return done


def _out_stats(data_dir: str) -> tuple[int, int, dict]:
    ds = pads.dataset(data_dir)
    rows = 0
    n_err = 0
    n_trunc = 0
    for batch in ds.to_batches(columns=["error", "truncated"]):
        rows += batch.num_rows
        n_err += batch.column("error").is_valid().sum().as_py() if batch.num_rows else 0
        n_trunc += sum(1 for v in batch.column("truncated").to_pylist() if v)
    nbytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(data_dir, "*.parquet"))
    )
    return rows, nbytes, {"n_error_rows": n_err, "n_truncated_rows": n_trunc}


def run_resumable(
    pages_path: str,
    out_root: str,
    cfg: ExtractConfig | None = None,
    wave_files: int = 4,
    max_waves: int | None = None,
) -> dict:
    """Run (or resume) the extraction pipeline with per-wave commits.

    ``max_waves`` bounds how many waves this invocation processes (used by
    tests to simulate a kill between commits). Returns a summary dict.
    """
    cfg = cfg or ExtractConfig()
    os.makedirs(os.path.join(out_root, "data"), exist_ok=True)
    os.makedirs(_manifest_dir(out_root), exist_ok=True)

    files = _list_input_files(pages_path)
    done = completed_input_files(out_root)
    todo = [f for f in files if f not in done]

    # Clean any torn wave dirs (data without manifest) before re-processing.
    manifests = {
        os.path.basename(p)[: -len(".json")]
        for p in glob.glob(os.path.join(_manifest_dir(out_root), "wave-*.json"))
    }
    for d in glob.glob(os.path.join(out_root, "data", "wave-*")):
        name = os.path.basename(d)
        if name.endswith(".tmp") or name not in manifests:
            shutil.rmtree(d, ignore_errors=True)

    existing_waves = len(manifests)
    summary = {
        "input_files_total": len(files),
        "input_files_skipped": len(files) - len(todo),
        "waves_run": 0,
        "rows_written": 0,
    }

    wave_idx = existing_waves
    for start in range(0, len(todo), wave_files):
        if max_waves is not None and summary["waves_run"] >= max_waves:
            break
        chunk = todo[start : start + wave_files]
        wave_name = f"wave-{wave_idx:05d}"
        final_dir = os.path.join(out_root, "data", wave_name)
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)

        t0 = time.perf_counter()
        ds = build_extract_pipeline(read_pages(chunk), cfg)
        ds.write_parquet(tmp_dir)
        wall = time.perf_counter() - t0
        try:
            stage_stats = ds.stats()[:4000]  # per-stage wall/cpu breakdown
        except Exception:
            stage_stats = ""

        os.replace(tmp_dir, final_dir)  # atomic partition commit
        rows, nbytes, extra = _out_stats(final_dir)

        manifest = {
            "wave": wave_name,
            "input_files": chunk,
            "input_bytes": sum(os.path.getsize(f) for f in chunk),
            "row_count": rows,
            "output_bytes": nbytes,
            "wall_sec": round(wall, 3),
            "engine_version": __version__,
            "created_unix": int(time.time()),
            "stage_stats": stage_stats,
            **extra,
        }
        mpath = os.path.join(_manifest_dir(out_root), wave_name + ".json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(mpath + ".tmp", mpath)

        summary["waves_run"] += 1
        summary["rows_written"] += rows
        wave_idx += 1

    summary["complete"] = len(completed_input_files(out_root)) == len(files)
    return summary
