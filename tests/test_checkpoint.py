"""Checkpoint/resume sink tests: kill-and-resume must not lose or duplicate rows."""

import glob
import json
import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.pipelines.extract import ExtractConfig
from yomitoku_ray.state.checkpoint import completed_input_files, run_resumable
from yomitoku_ray.synth.pages import generate_pages_table

N = 120
FILES = 6


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_pages")
    per = N // FILES
    for i in range(FILES):
        pq.write_table(
            generate_pages_table(per, start=i * per), str(d / f"part-{i:05d}.parquet")
        )
    return str(d)


def _cfg():
    return ExtractConfig(detect_concurrency=2, detect_batch_size=16)


def test_interrupted_run_resumes(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out")

    # First invocation: only one wave (simulated kill after first commit).
    s1 = run_resumable(pages_dir, out, _cfg(), wave_files=2, max_waves=1)
    assert s1["waves_run"] == 1 and not s1["complete"]
    assert len(completed_input_files(out)) == 2

    # Resume: must skip the committed files and finish the rest.
    s2 = run_resumable(pages_dir, out, _cfg(), wave_files=2)
    assert s2["input_files_skipped"] == 2
    assert s2["complete"]

    # All rows present exactly once.
    t = pads.dataset(os.path.join(out, "data")).to_table(columns=["url"])
    urls = t.column("url").to_pylist()
    assert len(urls) == N
    assert len(set(urls)) == N

    # Manifests carry lineage + metrics.
    manifests = sorted(glob.glob(os.path.join(out, "manifest", "*.json")))
    assert len(manifests) == 3
    m = json.load(open(manifests[0]))
    for key in ("input_files", "row_count", "output_bytes", "wall_sec", "engine_version"):
        assert key in m
    assert m["row_count"] == 40


def test_torn_wave_is_recomputed(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out2")
    run_resumable(pages_dir, out, _cfg(), wave_files=3, max_waves=1)
    # Simulate a torn commit: data dir exists, manifest missing.
    waves = glob.glob(os.path.join(out, "data", "wave-*"))
    os.remove(glob.glob(os.path.join(out, "manifest", "*.json"))[0])
    s = run_resumable(pages_dir, out, _cfg(), wave_files=3)
    assert s["complete"]
    t = pads.dataset(os.path.join(out, "data")).to_table(columns=["url"])
    assert len(set(t.column("url").to_pylist())) == N


def test_rerun_is_noop(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out3")
    run_resumable(pages_dir, out, _cfg(), wave_files=6)
    s = run_resumable(pages_dir, out, _cfg(), wave_files=6)
    assert s["waves_run"] == 0 and s["complete"]
