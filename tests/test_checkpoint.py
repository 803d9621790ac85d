"""Checkpoint/resume sink tests: kill-and-resume must not lose or duplicate rows."""

import glob
import json
import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.pipelines.extract import ExtractConfig
from yomitoku_ray.export.wet import _ts_us_of
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


def test_live_claim_blocks_other_driver(ray_session, pages_dir, tmp_path):
    """A second driver must SKIP chunks under a live claim (another driver's
    in-flight wave) and take the remaining work instead."""
    import time as _time

    from yomitoku_ray.state.checkpoint import _claims_dir, _wave_name

    out = str(tmp_path / "out3")
    os.makedirs(_claims_dir(out), exist_ok=True)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    first_chunk = files[:2]
    wave = _wave_name(first_chunk)
    with open(os.path.join(_claims_dir(out), wave + ".claim"), "w") as f:
        json.dump(
            {"input_files": first_chunk, "pid": 0, "created_unix": int(_time.time())}, f
        )

    s = run_resumable(pages_dir, out, _cfg(), wave_files=2, claim_lease_sec=3600)
    # claimed chunk untouched; the other 4 files processed
    assert not s["complete"]
    done = completed_input_files(out)
    assert done == set(files[2:])
    t = pads.dataset(os.path.join(out, "data")).to_table(columns=["url"])
    assert len(t) == 80  # 4 files x 20 rows, no double-write


def test_stale_claim_is_reclaimed(ray_session, pages_dir, tmp_path):
    """A claim older than the lease is a dead driver: its chunk is retaken."""
    import time as _time

    from yomitoku_ray.state.checkpoint import _claims_dir, _wave_name

    out = str(tmp_path / "out4")
    os.makedirs(_claims_dir(out), exist_ok=True)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    wave = _wave_name(files[:2])
    path = os.path.join(_claims_dir(out), wave + ".claim")
    with open(path, "w") as f:
        json.dump({"input_files": files[:2], "pid": 0, "created_unix": 0}, f)
    os.utime(path, (0, 0))  # ancient claim

    s = run_resumable(pages_dir, out, _cfg(), wave_files=2, claim_lease_sec=60)
    assert s["complete"]
    t = pads.dataset(os.path.join(out, "data")).to_table(columns=["url"])
    urls = t.column("url").to_pylist()
    assert len(urls) == N and len(set(urls)) == N


def test_concurrent_drivers_exactly_once(pages_dir, tmp_path):
    """Two drivers racing the SAME checkpoint root concurrently: every input
    file lands in exactly one manifest, every row written exactly once.

    Drivers are separate PROCESSES with their own Ray sessions — the real
    concurrent-resume shape (two `ray job submit` runs sharing an output
    root); the claim protocol is filesystem-based so it must hold across
    processes.
    """
    import subprocess
    import sys

    out = str(tmp_path / "out5")
    script = """
import sys, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=3, include_dashboard=False, logging_level="ERROR")
from yomitoku_ray.pipelines.extract import ExtractConfig
from yomitoku_ray.state.checkpoint import run_resumable
s = run_resumable({pages!r}, {out!r}, ExtractConfig(detect_concurrency=1, detect_batch_size=16), wave_files=1)
print("SUMMARY:" + json.dumps(s))
ray.shutdown()
""".format(repo="/root/repo", pages=pages_dir, out=out)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for _ in range(2)
    ]
    summaries = []
    for p in procs:
        out_text, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out_text
        line = [ln for ln in out_text.splitlines() if ln.startswith("SUMMARY:")][0]
        summaries.append(json.loads(line[len("SUMMARY:"):]))

    # The driver that commits the FINAL wave always observes completion;
    # the other may exit earlier while that wave is still in flight (its
    # "incomplete" is honest: it must not claim work it didn't verify).
    assert any(s["complete"] for s in summaries)
    # no double processing: the two drivers' waves partition the input
    assert sum(s["waves_run"] for s in summaries) == FILES

    manifests = [json.load(open(p)) for p in glob.glob(os.path.join(out, "manifest", "*.json"))]
    covered = [f for m in manifests for f in m["input_files"]]
    assert sorted(covered) == sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    assert len(covered) == len(set(covered))  # each file in exactly one wave

    t = pads.dataset(os.path.join(out, "data")).to_table(columns=["url"])
    urls = t.column("url").to_pylist()
    assert len(urls) == N and len(set(urls)) == N  # zero lost, zero duplicated
    assert not glob.glob(os.path.join(out, "claims", "*.claim"))  # all released


def test_dead_pid_claim_is_reclaimed_immediately(ray_session, pages_dir, tmp_path):
    """A SIGKILLed driver's FRESH claim (dead pid, same host) must not block
    an immediate restart for the whole lease (ADVICE r3, medium)."""
    import socket
    import subprocess

    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "claims"), exist_ok=True)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    chunk = files[:2]
    from yomitoku_ray.state.checkpoint import _wave_name

    # A real, already-exited pid from this host.
    p = subprocess.Popen(["true"])
    p.wait()
    claim = os.path.join(out, "claims", _wave_name(chunk) + ".claim")
    with open(claim, "w") as f:
        json.dump({"input_files": chunk, "pid": p.pid,
                   "host": socket.gethostname(), "created_unix": 0}, f)

    s = run_resumable(pages_dir, out, _cfg(), wave_files=2)
    assert s["complete"]  # the killed wave was reclaimed and finished
    t = pads.dataset(os.path.join(out, "data")).to_table(columns=["url"])
    urls = t.column("url").to_pylist()
    assert len(urls) == N and len(set(urls)) == N


def test_torn_claim_does_not_busy_loop(ray_session, pages_dir, tmp_path):
    """A fresh claim with an unparseable body (crash between O_EXCL and the
    write) must not spin the run loop: the driver backs off on that wave,
    finishes everything else, and reports complete=False (ADVICE r3, low)."""
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "claims"), exist_ok=True)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    from yomitoku_ray.state.checkpoint import _wave_name

    claim = os.path.join(out, "claims", _wave_name(files[:2]) + ".claim")
    with open(claim, "w") as f:
        f.write("{torn")  # fresh mtime, unreadable body -> live per lease

    # max_waves bounds runaway; a busy loop would never advance waves_run.
    s = run_resumable(pages_dir, out, _cfg(), wave_files=2, max_waves=4)
    assert s["waves_run"] == 2  # the other two chunks committed
    assert not s["complete"]  # contested chunk honestly left for the owner
    done = completed_input_files(out)
    assert set(files[2:]) <= done and not (set(files[:2]) & done)


def _claim_worker(out, q):
    from yomitoku_ray.state.checkpoint import _try_claim

    q.put(_try_claim(out, "wave-deadbeef", ["x"], lease_sec=3600.0))


def test_stale_break_single_winner(tmp_path):
    """Racing drivers breaking the same stale claim: exactly one wins
    (rename-based break; the unlink break let both own it)."""
    import multiprocessing as mp

    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "claims"), exist_ok=True)
    claim = os.path.join(out, "claims", "wave-deadbeef.claim")
    with open(claim, "w") as f:
        json.dump({"input_files": ["x"], "pid": 1, "host": "elsewhere"}, f)
    os.utime(claim, (0, 0))  # long-expired lease -> stale for everyone

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_claim_worker, args=(out, q)) for _ in range(4)]
    for p in procs:
        p.start()
    results = [q.get(timeout=60) for _ in procs]
    for p in procs:
        p.join()
    assert sum(results) == 1  # exactly one driver owns the broken lock


def test_resumable_warc_shards(ray_session, tmp_path):
    """WARC shards are first-class checkpoint units: kill after one wave,
    resume skips committed shards, rows exactly-once, byte parity with the
    parquet path."""
    from yomitoku_ray.sources.warc import write_warc_file

    d = tmp_path / "warcs"
    d.mkdir()
    per = 20
    for i in range(4):
        t = generate_pages_table(per, start=i * per)
        rows = [
            {
                "url": r["url"],
                "warc_ts": _ts_us_of(r["warc_ts"]),
                "html": r["html"],
                "lang": r["lang"],
            }
            for r in t.to_pylist()
        ]
        write_warc_file(rows, str(d / f"shard-{i:05d}.warc.gz"))

    out = str(tmp_path / "out")
    s1 = run_resumable(str(d), out, _cfg(), wave_files=2, max_waves=1)
    assert s1["waves_run"] == 1 and not s1["complete"]
    assert len(completed_input_files(out)) == 2

    s2 = run_resumable(str(d), out, _cfg(), wave_files=2)
    assert s2["input_files_skipped"] == 2 and s2["complete"]

    t = pads.dataset(os.path.join(out, "data")).to_table(columns=["url", "extracted_text"])
    urls = t.column("url").to_pylist()
    assert len(urls) == 4 * per and len(set(urls)) == 4 * per

    # Byte parity with the straight parquet-input pipeline on the same pages.
    pq_dir = tmp_path / "pq"
    pq_dir.mkdir()
    pq.write_table(generate_pages_table(4 * per), str(pq_dir / "p.parquet"))
    out2 = str(tmp_path / "out2")
    run_resumable(str(pq_dir), out2, _cfg())
    t2 = pads.dataset(os.path.join(out2, "data")).to_table(
        columns=["url", "extracted_text"]
    )
    a = dict(zip(t.column("url").to_pylist(), t.column("extracted_text").to_pylist()))
    b = dict(zip(t2.column("url").to_pylist(), t2.column("extracted_text").to_pylist()))
    assert a == b


def test_mixed_parquet_and_warc_directory(ray_session, tmp_path):
    """A directory holding BOTH parquet and WARC inputs must route each
    file to its reader inside a wave (ADVICE r4: mixed chunks fell back to
    the parquet reader and failed on the .warc members)."""
    from yomitoku_ray.sources.warc import write_warc_file

    d = tmp_path / "mixed"
    d.mkdir()
    per = 20
    pq.write_table(generate_pages_table(per, start=0), str(d / "part-00000.parquet"))
    t = generate_pages_table(per, start=per)
    rows = [
        {
            "url": r["url"],
            "warc_ts": _ts_us_of(r["warc_ts"]),
            "html": r["html"],
            "lang": r["lang"],
        }
        for r in t.to_pylist()
    ]
    write_warc_file(rows, str(d / "shard-00000.warc.gz"))

    out = str(tmp_path / "out")
    # wave_files=2 forces ONE chunk holding both formats
    s = run_resumable(str(d), out, _cfg(), wave_files=2)
    assert s["complete"] and s["rows_written"] == 2 * per
    tbl = pads.dataset(os.path.join(out, "data")).to_table(columns=["url"])
    urls = tbl.column("url").to_pylist()
    assert len(urls) == 2 * per and len(set(urls)) == 2 * per
