"""Deterministic synthetic MJPEG-AVI videos table.

Every row is a pure function of its index: short clips of solid or
per-frame-stepped-gray frames encoded with the repo's own AVI+JPEG codecs
(flat frames decode EXACTLY, so per-frame luma has analytic ground truth),
plus ~4% undecodable junk rows exercising the per-row error policy.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..kernels.avi import encode_mjpeg_avi

VIDEOS_SCHEMA = pa.schema(
    [
        ("vid_id", pa.int64()),
        ("video", pa.binary()),
        ("kind", pa.string()),
    ]
)


def expected_frame_gray(i: int, frame_idx: int) -> int:
    """Analytic ground truth for the stepped-gray clips (kind='steps')."""
    return (31 * i + 40 * frame_idx) % 256


def gen_video(i: int) -> dict:
    rng = np.random.RandomState(0x51DE0 ^ i)
    if i % 25 == 24:
        return {
            "vid_id": i,
            "video": bytes(rng.randint(0, 256, 96, dtype=np.uint8)),
            "kind": "junk",
        }
    h, w = int(rng.randint(8, 24)), int(rng.randint(8, 24))
    n_frames = int(rng.randint(2, 9))
    if i % 2 == 0:
        frames = [
            np.full((h, w), expected_frame_gray(i, f), dtype=np.uint8)
            for f in range(n_frames)
        ]
        kind = "steps"
    else:
        color = rng.randint(0, 256, 3, dtype=np.uint8)
        frames = [
            np.full((h, w, 3), color[None, None, :], dtype=np.uint8)
            for _ in range(n_frames)
        ]
        kind = "solid"
    return {
        "vid_id": i,
        "video": encode_mjpeg_avi(frames, fps=5 + (i % 3), quality=95),
        "kind": kind,
    }


def ensure_videos_parquet(sf_dir: str, cache_root: str = "/tmp/yomitoku_ray_videos") -> str:
    import pyarrow.parquet as pq

    from .pages import rows_for_sf_dir

    n = max(120, rows_for_sf_dir(sf_dir) // 40)
    out_dir = os.path.join(cache_root, f"n{n}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    t = pa.Table.from_pylist([gen_video(i) for i in range(n)], schema=VIDEOS_SCHEMA)
    pq.write_table(t, os.path.join(tmp, "part-00000.parquet"))
    import shutil

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    with open(done, "w") as f:
        f.write(str(n))
    return out_dir
