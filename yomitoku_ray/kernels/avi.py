"""Minimal MJPEG-in-AVI container codec (pure struct + the repo JPEG codec).

Gives the multimodal video family a REAL format: RIFF 'AVI ' with one
'vids'/'MJPG' stream, each frame a '00dc' chunk holding a baseline JPEG
(kernels/jpeg.py decodes it). The writer exists to synthesize deterministic
test/bench corpora with analytic per-frame ground truth; the reader is the
product path for frame sampling / feature extraction.

Scale-relevant property: :func:`index_avi` walks the chunk table WITHOUT
decoding — frame sampling decodes only the sampled frames, so per-video
cost is O(container bytes scanned + k decodes), not O(total frames).
Malformed containers raise ``AviError`` (per-row error policy upstream).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import JpegError, decode_jpeg, encode_jpeg


class AviError(ValueError):
    pass


def encode_mjpeg_avi(frames, fps: int = 10, quality: int = 90) -> bytes:
    """List of (H, W, 3)/(H, W) uint8 frames -> AVI bytes (MJPG stream)."""
    if not frames:
        raise AviError("no frames")
    h, w = frames[0].shape[:2]
    blobs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    max_bytes = max(len(b) for b in blobs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,
        0x10,  # AVIF_HASINDEX... not strictly true; harmless
        len(blobs),
        0,
        1,  # one stream
        max_bytes,
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(blobs), max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", b) for b in blobs))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk_chunks(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise AviError("chunk overruns container")
        yield fourcc, body_start, body_end
        pos = body_end + (size & 1)  # word alignment


def index_avi(blob: bytes) -> dict:
    """Parse structure only: header fields + (start, end) of every video
    frame chunk. No JPEG decode happens here."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise AviError("not an AVI")
    riff_size = struct.unpack("<I", blob[4:8])[0]
    end = min(len(blob), 8 + riff_size)

    meta = {"width": -1, "height": -1, "fps": -1, "n_frames_declared": -1}
    frames: list[tuple[int, int]] = []

    def walk_list(start: int, stop: int):
        for fourcc, b0, b1 in _walk_chunks(blob, start, stop):
            if fourcc == b"LIST":
                kind = blob[b0 : b0 + 4]
                if kind in (b"hdrl", b"movi", b"strl"):
                    walk_list(b0 + 4, b1)
            elif fourcc == b"avih" and b1 - b0 >= 56:
                vals = struct.unpack("<14I", blob[b0 : b0 + 56])
                meta["n_frames_declared"] = vals[4]
                meta["width"], meta["height"] = vals[8], vals[9]
                if vals[0]:
                    meta["fps"] = round(1_000_000 / vals[0])
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append((b0, b1))

    walk_list(12, end)
    if not frames:
        raise AviError("no video frames")
    meta["n_frames"] = len(frames)
    meta["frames"] = frames
    return meta


def decode_avi_frame(blob: bytes, span: tuple[int, int]) -> np.ndarray:
    """Decode one indexed frame chunk to pixels."""
    try:
        return decode_jpeg(blob[span[0] : span[1]])
    except JpegError as e:
        raise AviError(f"frame decode failed: {e}") from e


def decode_mjpeg_avi(blob: bytes) -> list[np.ndarray]:
    """Decode every frame (test/convenience path; pipelines sample instead)."""
    idx = index_avi(blob)
    return [decode_avi_frame(blob, span) for span in idx["frames"]]
