"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata; the
decode/feature kernels themselves are STUBBED (the codec libraries are not
in this container) behind ``DecoderBackend`` — either raising
NotImplementedError (strict mode) or producing a deterministic fake (test
mode). The Ray-side plumbing is real and tested: schema, actor-pool stage
shape, small batch sizes for large payloads, metadata extraction without
full decode.

Reference anchor: the engine's image path (figure crops,
``/root/reference/src/yomitoku/export/export_markdown.py:70-111``) emits
binary blobs as columns instead of side files (SURVEY S9), and these stages
are the continuation of that column into decode / resize / feature-extract /
frame-sample operators a training-data pipeline needs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pyarrow as pa

IMAGE_META = pa.struct(
    [
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("sha256", pa.string()),
    ]
)

IMAGE_FEATURES = pa.struct(
    [
        ("embedding", pa.list_(pa.float32(), 16)),
        ("mean_luma", pa.float32()),
    ]
)


def sniff_image_meta(blob: bytes) -> dict:
    """Header-only metadata sniff (PNG/JPEG/GIF dimensions) — no decode.

    Real parsing of container headers is cheap and dependency-free; this is
    NOT stubbed. Unknown formats report format='unknown', -1 dims.
    """
    fmt, w, h = "unknown", -1, -1
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 24:
        fmt = "png"
        w, h = struct.unpack(">II", blob[16:24])
    elif blob[:3] == b"\xff\xd8\xff":
        fmt = "jpeg"
        i = 2
        while i + 9 < len(blob):
            if blob[i] != 0xFF:
                break
            marker = blob[i + 1]
            seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                break
            i += 2 + seg_len
    elif blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        fmt = "gif"
        w, h = struct.unpack("<HH", blob[6:10])
    return {
        "format": fmt,
        "width": int(w),
        "height": int(h),
        "n_bytes": len(blob),
        "sha256": hashlib.sha256(blob).hexdigest(),
    }


class DecoderBackend:
    """Pixel-decode seam. The real backend would wrap PIL/cv2/ffmpeg."""

    def __init__(self, mode: str = "strict"):
        if mode not in ("strict", "fake"):
            raise ValueError(mode)
        self.mode = mode

    def decode_image(self, blob: bytes):
        if self.mode == "strict":
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "container; run with DecoderBackend(mode='fake') for the "
                "deterministic stand-in"
            )
        # Deterministic fake: a 16-dim 'embedding' + luma derived from a
        # stable digest of the bytes — stands in for model features so the
        # downstream plumbing (ANN, dedup on embeddings) is exercisable.
        h = hashlib.blake2b(blob, digest_size=36).digest()
        emb = [(b - 128) / 128.0 for b in h[:16]]
        luma = (zlib.crc32(blob) % 256) / 255.0
        return {"embedding": emb, "mean_luma": luma}


class ImageMetaStage:
    """Actor stage: binary image column -> typed metadata struct.

    Header sniffing only — cheap enough for full-corpus sweeps. Use small
    ``batch_size`` (<=16) when payloads are multi-MB so a batch x pool fits
    worker heaps.
    """

    def __init__(self, blob_column: str = "image"):
        self.blob_column = blob_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [
            sniff_image_meta(blob or b"")
            for blob in batch.column(self.blob_column).to_pylist()
        ]
        return batch.append_column("image_meta", pa.array(metas, IMAGE_META))


class ImageFeatureStage:
    """Actor stage: binary image column -> feature struct (decode STUB).

    ``backend_mode='fake'`` yields deterministic features; 'strict' raises at
    first batch — the correct behavior when a real decoder is required but
    absent.
    """

    def __init__(self, blob_column: str = "image", backend_mode: str = "fake"):
        self.blob_column = blob_column
        self.backend = DecoderBackend(backend_mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.backend.decode_image(blob or b"")
            for blob in batch.column(self.blob_column).to_pylist()
        ]
        return batch.append_column("image_features", pa.array(feats, IMAGE_FEATURES))


def make_fake_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid PNG header + deterministic junk payload (for tests)."""
    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    ihdr = b"IHDR" + ihdr_data
    chunk = struct.pack(">I", len(ihdr_data)) + ihdr + struct.pack(
        ">I", zlib.crc32(ihdr)
    )
    payload = hashlib.blake2b(str(seed).encode(), digest_size=32).digest()
    return b"\x89PNG\r\n\x1a\n" + chunk + payload
