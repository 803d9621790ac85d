"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with struct metadata. Pixel
decode, resize and feature extraction are REAL for every shipped codec
(PNG/GIF/JPEG incl. progressive+arithmetic/BMP/TIFF/WebP incl. lossy
VP8/netpbm — pure zlib+numpy, ``kernels/``); ``DecoderBackend`` keeps a
seam only for formats beyond them — NotImplementedError (strict mode) or
a deterministic fake (fake mode). The Ray-side plumbing is real and
tested: schema, actor-pool stage shape, small batch sizes for large
payloads, metadata extraction without full decode.

Reference anchor: the engine's image path (figure crops,
``/root/reference/src/yomitoku/export/export_markdown.py:70-111``) emits
binary blobs as columns instead of side files (SURVEY S9), and these stages
are the continuation of that column into decode / resize / feature-extract
operators a training-data pipeline needs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

from ..kernels.png import (
    PngError,
    block_mean_embedding,
    decode_png,
    encode_png,
    resize_nearest,
    to_gray,
)

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
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                break
            i += 2 + seg_len
    elif blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        fmt = "gif"
        w, h = struct.unpack("<HH", blob[6:10])
    elif blob[:2] == b"BM" and len(blob) >= 26:
        fmt = "bmp"
        w, hs = struct.unpack("<ii", blob[18:26])
        h = abs(hs)
    elif blob[:4] in (b"II*\x00", b"MM\x00*"):
        fmt = "tiff"
        try:
            from ..kernels.tiff import _H, _W, _read_ifd

            bo = "<" if blob[:2] == b"II" else ">"
            tags, _ = _read_ifd(blob, struct.unpack(bo + "I", blob[4:8])[0], bo)
            w = tags.get(_W, [-1])[0]
            h = tags.get(_H, [-1])[0]
        except Exception:
            w = h = -1
    elif blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        fmt = "webp"
        try:
            from ..kernels.webp import sniff_webp_dims

            w, h = sniff_webp_dims(blob)
        except Exception:
            w = h = -1
    elif blob[:1] == b"P" and blob[1:2] in b"123456":
        fmt = "pnm"
        try:
            from ..kernels.netpbm import _tokens

            (w, h), _ = _tokens(blob, 2, 2)
        except Exception:
            w = h = -1
    return {
        "format": fmt,
        "width": int(w),
        "height": int(h),
        "n_bytes": len(blob),
        "sha256": hashlib.sha256(blob).hexdigest(),
    }


class DecoderBackend:
    """Pixel-decode: REAL for PNG/GIF/JPEG/BMP/TIFF/WebP —
    baseline, progressive SOF2 (incl. successive approximation) AND
    arithmetic-coded SOF9/SOF10 JPEG, full VP8L plus intra-frame lossy VP8
    (pure zlib+numpy codecs in kernels/; see kernels/vp8_tables.py and
    kernels/jpeg_arith.py for the foreign-bitstream table caveats); a
    seam only for formats beyond them — NotImplementedError in strict
    mode, deterministic fake pixels in fake mode."""

    def __init__(self, mode: str = "strict"):
        if mode not in ("strict", "fake"):
            raise ValueError(mode)
        self.mode = mode

    def decode_image(self, blob: bytes) -> np.ndarray:
        """blob -> (H, W, C) uint8 pixels (PNG, GIF, baseline or
        progressive JPEG)."""
        try:
            return decode_png(blob)
        except PngError:
            pass
        from ..kernels.gif import GifError, decode_gif

        try:
            return decode_gif(blob)
        except GifError:
            pass
        from ..kernels.jpeg import JpegError, decode_jpeg

        try:
            px = decode_jpeg(blob)
            return px[:, :, None] if px.ndim == 2 else px
        except JpegError:
            pass
        from ..kernels.bmp import BmpError, decode_bmp

        try:
            return decode_bmp(blob)
        except BmpError:
            pass
        from ..kernels.tiff import TiffError, decode_tiff

        try:
            return decode_tiff(blob)[0]  # first page (load_pdf-style paging
            # is the paged source's job; features use page 0)
        except TiffError:
            pass
        from ..kernels.webp import WebpError, decode_webp

        try:
            return decode_webp(blob)
        except WebpError:
            pass
        from ..kernels.netpbm import NetpbmError, decode_netpbm

        try:
            px = decode_netpbm(blob)
            return px[:, :, None] if px.ndim == 2 else px
        except NetpbmError:
            pass
        if self.mode == "strict":
            raise NotImplementedError(
                "image decode beyond PNG/GIF/JPEG/BMP/TIFF/WebP "
                "requires a codec library not present in this container; "
                "run with DecoderBackend(mode='fake') for the "
                "deterministic stand-in"
            )
        # Deterministic fake pixels from a stable digest of the bytes —
        # stands in for a real decode so downstream feature plumbing
        # (ANN, dedup on embeddings) is exercisable for any format.
        h = hashlib.blake2b(blob, digest_size=48).digest()
        px = np.frombuffer(h, dtype=np.uint8)[: 4 * 4 * 3].reshape(4, 4, 3)
        return px.copy()

    def image_features(self, blob: bytes) -> dict:
        """Pixels -> real features: Rec.601 mean luma + 4x4 block-mean
        gray signature (16-dim, [-1, 1])."""
        px = self.decode_image(blob)
        return {
            "embedding": block_mean_embedding(px, grid=4).tolist(),
            "mean_luma": float(to_gray(px).mean()),
        }


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
    """Actor stage: binary image column -> feature struct.

    PNG payloads get REAL pixel features (decode + luma + block-mean
    signature); other formats follow the backend mode — deterministic fake
    pixels ('fake') or a raise at first batch ('strict', the correct
    behavior when a real decoder is required but absent).
    """

    def __init__(self, blob_column: str = "image", backend_mode: str = "fake"):
        self.blob_column = blob_column
        self.backend = DecoderBackend(backend_mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.backend.image_features(blob or b"")
            for blob in batch.column(self.blob_column).to_pylist()
        ]
        return batch.append_column("image_features", pa.array(feats, IMAGE_FEATURES))


class ImageResizeStage:
    """Actor stage: real resize (decode -> nearest-neighbor -> PNG
    re-encode) for every decodable format (PNG/GIF/JPEG/BMP/TIFF/WebP
    via :class:`DecoderBackend`); the normalized output is always PNG.

    Undecodable payloads pass through unchanged with ``resized=False`` —
    resize without a decoder would be a lie. Small batches: payloads are
    re-encoded in-stage and both copies briefly coexist.
    """

    def __init__(self, out_w: int, out_h: int, blob_column: str = "image"):
        self.out_w = out_w
        self.out_h = out_h
        self.blob_column = blob_column
        self.backend = DecoderBackend(mode="strict")

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_blobs, flags = [], []
        for blob in batch.column(self.blob_column).to_pylist():
            try:
                px = self.backend.decode_image(blob or b"")
            except (ValueError, NotImplementedError):
                out_blobs.append(blob)
                flags.append(False)
                continue
            if px.shape[2] == 4:
                px = px[:, :, :3]  # normalize to RGB before PNG re-encode
            elif px.shape[2] == 1:
                px = px.repeat(3, axis=2)
            out_blobs.append(encode_png(resize_nearest(px, self.out_w, self.out_h)))
            flags.append(True)
        idx = batch.schema.get_field_index(self.blob_column)
        batch = batch.set_column(idx, self.blob_column, pa.array(out_blobs, pa.binary()))
        return batch.append_column("resized", pa.array(flags, pa.bool_()))


AUDIO_FEATURES = pa.struct(
    [
        ("duration_ms", pa.int64()),
        ("sample_rate", pa.int64()),
        ("rms_milli", pa.int64()),
        ("zcr_per_sec_milli", pa.int64()),
        ("dominant_hz", pa.int64()),
        ("error", pa.string()),
    ]
)


class AudioFeatureStage:
    """Actor stage: binary WAV column -> REAL signal features.

    PCM decode + RMS/ZCR/rFFT-dominant-frequency run with stdlib wave +
    numpy — no audio library, no stub. Undecodable payloads get a per-row
    error field (the batch never fails). Integer (milli-scaled) outputs
    keep downstream hashing float-free.
    """

    def __init__(self, blob_column: str = "audio"):
        self.blob_column = blob_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.audio import AudioError, audio_features

        feats = []
        for blob in batch.column(self.blob_column).to_pylist():
            try:
                f = audio_features(blob or b"")
                f["error"] = None
            except AudioError as e:
                f = {
                    "duration_ms": 0,
                    "sample_rate": 0,
                    "rms_milli": 0,
                    "zcr_per_sec_milli": 0,
                    "dominant_hz": 0,
                    "error": str(e),
                }
            feats.append(f)
        return batch.append_column("audio_features", pa.array(feats, AUDIO_FEATURES))


class FrameSampleStage:
    """Flat-map actor stage: container column -> sampled frame rows.

    The video-decode analogue over this repo's binary page containers (the
    sandbox ships no video codecs, so the container IS the multi-frame
    stand-in; the stage shape — one row in, ``n_frames`` uniformly-sampled
    frame rows out, per-row error isolation — is the real Ray-side contract
    a video pipeline needs). Frames index uniformly across the container:
    positions floor(i * (N-1) / (n_frames-1)) for i in 0..n_frames-1,
    deduplicated for short containers.
    """

    def __init__(self, n_frames: int = 4, blob_column: str = "doc_bytes", key_column: str = "doc_url"):
        self.n_frames = n_frames
        self.blob_column = blob_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.paged import decode_paged_doc

        keys, idxs, totals, frames, errs = [], [], [], [], []
        for key, blob in zip(
            batch.column(self.key_column).to_pylist(),
            batch.column(self.blob_column).to_pylist(),
        ):
            try:
                pages = decode_paged_doc(blob or b"")
            except ValueError as e:
                keys.append(key)
                idxs.append(-1)
                totals.append(0)
                frames.append(b"")
                errs.append(str(e))
                continue
            if not pages:
                continue
            n = min(self.n_frames, len(pages))
            if n == 1:
                positions = [0]
            else:
                positions = sorted(
                    {i * (len(pages) - 1) // (n - 1) for i in range(n)}
                )
            for p in positions:
                keys.append(key)
                idxs.append(p)
                totals.append(len(pages))
                frames.append(pages[p])
                errs.append(None)
        return pa.table(
            {
                self.key_column: pa.array(keys, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "n_total_frames": pa.array(totals, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
                "sample_error": pa.array(errs, pa.string()),
            }
        )


def make_fake_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid PNG header + deterministic junk payload (for tests)."""
    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    ihdr = b"IHDR" + ihdr_data
    chunk = struct.pack(">I", len(ihdr_data)) + ihdr + struct.pack(
        ">I", zlib.crc32(ihdr)
    )
    payload = hashlib.blake2b(str(seed).encode(), digest_size=32).digest()
    return b"\x89PNG\r\n\x1a\n" + chunk + payload


class VideoFrameFeatureStage:
    """Actor stage: MJPEG-AVI column -> uniformly sampled decoded-frame
    feature rows (vid_id, frame_idx, n_frames, fps, mean_luma_milli).

    Real video plumbing end-to-end: the AVI index walk finds frame chunks
    WITHOUT decoding, only the <= n_sample sampled frames pay a JPEG
    decode — per-video cost is O(bytes scanned + k decodes), independent
    of total frame count. Malformed containers/frames become error rows,
    never failed blocks.
    """

    def __init__(self, n_sample: int = 3, blob_column: str = "video"):
        self.n_sample = n_sample
        self.blob_column = blob_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.avi import AviError, decode_avi_frame, index_avi

        vids, idxs, totals, fpss, lumas, errs = [], [], [], [], [], []

        def emit(vid, idx, total, fps, luma, err):
            vids.append(vid)
            idxs.append(idx)
            totals.append(total)
            fpss.append(fps)
            lumas.append(luma)
            errs.append(err)

        for vid, blob in zip(
            batch.column("vid_id").to_pylist(),
            batch.column(self.blob_column).to_pylist(),
        ):
            try:
                meta = index_avi(blob or b"")
            except AviError as e:
                emit(vid, -1, 0, -1, -1, str(e))
                continue
            n = meta["n_frames"]
            k = min(self.n_sample, n)
            if k == 1:
                positions = [0]
            else:
                positions = sorted({i * (n - 1) // (k - 1) for i in range(k)})
            for p in positions:
                try:
                    px = decode_avi_frame(blob, meta["frames"][p])
                except AviError as e:
                    emit(vid, p, n, meta["fps"], -1, str(e))
                    continue
                if px.ndim == 2:
                    px = px[:, :, None]
                luma_milli = int(round(1000 * float(to_gray(px).mean())))
                emit(vid, p, n, meta["fps"], luma_milli, None)
        return pa.table(
            {
                "vid_id": pa.array(vids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "n_frames": pa.array(totals, pa.int32()),
                "fps": pa.array(fpss, pa.int32()),
                "mean_luma_milli": pa.array(lumas, pa.int64()),
                "error": pa.array(errs, pa.string()),
            }
        )


class ImageDHashStage:
    """Actor stage: binary image column -> 64-bit difference hash (dHash)
    — the standard perceptual fingerprint for image near-dup detection in
    web-scale multimodal corpora (LAION-style dedup).

    Fully integer-deterministic: decode (any repo codec) -> nearest
    resize to 9x8 -> integer Rec.601 luma (299R+587G+114B, no division)
    -> 64 horizontal-gradient bits via strict ``>``. Identical pixel
    content hashes identically regardless of (lossless) container
    format. Undecodable rows get dhash 0 + a per-row error (the batch
    never fails).
    """

    def __init__(self, blob_column: str = "image"):
        self.blob_column = blob_column
        self.backend = DecoderBackend(mode="strict")

    @staticmethod
    def dhash_of_pixels(px: np.ndarray) -> int:
        from ..kernels.png import resize_nearest

        if px.ndim == 2:
            px = px[:, :, None]
        if px.shape[2] == 4:
            px = px[:, :, :3]
        small = resize_nearest(px, 9, 8).astype(np.int64)
        c = small.shape[2]
        if c >= 3:
            luma = 299 * small[:, :, 0] + 587 * small[:, :, 1] + 114 * small[:, :, 2]
        else:
            luma = 1000 * small[:, :, 0]
        bits = (luma[:, 1:] > luma[:, :-1]).ravel()  # 8 rows x 8 diffs
        h = 0
        for b in bits:
            h = (h << 1) | int(b)
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, errs = [], []
        for blob in batch.column(self.blob_column).to_pylist():
            try:
                px = self.backend.decode_image(blob or b"")
                hashes.append(self.dhash_of_pixels(px))
                errs.append(None)
            except (ValueError, NotImplementedError) as e:
                hashes.append(0)
                errs.append(str(e) or type(e).__name__)
        # bit-preserving signed storage (the simhash convention)
        arr = np.array(hashes, dtype=np.uint64).view(np.int64)
        return batch.append_column(
            "dhash", pa.array(arr, pa.int64())
        ).append_column("dhash_error", pa.array(errs, pa.string()))


class AudioFingerprintStage:
    """Actor stage: WAV column -> 64-bit spectral fingerprint — the audio
    counterpart of :class:`ImageDHashStage` (constellation-style audio
    near-dup detection, Shazam-family reduced to its deterministic core).

    The clip splits into 16 equal frames; each frame contributes a 4-bit
    log2 bucket of its dominant rFFT frequency (DC excluded, silent
    frames -> 0). Amplitude-INVARIANT by construction (argmax of the
    spectrum is unchanged under volume scaling) and robust to small added
    noise (each frame's dominant bin must flip to change its nibble).
    Undecodable rows get fingerprint 0 + a per-row error.
    """

    N_FRAMES = 16

    def __init__(self, blob_column: str = "audio"):
        self.blob_column = blob_column

    @staticmethod
    def fingerprint_of(samples: np.ndarray, rate: int) -> int:
        n = len(samples)
        if n < AudioFingerprintStage.N_FRAMES:
            return 0
        fp = 0
        flen = n // AudioFingerprintStage.N_FRAMES
        for f in range(AudioFingerprintStage.N_FRAMES):
            fr = samples[f * flen : (f + 1) * flen]
            spec = np.abs(np.fft.rfft(fr))
            nib = 0
            if len(spec) > 1:
                k = 1 + int(np.argmax(spec[1:]))
                if spec[k] > 1e-9:  # silent frame -> 0
                    hz = k * rate / flen
                    # 4-bit log2 bucket: ~32 Hz..16 kHz usable range
                    nib = int(np.clip(int(np.log2(max(hz, 1.0))) - 4, 0, 15))
            fp = (fp << 4) | nib
        return fp

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.audio import AudioError, decode_wav

        fps, errs = [], []
        for blob in batch.column(self.blob_column).to_pylist():
            try:
                x, rate = decode_wav(blob or b"")
                fps.append(self.fingerprint_of(x, rate))
                errs.append(None)
            except AudioError as e:
                fps.append(0)
                errs.append(str(e))
        arr = np.array(fps, dtype=np.uint64).view(np.int64)
        return batch.append_column(
            "audio_fp", pa.array(arr, pa.int64())
        ).append_column("fp_error", pa.array(errs, pa.string()))
