"""Multi-page document source: one container row -> N page rows (S2).

Parity target: the reference's multi-page loaders lazily explode a container
file into per-page payloads with strict validation and per-document error
isolation — ``load_image``/``load_pdf``/``PdfPageIterator`` in
``/root/reference/src/yomitoku/data/functions.py:40-160`` (TIFF ``seek``
loop, PDF page iterator that renders one page at a time; invalid containers
raise ``ValueError``, exercised by ``tests/test_data.py:16-60``), and the
``--combine`` merge joins per-page outputs back with ``"\\n"``
(``cli/main.py:24-59``).

The web-text analogue is a deterministic binary page container (this repo's
stand-in for PDF bytes — the sandbox has no pdf/image decoders):

    b"YTRPAGED" | u8 version | u32 n_pages | n_pages * (u32 len) | payloads

The explode stage is flat-map shaped ``map_batches``: each input row yields
one row per page (``url#page=i``), a malformed container yields exactly one
error row (the document is isolated; the batch and its neighbors are not),
and ``max_pages`` caps runaway containers the way the reference's page
iterator bounds memory — pages past the cap are dropped and flagged.
"""

from __future__ import annotations

import random
import struct

import pyarrow as pa
import ray.data

MAGIC = b"YTRPAGED"
VERSION = 1

PAGED_SCHEMA = pa.schema(
    [
        ("doc_url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("doc_bytes", pa.binary()),
    ]
)

# Output schema = the extraction pipeline's input columns plus provenance.
EXPLODED_FIELDS = [
    ("url", pa.string()),
    ("doc_url", pa.string()),
    ("page_idx", pa.int32()),
    ("n_doc_pages", pa.int32()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("lang", pa.string()),
    ("explode_error", pa.string()),
]
EXPLODED_SCHEMA = pa.schema(EXPLODED_FIELDS)


def encode_paged_doc(pages: list[bytes]) -> bytes:
    out = [MAGIC, struct.pack("<BI", VERSION, len(pages))]
    for p in pages:
        out.append(struct.pack("<I", len(p)))
    out.extend(pages)
    return b"".join(out)


def decode_paged_doc(blob: bytes) -> list[bytes]:
    """Parse a page container; raises ValueError on any malformation
    (reference ``load_pdf``/``load_image`` contract: invalid container ->
    ValueError, data/functions.py:58-61,96-99)."""
    if not isinstance(blob, (bytes, bytearray)) or len(blob) < len(MAGIC) + 5:
        raise ValueError("Invalid paged-document data.")
    if bytes(blob[: len(MAGIC)]) != MAGIC:
        raise ValueError("Invalid paged-document data.")
    off = len(MAGIC)
    version, n_pages = struct.unpack_from("<BI", blob, off)
    off += 5
    if version != VERSION or n_pages > 1_000_000:
        raise ValueError("Invalid paged-document data.")
    lengths = []
    for _ in range(n_pages):
        if off + 4 > len(blob):
            raise ValueError("Invalid paged-document data.")
        (ln,) = struct.unpack_from("<I", blob, off)
        off += 4
        lengths.append(ln)
    pages = []
    for ln in lengths:
        if off + ln > len(blob):
            raise ValueError("Invalid paged-document data.")
        pages.append(bytes(blob[off : off + ln]))
        off += ln
    if off != len(blob):
        raise ValueError("Invalid paged-document data.")
    return pages


def explode_paged_docs(
    ds: ray.data.Dataset, max_pages: int = 500
) -> ray.data.Dataset:
    """One container row -> N page rows (lazy, flat-map-shaped map_batches).

    Emits ``url = doc_url + '#page=<i>'`` (1-based, the order key the merge
    side sorts on), page provenance columns, and per-document error
    isolation: a bad container becomes one row with ``explode_error`` set
    and empty html — downstream stages keep their per-row error policy.
    """

    def _explode(batch: pa.Table) -> pa.Table:
        cols = {name: [] for name, _ in EXPLODED_FIELDS}
        doc_urls = batch.column("doc_url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        blobs = batch.column("doc_bytes").to_pylist()
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.schema.names
            else [""] * len(doc_urls)
        )
        for doc_url, ts, blob, lang in zip(doc_urls, tss, blobs, langs):
            try:
                pages = decode_paged_doc(blob)
            except ValueError as e:
                cols["url"].append(f"{doc_url}#page=0")
                cols["doc_url"].append(doc_url)
                cols["page_idx"].append(0)
                cols["n_doc_pages"].append(0)
                cols["warc_ts"].append(ts)
                cols["html"].append(b"")
                cols["lang"].append(lang)
                cols["explode_error"].append(str(e))
                continue
            truncated = len(pages) > max_pages
            for i, page in enumerate(pages[:max_pages]):
                cols["url"].append(f"{doc_url}#page={i + 1}")
                cols["doc_url"].append(doc_url)
                cols["page_idx"].append(i + 1)
                cols["n_doc_pages"].append(len(pages))
                cols["warc_ts"].append(ts)
                cols["html"].append(page)
                cols["lang"].append(lang)
                cols["explode_error"].append(
                    "truncated: page cap" if truncated and i == max_pages - 1 else None
                )
        return pa.table(
            {name: pa.array(cols[name], typ) for name, typ in EXPLODED_FIELDS}
        )

    return ds.map_batches(_explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic synthetic paged-docs table (mirrors synth.pages)
# ---------------------------------------------------------------------------


def gen_paged_doc(i: int, seed: int = 42) -> dict:
    """Deterministic multi-page document for index ``i``.

    Pages reuse the single-page grammar (``synth.pages.gen_page``) at
    derived indices, so per-page extraction output is independently
    reproducible; ~2% of containers are malformed (truncated/garbage) to
    exercise the per-document error path.
    """
    from ..synth.pages import gen_page

    r = random.Random((seed << 21) ^ (i * 2654435761))
    n_pages = r.randint(1, 5)
    base_ts = 1_700_000_000_000_000 + i * 1_000_000
    doc_url = f"https://docs{i % 17:02d}.example.jp/doc/{seed}/{i:07d}"
    pages = [gen_page(i * 1000 + j, seed)["html"] for j in range(n_pages)]
    blob = encode_paged_doc(pages)
    roll = r.random()
    if roll < 0.01:
        blob = blob[: max(4, len(blob) // 3)]  # truncated container
    elif roll < 0.02:
        blob = b"\x00\x01garbage" + blob[8:]  # bad magic
    return {"doc_url": doc_url, "warc_ts": base_ts, "doc_bytes": blob}


def generate_paged_docs_table(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows = [gen_paged_doc(i, seed) for i in range(start, start + n)]
    return pa.Table.from_pylist(rows, schema=PAGED_SCHEMA)


def ensure_paged_docs_parquet(
    sf_dir: str, cache_root: str = "/tmp/yomitoku_ray_paged"
) -> str:
    """Generate (once, cached) the paged-docs parquet for a testdata sf dir.

    Sized at 1/10th the page count (docs average ~3 pages each).
    """
    import os

    import pyarrow.parquet as pq

    from ..synth.pages import SEED, rows_for_sf_dir

    n = max(100, rows_for_sf_dir(sf_dir) // 10)
    out_dir = os.path.join(cache_root, f"n{n}_seed{SEED}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    tmp_dir = out_dir + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    shard_rows = 1_000
    shards = [(s, min(shard_rows, n - s)) for s in range(0, n, shard_rows)]
    import ray

    if n > shard_rows and ray.is_initialized():

        @ray.remote
        def _write(shard_idx, start, count):
            t = generate_paged_docs_table(count, SEED, start)
            pq.write_table(t, os.path.join(tmp_dir, f"part-{shard_idx:05d}.parquet"))

        ray.get([_write.remote(idx, s, c) for idx, (s, c) in enumerate(shards)])
    else:
        for idx, (s, c) in enumerate(shards):
            pq.write_table(
                generate_paged_docs_table(c, SEED, s),
                os.path.join(tmp_dir, f"part-{idx:05d}.parquet"),
            )
    import shutil

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp_dir, out_dir)
    with open(done, "w") as f:
        f.write(str(n))
    return out_dir
