"""Detection stage: html bytes -> words/layout/table detections.

The actor-pool analogue of the reference's four model modules: the reference
fuses detector/recognizer/layout/TSR per page inside DocumentAnalyzer.run
(``/root/reference/src/yomitoku/document_analyzer.py:603-634``); here the
fused per-row work runs inside one stateful ``map_batches`` stage. Actor
state (``__init__``, once per worker — the analogue of loading 8 GB of model
weights, ``base.py:80-86``) holds the boilerplate classifier thresholds, the
layout engine and compiled token/charset tables.

Arrow in / Arrow out (``batch_format="pyarrow"``): the html binary column is
consumed here and **dropped** — multi-MB blobs must not ride through later
stages or shuffles (wide-record skew control).
"""

from __future__ import annotations

import pyarrow as pa

from ..detect import BoilerplateClassifier, PageLayoutEngine
from ..dom import DecodeError, decode_html
from ..schemas import DETECTIONS_SCHEMA
from .convert import detections_to_row, empty_detections_row


class DetectStage:
    """Callable class for ``ds.map_batches(DetectStage, concurrency=N)``."""

    def __init__(self, classifier_config: dict | None = None):
        self.classifier = BoilerplateClassifier(**(classifier_config or {}))
        self.engine = PageLayoutEngine(self.classifier)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        ts = batch.column("warc_ts")
        langs = batch.column("lang")

        rows = []
        errors = []
        n_bytes = []
        for raw in htmls:
            raw = raw or b""
            n_bytes.append(len(raw))
            try:
                text = decode_html(raw)
                det = self.engine.detect(text)
                rows.append(detections_to_row(det))
                errors.append(None)
            except DecodeError as e:
                # Per-row error policy (cli/main.py:548-549 at row granularity):
                # a malformed page yields an error row, never a failed block.
                rows.append(empty_detections_row())
                errors.append(str(e))
            except Exception as e:  # pragma: no cover
                rows.append(empty_detections_row())
                errors.append(f"{type(e).__name__}: {e}")

        cols = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "lang": langs,
            "n_html_bytes": pa.array(n_bytes, pa.int64()),
            "error": pa.array(errors, pa.string()),
            "n_boilerplate": pa.array(
                [r["n_boilerplate"] for r in rows], pa.int32()
            ),
            "truncated": pa.array([r["truncated"] for r in rows], pa.bool_()),
        }
        for name in ("words", "paragraphs", "tables", "figures"):
            cols[name] = pa.array(
                [r[name] for r in rows], DETECTIONS_SCHEMA.field(name).type
            )
        return pa.Table.from_arrays(
            [cols[f.name] for f in DETECTIONS_SCHEMA],
            schema=DETECTIONS_SCHEMA,
        )
