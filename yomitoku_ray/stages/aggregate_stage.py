"""Aggregate + render stage: detections -> final output columns.

Stateless ``map_batches`` task (pure deterministic geometry/graph work, no
model state to amortize): word->cell/paragraph containment joins, ruby
filtering, figure nesting, header/footer split and reading-order DFS
(document_analyzer.py:487-601 semantics via ``analyze.aggregate_document``),
then the exporters (markdown/json/csv/html + extracted text/spans).
"""

from __future__ import annotations

import pyarrow as pa

from ..analyze import aggregate_document
from ..oracle import doc_stem_for_url
from ..render import render_document
from ..schemas import RESULT_SCHEMA
from .convert import row_to_detections


def aggregate_render_batch(
    batch: pa.Table,
    reading_order: str = "auto",
    ignore_meta: bool = False,
    ignore_ruby: bool = False,
    ruby_threshold: float = 2.0,
) -> pa.Table:
    n = batch.num_rows
    urls = batch.column("url").to_pylist()
    errors = batch.column("error").to_pylist()
    det_rows = {
        name: batch.column(name).to_pylist()
        for name in ("words", "paragraphs", "tables", "figures")
    }

    out = {
        "extracted_text": [],
        "markdown": [],
        "html": [],
        "csv": [],
        "doc_json": [],
        "spans": [],
        "n_words": [],
        "n_paragraphs": [],
        "n_tables": [],
        "n_figures": [],
    }

    for i in range(n):
        if errors[i] is not None:
            for key in ("extracted_text", "markdown", "html", "csv", "doc_json"):
                out[key].append("")
            out["spans"].append([])
            for key in ("n_words", "n_paragraphs", "n_tables", "n_figures"):
                out[key].append(0)
            continue

        det = row_to_detections(
            {name: det_rows[name][i] for name in det_rows}
        )
        document = aggregate_document(
            det.words,
            det.paragraphs,
            det.tables,
            det.figures,
            reading_order=reading_order,
            ignore_meta=ignore_meta,
            ignore_ruby=ignore_ruby,
            ruby_threshold=ruby_threshold,
        )
        rendered = render_document(document, doc_stem=doc_stem_for_url(urls[i]))
        out["extracted_text"].append(rendered["extracted_text"])
        out["markdown"].append(rendered["markdown"])
        out["html"].append(rendered["html"])
        out["csv"].append(rendered["csv"])
        out["doc_json"].append(rendered["doc_json"])
        out["spans"].append(rendered["spans"])
        out["n_words"].append(len(document.words))
        out["n_paragraphs"].append(len(document.paragraphs))
        out["n_tables"].append(len(document.tables))
        out["n_figures"].append(len(document.figures))

    cols = {
        "url": batch.column("url"),
        "warc_ts": batch.column("warc_ts"),
        "lang": batch.column("lang"),
        "error": batch.column("error"),
        "n_boilerplate": batch.column("n_boilerplate"),
        "truncated": batch.column("truncated"),
    }
    for f in RESULT_SCHEMA:
        if f.name in cols:
            continue
        cols[f.name] = pa.array(out[f.name], f.type)
    return pa.Table.from_arrays(
        [cols[f.name] for f in RESULT_SCHEMA], schema=RESULT_SCHEMA
    )
