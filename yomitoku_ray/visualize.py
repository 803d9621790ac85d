"""Debug visualizers: numpy canvas + PNG out, no cv2/PIL.

Counterpart of the reference's ``utils/visualizer.py`` (cv2 overlays:
``layout_visualizer`` rects+labels :99-126, ``reading_order_visualizer``
arrows+order numbers :11-79, ``table_visualizer`` cell grid :128-153,
``det_visualizer`` word boxes :81-97, ``rec_visualizer`` :206+). Same
information drawn with pure-numpy primitives (rect strokes, sampled
anti-alias-free lines, arrowheads, a built-in 5x7 bitmap font) onto an
(H, W, 3) uint8 canvas, exported with the repo's own PNG encoder. All
inputs are the engine's own document dicts (``doc_json`` layout), so the
overlays work anywhere — driver, actor, or notebook — without an image
dependency.

Everything is deterministic: same document -> byte-identical PNG.
"""

from __future__ import annotations

import numpy as np

from .kernels.png import encode_png

# per-category stroke colors (RGB) — same role as the reference PALETTE
PALETTE = {
    "paragraph": (0, 128, 255),
    "table": (255, 0, 255),
    "figure": (0, 180, 0),
    "word": (90, 90, 90),
    "cell": (255, 128, 0),
    "order": (0, 200, 0),
    "arrow": (255, 0, 0),
}

# 5x7 bitmap font: digits + uppercase, each glyph 7 rows x 5 cols.
_GLYPHS = {
    "0": "01110 10001 10011 10101 11001 10001 01110",
    "1": "00100 01100 00100 00100 00100 00100 01110",
    "2": "01110 10001 00001 00010 00100 01000 11111",
    "3": "11110 00001 00001 01110 00001 00001 11110",
    "4": "00010 00110 01010 10010 11111 00010 00010",
    "5": "11111 10000 11110 00001 00001 10001 01110",
    "6": "00110 01000 10000 11110 10001 10001 01110",
    "7": "11111 00001 00010 00100 01000 01000 01000",
    "8": "01110 10001 10001 01110 10001 10001 01110",
    "9": "01110 10001 10001 01111 00001 00010 01100",
    "A": "01110 10001 10001 11111 10001 10001 10001",
    "B": "11110 10001 10001 11110 10001 10001 11110",
    "C": "01110 10001 10000 10000 10000 10001 01110",
    "D": "11110 10001 10001 10001 10001 10001 11110",
    "E": "11111 10000 10000 11110 10000 10000 11111",
    "F": "11111 10000 10000 11110 10000 10000 10000",
    "G": "01110 10001 10000 10111 10001 10001 01111",
    "H": "10001 10001 10001 11111 10001 10001 10001",
    "I": "01110 00100 00100 00100 00100 00100 01110",
    "L": "10000 10000 10000 10000 10000 10000 11111",
    "O": "01110 10001 10001 10001 10001 10001 01110",
    "P": "11110 10001 10001 11110 10000 10000 10000",
    "R": "11110 10001 10001 11110 10100 10010 10001",
    "T": "11111 00100 00100 00100 00100 00100 00100",
    "U": "10001 10001 10001 10001 10001 10001 01110",
    "W": "10001 10001 10001 10101 10101 10101 01010",
    "-": "00000 00000 00000 01110 00000 00000 00000",
    " ": "00000 00000 00000 00000 00000 00000 00000",
}
_FONT = {
    ch: np.array(
        [[int(c) for c in row] for row in spec.split()], dtype=bool
    )
    for ch, spec in _GLYPHS.items()
}


def blank_canvas(w: int, h: int, color=(255, 255, 255)) -> np.ndarray:
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:] = color
    return canvas


def draw_rect(canvas, box, color, thickness: int = 2, fill: bool = False):
    h, w = canvas.shape[:2]
    x1, y1, x2, y2 = (int(v) for v in box)
    x1, x2 = max(0, min(x1, x2)), min(w, max(x1, x2))
    y1, y2 = max(0, min(y1, y2)), min(h, max(y1, y2))
    if x2 <= x1 or y2 <= y1:
        return
    if fill:
        canvas[y1:y2, x1:x2] = color
        return
    t = max(1, thickness)
    canvas[y1 : min(y1 + t, y2), x1:x2] = color
    canvas[max(y2 - t, y1) : y2, x1:x2] = color
    canvas[y1:y2, x1 : min(x1 + t, x2)] = color
    canvas[y1:y2, max(x2 - t, x1) : x2] = color


def draw_line(canvas, p0, p1, color, thickness: int = 2):
    """Dense-sampled straight segment (deterministic, no AA)."""
    h, w = canvas.shape[:2]
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2) + 2
    xs = np.clip(np.round(np.linspace(x0, x1, n)).astype(np.int64), 0, w - 1)
    ys = np.clip(np.round(np.linspace(y0, y1, n)).astype(np.int64), 0, h - 1)
    r = max(0, thickness // 2)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            canvas[np.clip(ys + dy, 0, h - 1), np.clip(xs + dx, 0, w - 1)] = color


def draw_arrow(canvas, p0, p1, color, thickness: int = 2, tip_size: float = 10.0):
    draw_line(canvas, p0, p1, color, thickness)
    v = np.array([p1[0] - p0[0], p1[1] - p0[1]], dtype=np.float64)
    norm = float(np.hypot(*v))
    if norm < 1e-9:
        return
    u = v / norm
    tip = min(tip_size, norm)
    # two barbs at +-30 degrees back from the head
    c30, s30 = np.cos(np.pi / 6), np.sin(np.pi / 6)
    for sgn in (1.0, -1.0):
        back = np.array(
            [
                -u[0] * c30 - sgn * -u[1] * s30,
                sgn * -u[0] * s30 + -u[1] * c30,
            ]
        )
        q = (p1[0] + back[0] * tip, p1[1] + back[1] * tip)
        draw_line(canvas, p1, q, color, thickness)


def draw_text(canvas, text: str, org, color, scale: int = 1):
    """5x7 bitmap text; ``org`` is the top-left corner."""
    x, y = int(org[0]), int(org[1])
    h, w = canvas.shape[:2]
    for ch in str(text).upper():
        glyph = _FONT.get(ch)
        if glyph is not None:
            gl = np.repeat(np.repeat(glyph, scale, axis=0), scale, axis=1)
            gh, gw = gl.shape
            y0, x0 = max(0, y), max(0, x)
            y1, x1 = min(h, y + gh), min(w, x + gw)
            if y1 > y0 and x1 > x0:
                sub = gl[y0 - y : y1 - y, x0 - x : x1 - x]
                canvas[y0:y1, x0:x1][sub] = color
        x += 6 * scale
    return canvas


def _page_dims(doc: dict, margin: int = 8) -> tuple[int, int]:
    x2 = y2 = 64
    for cat in ("paragraphs", "tables", "figures"):
        for el in doc.get(cat, ()):
            x2 = max(x2, int(el["box"][2]))
            y2 = max(y2, int(el["box"][3]))
    for word in doc.get("words", ()):
        pts = word.get("points") or []
        for p in pts:
            x2 = max(x2, int(p[0]))
            y2 = max(y2, int(p[1]))
    return x2 + margin, y2 + margin


def layout_visualizer(doc: dict, canvas: np.ndarray | None = None) -> np.ndarray:
    """Category-colored boxes + labels (reference layout_visualizer)."""
    if canvas is None:
        w, h = _page_dims(doc)
        canvas = blank_canvas(w, h)
    for cat, key in (("paragraph", "paragraphs"), ("table", "tables"), ("figure", "figures")):
        for el in doc.get(key, ()):
            draw_rect(canvas, el["box"], PALETTE[cat], 2)
            label = el.get("role") or cat
            draw_text(canvas, label, (el["box"][0] + 3, el["box"][1] + 3), PALETTE[cat])
    return canvas


def det_visualizer(doc: dict, canvas: np.ndarray | None = None) -> np.ndarray:
    """Word quads (reference det_visualizer polylines)."""
    if canvas is None:
        w, h = _page_dims(doc)
        canvas = blank_canvas(w, h)
    for word in doc.get("words", ()):
        pts = word.get("points") or []
        for i in range(len(pts)):
            draw_line(canvas, pts[i], pts[(i + 1) % len(pts)], PALETTE["word"], 1)
    return canvas


def reading_order_visualizer(doc: dict, canvas: np.ndarray | None = None) -> np.ndarray:
    """Arrows between consecutive elements in reading order + order
    numbers at element centers (reference reading_order_visualizer)."""
    if canvas is None:
        canvas = layout_visualizer(doc)
    elements = sorted(
        [
            el
            for key in ("paragraphs", "tables", "figures")
            for el in doc.get(key, ())
        ],
        key=lambda el: el.get("order", 0),
    )
    prev_center = None
    for i, el in enumerate(elements):
        x1, y1, x2, y2 = el["box"]
        center = ((x1 + x2) / 2, (y1 + y2) / 2)
        draw_text(canvas, str(i), (center[0], center[1]), PALETTE["order"], scale=2)
        if prev_center is not None:
            draw_arrow(canvas, prev_center, center, PALETTE["arrow"], 2)
        prev_center = center
    return canvas


def table_visualizer(doc: dict, canvas: np.ndarray | None = None) -> np.ndarray:
    """Cell boxes with row-col labels (reference table_visualizer)."""
    if canvas is None:
        w, h = _page_dims(doc)
        canvas = blank_canvas(w, h)
    for table in doc.get("tables", ()):
        draw_rect(canvas, table["box"], PALETTE["table"], 2)
        for cell in table.get("cells", ()):
            draw_rect(canvas, cell["box"], PALETTE["cell"], 1)
            draw_text(
                canvas,
                f"{cell.get('row', 0)}-{cell.get('col', 0)}",
                (cell["box"][0] + 2, cell["box"][1] + 2),
                PALETTE["cell"],
            )
    return canvas


# extraction overlay: integer alpha percents by confidence (reference
# extractor/visualizer.py:11-15 _CONFIDENCE_ALPHA x100; integer blend
# keeps the canvas byte-deterministic)
_CONFIDENCE_ALPHA_PCT = {"high": 15, "medium": 25, "low": 40}
_EXTRACT_COLOR = (255, 0, 0)  # the reference's bright red, RGB here
_LABEL_TEXT_COLOR = (255, 255, 255)


def _blend_rect(canvas, box, color, alpha_pct: int):
    """Translucent fill: round-down integer blend, deterministic."""
    h, w = canvas.shape[:2]
    x1, y1, x2, y2 = (int(v) for v in box)
    x1, x2 = max(0, min(x1, x2)), min(w, max(x1, x2))
    y1, y2 = max(0, min(y1, y2)), min(h, max(y1, y2))
    if x2 <= x1 or y2 <= y1:
        return
    region = canvas[y1:y2, x1:x2].astype(np.int64)
    col = np.asarray(color, dtype=np.int64)[None, None, :]
    canvas[y1:y2, x1:x2] = (
        (alpha_pct * col + (100 - alpha_pct) * region) // 100
    ).astype(np.uint8)


def extraction_visualizer(
    fields, canvas: np.ndarray | None = None, doc: dict | None = None
) -> np.ndarray:
    """Resolved-field provenance overlay (reference
    ``extractor/visualizer.py:25`` ``extraction_visualizer``): for every
    element of every extracted field, a confidence-alpha translucent fill,
    a stroked box, and a label chip above the box (element label if set,
    else the field name) — the same information drawn with this module's
    numpy primitives instead of cv2/PIL.

    ``fields`` accepts :class:`~yomitoku_ray.extractor.rule_pipeline.ResolvedField`
    objects or their dict form (``{"name", "confidence", "elements":
    [{"label", "box"}, ...]}``). Canvas sizing falls back to ``doc`` dims,
    then to the field boxes themselves.
    """

    def _view(f):
        if isinstance(f, dict):
            name = f.get("name", "")
            conf = f.get("confidence", "")
            els = [
                ((e.get("label") or name), list(e["box"]))
                for e in f.get("elements", ())
            ]
        else:
            name, conf = f.name, f.confidence
            els = [
                ((getattr(e, "label", "") or name), list(e.box))
                for e in f.elements
            ]
        return conf, els

    views = [_view(f) for f in fields]
    if canvas is None:
        if doc is not None:
            w, h = _page_dims(doc)
        else:
            w = h = 64
            for _, els in views:
                for _, box in els:
                    w = max(w, int(box[2]) + 8)
                    h = max(h, int(box[3]) + 8)
        canvas = blank_canvas(w, h)
    for conf, els in views:
        alpha = _CONFIDENCE_ALPHA_PCT.get(conf, 20)
        for label, box in els:
            _blend_rect(canvas, box, _EXTRACT_COLOR, alpha)
            draw_rect(canvas, box, _EXTRACT_COLOR, 2)
            x1, y1 = int(box[0]), int(box[1])
            chip_h = 11
            chip_y = max(y1 - chip_h, 0)
            chip_w = 6 * len(str(label)) + 4
            draw_rect(
                canvas, (x1, chip_y, x1 + chip_w, chip_y + chip_h), _EXTRACT_COLOR, 1, fill=True
            )
            draw_text(canvas, str(label), (x1 + 2, chip_y + 2), _LABEL_TEXT_COLOR)
    return canvas


def visualize_document(doc: dict) -> np.ndarray:
    """All overlays on one canvas (layout + words + reading order)."""
    canvas = layout_visualizer(doc)
    det_visualizer(doc, canvas)
    return reading_order_visualizer(doc, canvas)


def to_png(canvas: np.ndarray) -> bytes:
    return encode_png(canvas)


def save_visualization(doc: dict, path: str) -> None:
    with open(path, "wb") as f:
        f.write(to_png(visualize_document(doc)))
