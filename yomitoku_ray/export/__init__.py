from .markdown import convert_markdown, escape_markdown_special_chars
from .json_export import convert_json, dumps_canonical_json
from .csv_export import convert_csv, render_csv
from .html_export import convert_html, convert_text_to_html

__all__ = [
    "convert_markdown",
    "escape_markdown_special_chars",
    "convert_json",
    "dumps_canonical_json",
    "convert_csv",
    "render_csv",
    "convert_html",
    "convert_text_to_html",
]
