"""yomitoku_ray: a Ray-Data-native document-content extraction engine.

From-scratch re-creation of the reference YomiToku analyzer semantics
(kotaro-kinoshita/yomitoku, snapshot at /root/reference) as a streaming
Ray Data pipeline over Common-Crawl-style Parquet web pages.
"""

__version__ = "0.1.0"

from .context import configure_data_context as _configure_data_context

_configure_data_context()
