"""File-ingestion sources (SURVEY.md §2.1 S1–S6): recursive binaryFile scans
plus stdlib-only parser UDFs for HTML/JSP, HWP (OLE/CFB), and HWPX (ZIP/XML).
"""

from vectordb_etl_spark.sources.scan import (
    file_metadata_cols,
    scan_files,
    load_html_documents,
    load_hwp_documents,
)
from vectordb_etl_spark.sources.html import parse_html, parse_html_udf
from vectordb_etl_spark.sources.hwp import (
    CompoundFile,
    extract_hwp,
    extract_hwpx,
    extract_hwp_udf,
)

__all__ = [
    "file_metadata_cols",
    "scan_files",
    "load_html_documents",
    "load_hwp_documents",
    "parse_html",
    "parse_html_udf",
    "CompoundFile",
    "extract_hwp",
    "extract_hwpx",
    "extract_hwp_udf",
]
