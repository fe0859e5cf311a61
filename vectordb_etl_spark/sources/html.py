"""HTML/JSP parsing — operators S2/S3 (SURVEY.md §2.1; reference
modules/html_loader.py:69-114, modules/text_cleaner.py:227-260).

The reference uses BeautifulSoup to (a) decompose boilerplate tags
``script style nav footer header aside``, (b) emit newline-separated text,
and (c) extract structure: title, h1–h6 headings, paragraph/table/list
counts. Parsing HTML is not regex-able, so this is one of the five sanctioned
pandas UDFs (SURVEY.md §2.9) — stdlib ``html.parser`` (no bs4 in the
runtime), pure Python, fully distributable; one Arrow batch in, one struct
column out.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# tags whose entire subtree is boilerplate (html_loader.py:77)
BOILERPLATE_TAGS = frozenset({"script", "style", "nav", "footer", "header", "aside"})
# block-level tags that imply a line break in get_text(separator='\n')
_BLOCK_TAGS = frozenset(
    {"p", "div", "br", "li", "tr", "table", "ul", "ol", "h1", "h2", "h3", "h4",
     "h5", "h6", "section", "article", "blockquote", "pre"}
)
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link"})

HTML_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("headings", ArrayType(
            StructType([
                StructField("level", IntegerType()),
                StructField("text", StringType()),
            ])
        )),
        StructField("heading_count", IntegerType()),
        StructField("paragraph_count", IntegerType()),
        StructField("table_count", IntegerType()),
        StructField("list_count", IntegerType()),
    ]
)


class _Extractor(HTMLParser):
    """Single-pass extraction: text with block-level newlines, title,
    headings with levels, and structural counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.headings: list[tuple[int, str]] = []
        self.counts = {"p": 0, "table": 0, "list": 0}
        self._skip_depth = 0
        self._in_title = False
        self._heading_level = 0
        self._heading_parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in BOILERPLATE_TAGS:
            if tag not in _VOID_TAGS:
                self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
        elif tag == "p":
            self.counts["p"] += 1
        elif tag == "table":
            self.counts["table"] += 1
        elif tag in ("ul", "ol"):
            self.counts["list"] += 1
        elif len(tag) == 2 and tag[0] == "h" and tag[1].isdigit():
            self._heading_level = int(tag[1])
            self._heading_parts = []
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in BOILERPLATE_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = False
        elif self._heading_level and tag == f"h{self._heading_level}":
            text = "".join(self._heading_parts).strip()
            if text:
                self.headings.append((self._heading_level, text))
            self._heading_level = 0
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
        if self._heading_level:
            self._heading_parts.append(data)
        self.parts.append(data)


def parse_html(html: str) -> dict:
    """Parse one document; mirrors html_loader.py:69-114 outputs. Lines are
    stripped and blank lines dropped, like get_text('\\n') + post-clean."""
    p = _Extractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass  # html.parser is tolerant; belt-and-braces for binary garbage
    raw = "".join(p.parts)
    lines = [ln.strip() for ln in raw.split("\n")]
    text = "\n".join(ln for ln in lines if ln)
    return {
        "text": text,
        "title": "".join(p.title_parts).strip() or None,
        "headings": [{"level": lv, "text": tx} for lv, tx in p.headings],
        "heading_count": len(p.headings),
        "paragraph_count": p.counts["p"],
        "table_count": p.counts["table"],
        "list_count": p.counts["list"],
    }


@F.pandas_udf(HTML_STRUCT)
def parse_html_udf(html: pd.Series) -> pd.DataFrame:
    rows = [parse_html(h) for h in html]
    return pd.DataFrame(
        {
            "text": [r["text"] for r in rows],
            "title": [r["title"] for r in rows],
            "headings": [
                [(h["level"], h["text"]) for h in r["headings"]] for r in rows
            ],
            "heading_count": [r["heading_count"] for r in rows],
            "paragraph_count": [r["paragraph_count"] for r in rows],
            "table_count": [r["table_count"] for r in rows],
            "list_count": [r["list_count"] for r in rows],
        }
    )


def html_from_binary(content_col: Column | str = "content") -> Column:
    """binaryFile content → decoded HTML string (UTF-8, lenient)."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    return F.decode(c, "UTF-8")
