"""Loader tests (S1–S6): HTML parse fidelity, CFB reader round-trip against a
minimal in-test [MS-CFB] writer, HWPX zip extraction, full scan pipelines."""

from __future__ import annotations

import struct
import zipfile
import zlib
from io import BytesIO

import pytest

from vectordb_etl_spark.sources.html import parse_html
from vectordb_etl_spark.sources.hwp import (
    CompoundFile,
    extract_hwp,
    extract_hwpx,
)
from vectordb_etl_spark.sources.scan import load_html_documents, load_hwp_documents

from vectordb_etl_spark.sources.cfb_fixtures import (  # noqa: E402
    _hwp_section_bytes,
    make_hwp,
    write_min_cfb,
)


def make_hwpx(paragraphs: list[str], title="t", creator="c") -> bytes:
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        body = "".join(f"<p>{p}</p>\n" for p in paragraphs)
        zf.writestr("Contents/section0.xml", f"<doc>{body}</doc>")
        zf.writestr(
            "Contents/meta.xml",
            "<meta xmlns:dc='http://purl.org/dc/elements/1.1/'>"
            f"<dc:title>{title}</dc:title><dc:creator>{creator}</dc:creator></meta>",
        )
    return buf.getvalue()


# ---------------------------------------------------------------------------
# HTML parse unit tests (S2/S3)
# ---------------------------------------------------------------------------

HTML_DOC = """<html><head><title> My Title </title>
<script>var x = 'NOISE';</script><style>.c{color:red}</style></head>
<body><nav>menu NOISE</nav><header>hdr NOISE</header>
<h1>Heading One</h1><p>First paragraph 안녕하세요.</p>
<h2>Sub</h2><p>Second paragraph.</p>
<table><tr><td>cell</td></tr></table><ul><li>item</li></ul>
<footer>foot NOISE</footer><aside>side NOISE</aside></body></html>"""


def test_parse_html_strips_boilerplate_and_counts():
    r = parse_html(HTML_DOC)
    assert "NOISE" not in r["text"]
    assert "First paragraph" in r["text"] and "cell" in r["text"]
    assert r["title"] == "My Title"
    assert r["heading_count"] == 2
    assert r["headings"][0] == {"level": 1, "text": "Heading One"}
    assert r["paragraph_count"] == 2
    assert r["table_count"] == 1
    assert r["list_count"] == 1


def test_parse_html_empty_and_garbage():
    assert parse_html("")["text"] == ""
    assert parse_html("just plain text")["text"] == "just plain text"


# ---------------------------------------------------------------------------
# CFB reader round-trip (S4)
# ---------------------------------------------------------------------------


def test_cfb_roundtrip_streams():
    data = make_hwp(["Hello World", "안녕하세요"])
    cf = CompoundFile(data)
    assert cf.list_streams() == ["BodyText/Section0", "FileHeader"]
    assert cf.read_stream("FileHeader").startswith(b"HWP Document File")


def test_extract_hwp_compressed_and_raw():
    for compress in (True, False):
        out = extract_hwp(make_hwp(["Hello World", "안녕하세요 반갑습니다"], compress))
        assert out["n_sections"] == 1
        assert out["text"].split("\n") == ["Hello World", "안녕하세요 반갑습니다"]


def test_extract_hwp_filters_non_whitelisted_codepoints():
    # control chars and symbols outside ASCII/Hangul/CJK must be dropped
    out = extract_hwp(make_hwp(["abé☃cd"]))  # é and snowman dropped
    assert out["text"] == "abcd"


def test_extract_hwpx():
    out = extract_hwpx(make_hwpx(["문단 하나", "Paragraph two"], "제목", "저자"))
    assert "문단 하나" in out["text"] and "Paragraph two" in out["text"]
    assert out["title"] == "제목" and out["author"] == "저자"
    assert out["n_sections"] == 1


def test_cfb_general_writer_boundaries_and_nesting():
    # mini-cutoff (4096) and mini-sector (64) boundary sizes, nested
    # storages, a multi-sector FAT chain, and an empty stream — every size
    # class the reader's mini/FAT dispatch can hit
    from vectordb_etl_spark.sources.cfb_fixtures import write_cfb

    streams = {
        "FileHeader": b"HWP Document File" + b"\x00" * 239,
        "Mini63": b"a" * 63,
        "Mini64": b"b" * 64,
        "Mini65": b"c" * 65,
        "Cut4095": b"d" * 4095,  # last mini-stream resident
        "Cut4096": b"e" * 4096,  # first FAT-chained
        "Cut4097": b"f" * 4097,
        "Big": b"g" * 100_000,  # multi-sector chain, multi-FAT-entry
        "Empty": b"",
        "Nest/Sub/Deep": b"deep stream",
        "Nest/Sib": b"sibling",
    }
    cf = CompoundFile(write_cfb(streams))
    assert set(cf.list_streams()) == set(streams)
    for name, payload in streams.items():
        assert cf.read_stream(name) == payload, name


def test_extract_hwp_many_sections_numeric_order():
    # Section10 must sort AFTER Section2 (numeric, not lexicographic), and a
    # big section crossing the mini cutoff must still extract via FAT chains
    from vectordb_etl_spark.sources.cfb_fixtures import write_cfb

    streams = {"FileHeader": b"HWP Document File" + b"\x00" * 239}
    for i in (0, 1, 2, 10):
        streams[f"BodyText/Section{i}"] = _hwp_section_bytes([f"part {i}"])
    streams["BodyText/Section3"] = _hwp_section_bytes(
        ["big " + "x" * 4000]
    )  # > mini cutoff once UTF-16-encoded
    out = extract_hwp(write_cfb(streams))
    assert out["n_sections"] == 5
    assert out["text"].split("\n") == [
        "part 0", "part 1", "part 2", "big " + "x" * 4000, "part 10",
    ]


# ---------------------------------------------------------------------------
# hwp5txt subprocess tier (S4 tier a, env-gated)
# ---------------------------------------------------------------------------


@pytest.fixture()
def fake_hwp5txt(tmp_path):
    bin_path = tmp_path / "hwp5txt"
    bin_path.write_text(
        "#!/bin/sh\necho 'converted by hwp5txt'\necho '  spaced line  '\n"
    )
    bin_path.chmod(0o755)
    return str(bin_path)


def test_subprocess_tier_preferred_when_gated(fake_hwp5txt, monkeypatch):
    from vectordb_etl_spark.sources.hwp import (
        _extract_any,
        extract_hwp_subprocess,
        hwp5txt_binary,
    )

    data = make_hwp(["cfb tier text"])
    out = extract_hwp_subprocess(data, fake_hwp5txt)
    assert out["text"] == "converted by hwp5txt\nspaced line"

    monkeypatch.setenv("HWP5TXT_BIN", fake_hwp5txt)
    assert hwp5txt_binary() == fake_hwp5txt
    got = _extract_any(data, hwp5txt_binary())
    assert got["text"] == "converted by hwp5txt\nspaced line"
    assert got["error"] is None


def test_subprocess_tier_keeps_text_when_cfb_metadata_fails(fake_hwp5txt):
    """hwp5txt can convert files whose CFB directory our reader chokes
    on; a metadata-recovery failure must degrade to None fields, never
    discard the successfully converted text."""
    from vectordb_etl_spark.sources.hwp import extract_hwp_subprocess

    not_cfb = b"\x00" * 1024  # no CFB magic — CompoundFile raises
    out = extract_hwp_subprocess(not_cfb, fake_hwp5txt)
    assert out["text"] == "converted by hwp5txt\nspaced line"
    assert out["title"] is None and out["author"] is None
    assert out["subject"] is None and out["keywords"] is None


def test_subprocess_tier_falls_back_to_cfb_on_failure(tmp_path):
    from vectordb_etl_spark.sources.hwp import _extract_any

    bad = tmp_path / "hwp5txt"
    bad.write_text("#!/bin/sh\nexit 3\n")
    bad.chmod(0o755)
    out = _extract_any(make_hwp(["cfb tier text"]), str(bad))
    assert out["text"] == "cfb tier text"  # tier cascade landed on CFB
    assert out["error"] is None


def test_pyhwpx_middle_tier_cascade_order(monkeypatch, tmp_path):
    """S4 tier (b): with a stubbed pyhwpx module the cascade runs
    hwp5txt -> pyhwpx -> CFB exactly like the reference's tier selection
    (hwp_loader.py:25-40): pyhwpx serves when the subprocess tier is
    absent or fails, and a pyhwpx failure falls through to CFB. Each
    row records its serving tier in `method`."""
    import sys
    import types

    from vectordb_etl_spark.sources import hwp as hwp_mod

    class FakeHwp:
        def open(self, path):
            self._path = path

        def get_text(self):
            return "text from pyhwpx"

        def get_doc_info(self):
            return {"title": "T", "author": "A", "subject": None,
                    "keywords": ""}

        def quit(self):
            pass

    fake = types.ModuleType("pyhwpx")
    fake.Hwp = FakeHwp
    monkeypatch.setitem(sys.modules, "pyhwpx", fake)
    assert hwp_mod.pyhwpx_hwp_class() is FakeHwp

    data = make_hwp(["cfb tier text"])
    # no hwp5txt -> pyhwpx serves, doc_info metadata mapped (''/None -> None)
    out = hwp_mod._extract_any(data, None, FakeHwp)
    assert out["method"] == "pyhwpx"
    assert out["text"] == "text from pyhwpx"
    assert (out["title"], out["author"]) == ("T", "A")
    assert out["subject"] is None and out["keywords"] is None
    assert out["n_sections"] == -1 and out["error"] is None

    # hwp5txt present and working -> it wins over pyhwpx
    good = tmp_path / "hwp5txt"
    good.write_text("#!/bin/sh\necho 'converted by hwp5txt'\n")
    good.chmod(0o755)
    assert hwp_mod._extract_any(data, str(good), FakeHwp)["method"] == "hwp5txt"

    # failing subprocess tier falls to pyhwpx, not straight to CFB
    bad = tmp_path / "hwp5txt_bad"
    bad.write_text("#!/bin/sh\nexit 3\n")
    bad.chmod(0o755)
    assert hwp_mod._extract_any(data, str(bad), FakeHwp)["method"] == "pyhwpx"

    # pyhwpx failure falls through to the CFB tier with its text
    class BrokenHwp(FakeHwp):
        def get_text(self):
            raise RuntimeError("COM automation unavailable")

    out = hwp_mod._extract_any(data, None, BrokenHwp)
    assert out["method"] == "cfb"
    assert out["text"] == "cfb tier text"

    # no doc_info on the installed pyhwpx -> CFB property-set best-effort
    class NoInfoHwp:
        def open(self, path):
            pass

        def get_text(self):
            return "text from pyhwpx"

        def quit(self):
            pass

    with_meta = make_hwp(["cfb tier text"], title="cfb title")
    out = hwp_mod._extract_any(with_meta, None, NoInfoHwp)
    assert out["method"] == "pyhwpx"
    assert out["text"] == "text from pyhwpx"
    assert out["title"] == "cfb title"  # recovered from the summary stream


def test_hwp5txt_binary_ungated(monkeypatch):
    from vectordb_etl_spark.sources.hwp import hwp5txt_binary

    monkeypatch.setenv("HWP5TXT_BIN", "/nonexistent/hwp5txt")
    assert hwp5txt_binary() is None  # explicit-but-missing never resolves


@pytest.mark.skipif(
    __import__("shutil").which("hwp5txt") is None,
    reason="real hwp5txt converter not installed",
)
def test_real_hwp5txt_smoke():
    from shutil import which

    from vectordb_etl_spark.sources.hwp import extract_hwp_subprocess

    out = extract_hwp_subprocess(make_hwp(["real converter"]), which("hwp5txt"))
    assert isinstance(out["text"], str)


# ---------------------------------------------------------------------------
# full scan pipelines on a temp directory tree (S1+S6+P8)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def doc_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("docs")
    (root / "folderA").mkdir()
    (root / "folderA" / "a.html").write_text(HTML_DOC, encoding="utf-8")
    (root / "b.jsp").write_text(
        "<html><body><p>JSP English document body text here.</p></body></html>",
        encoding="utf-8",
    )
    (root / "folderA" / "tiny.html").write_text("<p>x</p>", encoding="utf-8")
    (root / "folderA" / "doc.hwp").write_bytes(
        make_hwp(["한글 문서 본문입니다 이것은 테스트", "둘째 문단"])
    )
    (root / "doc2.hwpx").write_bytes(
        make_hwpx(["HWPX body paragraph with enough text"], "T2", "A2")
    )
    return root


def test_load_html_documents(spark, doc_tree):
    rows = {r["filename"]: r for r in load_html_documents(spark, str(doc_tree)).collect()}
    assert set(rows) == {"a.html", "b.jsp"}  # tiny.html filtered (S6)
    a = rows["a.html"]
    assert a["folder_name"] == "folderA" and a["file_type"] == "html"
    assert a["title"] == "My Title" and a["heading_count"] == 2
    assert "NOISE" not in a["text"]
    b = rows["b.jsp"]
    assert b["folder_name"] == "root" and b["language"] == "english"
    assert b["char_count"] == len(b["text"])


def test_load_hwp_documents(spark, doc_tree):
    rows = {r["filename"]: r for r in load_hwp_documents(spark, str(doc_tree)).collect()}
    assert set(rows) == {"doc.hwp", "doc2.hwpx"}
    h = rows["doc.hwp"]
    assert h["language"] == "korean" and "한글 문서" in h["text"]
    x = rows["doc2.hwpx"]
    assert x["title"] == "T2" and x["author"] == "A2"
    assert x["folder_name"] == "root" and x["file_type"] == "hwpx"


def test_hwp_per_file_failure_is_recorded_not_fatal(spark):
    # corrupt/unknown blobs must yield a tagged error row (auditable at
    # scale), never a task failure; good rows in the same batch still parse
    from vectordb_etl_spark.sources.hwp import extract_hwp_udf

    import pyspark.sql.functions as F

    rows = [
        (1, b"garbage not a container"),
        (2, b""),
        (3, b"PK\x03\x04 corrupt zip tail"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary").select(
        "id", extract_hwp_udf(F.col("content")).alias("p")
    )
    got = {r["id"]: (r["p"]["text"], r["p"]["error"]) for r in df.collect()}
    assert got[1] == ("", "unknown_format")
    assert got[2] == ("", "empty")
    assert got[3][0] == "" and got[3][1].startswith("parse_error:")


# ---------------------------------------------------------------------------
# HwpSummaryInformation property-set metadata (VERDICT r10 item 2;
# reference hwp_loader.py:112-113,146-147 via OLE SummaryInformation)
# ---------------------------------------------------------------------------


def test_property_set_roundtrip_unicode_and_types():
    from vectordb_etl_spark.sources.cfb_fixtures import property_set_bytes
    from vectordb_etl_spark.sources.hwp import parse_ole_property_set

    props = {2: "제목 Title", 3: "주제/subject", 4: "author-x", 5: "kw1, kw2"}
    assert parse_ole_property_set(property_set_bytes(props)) == props
    # malformed inputs never raise — per-row error contract
    assert parse_ole_property_set(b"") == {}
    assert parse_ole_property_set(b"\xfe\xff" + b"\x00" * 60) == {}
    assert parse_ole_property_set(b"\xff" * 64) == {}


def test_extract_hwp_summary_metadata():
    data = make_hwp(
        ["본문 첫 문단", "second paragraph"],
        title="제목", author="저자", subject="주제", keywords="핵심어, key",
    )
    out = extract_hwp(data)
    assert out["title"] == "제목" and out["author"] == "저자"
    assert out["subject"] == "주제" and out["keywords"] == "핵심어, key"
    assert "본문 첫 문단" in out["text"]  # body still decodes alongside meta
    # absent stream -> all four None (no phantom values)
    none = extract_hwp(make_hwp(["text only"]))
    assert (
        none["title"] is None and none["author"] is None
        and none["subject"] is None and none["keywords"] is None
    )


def test_extract_hwpx_subject_keywords():
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("Contents/section0.xml", "<doc><p>hwpx body</p></doc>")
        zf.writestr(
            "Contents/meta.xml",
            "<meta xmlns:dc='http://purl.org/dc/elements/1.1/'>"
            "<dc:title>T</dc:title><dc:creator>C</dc:creator>"
            "<dc:subject>S</dc:subject><keyword>K1</keyword></meta>",
        )
    out = extract_hwpx(buf.getvalue())
    assert out["subject"] == "S" and out["keywords"] == "K1"


def test_load_hwp_documents_projects_summary_fields(spark, tmp_path):
    d = tmp_path / "hwp"
    d.mkdir()
    (d / "a.hwp").write_bytes(
        make_hwp(
            ["Document body with enough characters here"],
            title="T1", author="A1", subject="S1", keywords="K1",
        )
    )
    from vectordb_etl_spark.sources.scan import load_hwp_documents

    row = load_hwp_documents(spark, str(d)).collect()[0]
    assert row["title"] == "T1" and row["author"] == "A1"
    assert row["subject"] == "S1" and row["keywords"] == "K1"


def test_hwp_prefers_hwp_summary_over_document_summary():
    """Code-review r11: \\x05DocumentSummaryInformation also ends with
    'SummaryInformation' but uses a DIFFERENT property-id mapping (PID 2
    is 'category' there, not title) — the extractor must bind metadata to
    the Hwp stream even when the Document one enumerates first."""
    from vectordb_etl_spark.sources.cfb_fixtures import (
        property_set_bytes,
        write_cfb,
    )
    from vectordb_etl_spark.sources.hwp import _summary_metadata, CompoundFile
    from vectordb_etl_spark.sources.cfb_fixtures import _hwp_section_bytes

    data = write_cfb({
        "FileHeader": b"HWP Document File" + b"\x00" * 239,
        "BodyText/Section0": _hwp_section_bytes(["body"]),
        # category/byte-count style values under the SAME pids — reading
        # these as title/author would be the bug
        "\x05DocumentSummaryInformation": property_set_bytes(
            {2: "WRONG-category", 4: "WRONG-bytecount"}
        ),
        "\x05HwpSummaryInformation": property_set_bytes(
            {2: "Right Title", 4: "Right Author"}
        ),
    })
    got = _summary_metadata(CompoundFile(data))
    assert got["title"] == "Right Title" and got["author"] == "Right Author"
    # standard OLE SummaryInformation (same PIDSI ids) is an acceptable
    # fallback when no Hwp stream exists; DocumentSummary alone is NOT
    only_doc = write_cfb({
        "FileHeader": b"HWP Document File" + b"\x00" * 239,
        "BodyText/Section0": _hwp_section_bytes(["body"]),
        "\x05DocumentSummaryInformation": property_set_bytes(
            {2: "WRONG-category"}
        ),
    })
    got2 = _summary_metadata(CompoundFile(only_doc))
    assert got2["title"] is None
    only_std = write_cfb({
        "FileHeader": b"HWP Document File" + b"\x00" * 239,
        "BodyText/Section0": _hwp_section_bytes(["body"]),
        "\x05SummaryInformation": property_set_bytes({2: "Std Title"}),
    })
    got3 = _summary_metadata(CompoundFile(only_std))
    assert got3["title"] == "Std Title"
