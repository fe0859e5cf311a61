"""Chunker tests C1–C7 (FIXTURES.md F-CHUNK): splitter invariants, merge fold,
metadata enrichment, first-wins dedup determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_etl_spark.config import ChunkerConfig
from vectordb_etl_spark.operators.chunker import (
    _merge_small_chunks,
    chunk_documents,
    chunk_text,
    recursive_split,
    remove_duplicate_chunks,
)

CFG = ChunkerConfig()


def test_split_short_text_single_chunk():
    assert recursive_split("short text", CFG) == ["short text"]


def test_split_respects_chunk_size():
    text = "para one. " * 100  # 1000 chars, sentence separators available
    chunks = recursive_split(text, CFG)
    assert all(len(c) <= CFG.chunk_size for c in chunks)
    assert len(chunks) >= 3


def test_split_prefers_paragraph_separator():
    text = ("A" * 120 + "\n\n") * 4
    chunks = recursive_split(text, CFG)
    # paragraph-separated 120-char pieces merge pairwise under 300
    assert all("A" * 120 in c for c in chunks)
    assert all(len(c) <= CFG.chunk_size for c in chunks)


def test_split_overlap_carries_tail():
    # single-separator text: pieces of 50; overlap=60 keeps ≥1 trailing piece
    words = " ".join(f"w{i:03d}" for i in range(200))
    chunks = recursive_split(words, CFG)
    for a, b in zip(chunks, chunks[1:]):
        tail = a.split()[-1]
        assert tail in b.split()[:16], f"no overlap between {a[-30:]!r} and {b[:30]!r}"


def test_split_unsplittable_run_hard_cut():
    text = "B" * 700  # no separators at all except ""
    chunks = recursive_split(text, CFG)
    assert all(len(c) <= CFG.chunk_size for c in chunks)
    assert "".join(chunks)[: CFG.chunk_size] == "B" * CFG.chunk_size


def test_merge_small_chunks_reference_fold():
    cfg = ChunkerConfig()  # min=100 max=500
    # adjacent small chunks merge with '\n' while ≤ max (chunker.py:75-125)
    # a(50)+b(50) merge to 101 ≥ min, so c stays separate
    merged = _merge_small_chunks(["a" * 50, "b" * 50, "c" * 200], cfg)
    assert merged == ["a" * 50 + "\n" + "b" * 50, "c" * 200]
    # merge stops when it would exceed max
    merged = _merge_small_chunks(["a" * 50, "b" * 480], cfg)
    assert merged == ["a" * 50, "b" * 480]
    # two adequate chunks don't merge
    merged = _merge_small_chunks(["a" * 150, "b" * 150], cfg)
    assert merged == ["a" * 150, "b" * 150]


def test_chunk_text_small_doc_passthrough():
    # ≤ max_chunk_size docs are NOT split (chunker.py:148-153)
    text = "z" * 450
    assert chunk_text(text, CFG) == [text]


def test_chunk_documents_metadata(spark):
    rows = [(1, "srcA", "hello. " * 120), (2, "srcB", "tiny")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = chunk_documents(df, CFG).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_index"])
        assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
        assert all(c["total_chunks"] == len(chunks) for c in chunks)
        assert all(c["chunk_size_chars"] == len(c["text"]) for c in chunks)
        assert all(len(c["chunk_id"]) == 12 for c in chunks)
    assert len(by_doc[2]) == 1


def test_remove_duplicates_first_wins(spark):
    rows = [
        (1, 0, "Same  Text"),
        (2, 0, "same text"),  # normalized duplicate of doc 1
        (3, 0, "unique"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_index", "text"])
    kept = remove_duplicate_chunks(df).select("doc_id").collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [1, 3]  # doc 1 survives, not doc 2 — insertion order


def test_remove_duplicates_stable_under_repartition(spark):
    rows = [(i, 0, f"text {i % 10}") for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_index", "text"])
    a = sorted(r["doc_id"] for r in remove_duplicate_chunks(df).collect())
    b = sorted(
        r["doc_id"]
        for r in remove_duplicate_chunks(df.repartition(7)).collect()
    )
    assert a == b == list(range(1, 11))


# --------------------------------------------------------------------------
# C2 — semantic split (hybrid mode, deterministic with the hash embedder)
# --------------------------------------------------------------------------


def test_semantic_split_deterministic_and_grouping():
    from vectordb_etl_spark.config import EmbeddingConfig
    from vectordb_etl_spark.embeddings import HashEmbedder
    from vectordb_etl_spark.operators.chunker import semantic_split

    emb = HashEmbedder(dimension=64)
    text = (
        "Cats purr softly. Cats nap all day. Cats chase mice. "
        "Quarterly revenue rose sharply. Margins improved too. "
        "Cats love boxes."
    )
    a = semantic_split(text, emb, 70.0)
    b = semantic_split(text, emb, 70.0)
    assert a == b
    assert len(a) >= 2  # at least one breakpoint found
    assert " ".join(a).split() == text.split()  # no words lost or reordered


def test_semantic_split_short_text_noop():
    from vectordb_etl_spark.embeddings import HashEmbedder
    from vectordb_etl_spark.operators.chunker import semantic_split

    assert semantic_split("One sentence only.", HashEmbedder(16), 70.0) == [
        "One sentence only."
    ]


def test_chunk_documents_hybrid_mode(spark):
    from vectordb_etl_spark.config import ChunkerConfig, EmbeddingConfig

    rows = [
        (1, "s1", "A sentence about cats. " * 10 + "Finance report text. " * 10),
        (2, "s2", "short"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    cfg = ChunkerConfig(chunking_mode="hybrid")
    out = chunk_documents(
        df, cfg, embedding_config=EmbeddingConfig(dimension=32)
    ).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    # deterministic across runs
    out2 = chunk_documents(
        df, cfg, embedding_config=EmbeddingConfig(dimension=32)
    ).collect()
    assert sorted(r["text"] for r in out) == sorted(r["text"] for r in out2)
    # chunk invariants hold in hybrid mode too
    for r in out:
        assert r["chunk_size_chars"] == len(r["text"])


def test_chunk_text_sql_matches_python_on_adversarial_texts():
    """The DuckDB restatement (chunk_text_sql) must reproduce chunk_text
    chunk-for-chunk on edge shapes the corpus may not exhibit: deep
    cascade descent, no-separator char splits, overlap carry-back chains,
    empty docs, small docs, and strip-to-empty flushes."""
    import duckdb

    from vectordb_etl_spark.config import ChunkerConfig
    from vectordb_etl_spark.operators.chunker import chunk_text, chunk_text_sql

    cfg = ChunkerConfig()
    texts = [
        "",  # empty -> no chunks
        "short doc",  # <= max -> single chunk
        "x" * 501,  # no separators at all -> char-level split + merges
        ("word " * 200).strip(),  # space-separated long run
        "a. " * 300,  # sentence separator battery
        ("para one. more text here\n\n" * 40),  # paragraph cascade
        ("A" * 299 + " ") * 5,  # pieces at the chunk_size boundary
        "  \n\n  " + "y" * 600 + "\n\n   ",  # strip-to-empty edges
        ("sent one! sent two? sent three; four, five " * 30),
        "\n".join("line %d %s" % (i, "z" * (i % 7) * 20) for i in range(80)),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id INT, source VARCHAR, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?)",
        [(i, f"s{i}", t) for i, t in enumerate(texts)],
    )
    rows = con.execute(
        chunk_text_sql("SELECT doc_id, source, text FROM docs")
        + " ORDER BY doc_id, chunk_index"
    ).fetchall()
    got: dict[int, list[str]] = {}
    for doc_id, _src, _idx, _tot, ctext in rows:
        got.setdefault(doc_id, []).append(ctext)
    for i, t in enumerate(texts):
        assert got.get(i, []) == chunk_text(t, cfg), f"doc {i}"


def test_chunk_text_sql_respects_non_default_config():
    """The generator is parameterized, not hard-coded to the reference
    defaults — a different (chunk_size, overlap, min, max) quadruple must
    still match the Python kernel exactly."""
    import duckdb

    from vectordb_etl_spark.config import ChunkerConfig
    from vectordb_etl_spark.operators.chunker import chunk_text, chunk_text_sql

    cfg = ChunkerConfig(
        chunk_size=80, chunk_overlap=20, min_chunk_size=30, max_chunk_size=120
    )
    texts = ["word " * 100, "a. " * 80, "x" * 130, "para\n\n" * 30, "tiny"]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, source VARCHAR, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?)",
        [(i, f"s{i}", t) for i, t in enumerate(texts)],
    )
    rows = con.execute(
        chunk_text_sql("SELECT doc_id, source, text FROM docs", cfg)
        + " ORDER BY doc_id, chunk_index"
    ).fetchall()
    got: dict[int, list[str]] = {}
    for doc_id, _s, _i, _t, ctext in rows:
        got.setdefault(doc_id, []).append(ctext)
    for i, t in enumerate(texts):
        assert got.get(i, []) == chunk_text(t, cfg), f"doc {i}"


def test_chunk_text_sql_requires_char_split_fallback():
    """A separator list without the final '' fallback would silently drop
    un-splittable pieces from the SQL cascade — refused loudly instead."""
    import pytest

    from vectordb_etl_spark.config import ChunkerConfig
    from vectordb_etl_spark.operators.chunker import chunk_text_sql

    cfg = ChunkerConfig(separators=["\n\n", "\n", " "])
    with pytest.raises(ValueError, match="fallback"):
        chunk_text_sql("SELECT * FROM docs", cfg)
