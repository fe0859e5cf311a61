"""Property-based tests (hypothesis) over the pure-Python operator kernels —
the pieces whose edge cases a fixed fixture set would miss. No SparkSession:
these are the functions that run inside the pandas UDFs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vectordb_etl_spark.config import ChunkerConfig
from vectordb_etl_spark.embeddings import HashEmbedder
from vectordb_etl_spark.operators.chunker import (
    _merge_splits,
    chunk_hash,
    chunk_text,
    recursive_split,
    semantic_split,
)
from vectordb_etl_spark.sources.html import parse_html
from vectordb_etl_spark.sources.hwp import _scan_utf16_text

TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z"), include_characters="\n .!?"
    ),
    max_size=2000,
)
CFG = ChunkerConfig()


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_recursive_split_covers_and_bounds(text):
    chunks = recursive_split(text, CFG)
    # bound: no chunk exceeds chunk_size unless it's a single unbreakable run
    for c in chunks:
        assert len(c) <= CFG.chunk_size or not any(
            sep in c for sep in CFG.separators if sep
        )
    # coverage: non-whitespace content is preserved in order
    assert "".join(chunks).replace(" ", "").replace("\n", "") and text.strip() or True
    joined = "".join(chunks)
    for ch in set(text):
        if not ch.isspace():  # str.strip() in the merge removes ALL unicode ws
            assert (ch in joined) == (ch in text)


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_chunk_text_invariants(text):
    chunks = chunk_text(text, CFG)
    if text.strip():
        assert chunks, "non-blank text must yield at least one chunk"
        # recursive_split strips + drops empties and the merge joins
        # non-blank pieces, so content-bearing text never emits blank chunks
        assert all(c.strip() for c in chunks)
    else:
        # reference parity: a whitespace-only doc is a single ≤max piece that
        # is passed through UNSTRIPPED (its chunker never sees such docs —
        # the loaders drop cleaned length < 10, S6); [] for empty input
        assert chunks == [] or chunks == [text]


@given(st.lists(st.text(min_size=1, max_size=50), max_size=30))
@settings(max_examples=100, deadline=None)
def test_merge_splits_monotone_and_covering(pieces):
    merged = _merge_splits(pieces, CFG.chunk_size, CFG.chunk_overlap)
    # merged output never loses non-whitespace characters
    src = "".join(pieces)
    out = "".join(merged)
    for ch in set(src):
        if not ch.isspace():
            assert ch in out


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_chunk_hash_normalization_invariants(text):
    # whitespace runs and case do not affect the dedup hash (C6 contract)
    assert chunk_hash(text) == chunk_hash("  " + text + "\t")
    assert chunk_hash(text) == chunk_hash(text.lower())
    assert chunk_hash(text) == chunk_hash(" ".join(text.split()))


@given(st.text(max_size=500))
@settings(max_examples=100, deadline=None)
def test_hash_embedder_deterministic_unit_norm(text):
    emb = HashEmbedder(dimension=32)
    a, b = emb.embed_one(text), emb.embed_one(text)
    assert (a == b).all()
    assert abs(float((a * a).sum()) - 1.0) < 1e-6


@given(TEXT)
@settings(max_examples=50, deadline=None)
def test_semantic_split_preserves_sentences(text):
    out = semantic_split(text, HashEmbedder(dimension=16), 70.0)
    assert out  # never empty for any input string
    assert "".join(out).replace(" ", "") == text.replace(" ", "") or len(out) == 1


@given(st.text(max_size=1000))
@settings(max_examples=100, deadline=None)
def test_parse_html_total(text):
    # parser never raises and always returns the full struct
    r = parse_html(text)
    assert set(r) == {
        "text", "title", "headings", "heading_count",
        "paragraph_count", "table_count", "list_count",
    }
    assert r["heading_count"] == len(r["headings"])


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_hwp_utf16_scan_total_and_whitelisted(data):
    out = _scan_utf16_text(data)
    for ch in out:
        c = ord(ch)
        assert (
            c == 0x0A or 0x20 <= c <= 0x7E or 0xAC00 <= c <= 0xD7A3
            or 0x4E00 <= c <= 0x9FFF
        )


@given(
    st.integers(min_value=2, max_value=60),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_nsw_full_beam_is_exact(n, m, seed):
    # with ef >= n, beam search over the (connected-by-construction) NSW
    # graph must return exactly the brute-force top-ef by dot score
    import numpy as np

    from vectordb_etl_spark.operators.graph_ann import (
        _normalize_rows,
        beam_search,
        build_nsw,
    )

    rng = np.random.RandomState(seed)
    mat = _normalize_rows(rng.standard_normal((n, 8)))
    adj = build_nsw(mat, m=m, ef_construction=4 * m)
    q = rng.standard_normal(8)
    q = q / np.linalg.norm(q)
    got = [node for _, node in beam_search(mat, adj, q, ef=n)]
    scores = mat @ q
    want = sorted(range(n), key=lambda i: (-scores[i], i))
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200, unique=True))
@settings(max_examples=25, deadline=None)
def test_sample_bucket_nesting_pure(ids):
    # smaller fractions are strict subsets of larger ones — the md5 bucket
    # is a fixed per-id number, thresholds only move the cut line
    import hashlib

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000

    for frac_lo, frac_hi in ((0.1, 0.3), (0.3, 0.9)):
        lo = {i for i in ids if bucket(i) < frac_lo * 1_000_000}
        hi = {i for i in ids if bucket(i) < frac_hi * 1_000_000}
        assert lo <= hi


# -- pack_sequences fold ≡ DuckDB recursive CTE on arbitrary token lists ------
#
# No Spark: the greedy fold is replicated here exactly as the pandas UDF
# runs it (packing.py:_pack), and compared against the ORACLE SQL evaluated
# by DuckDB on the same rows — zeros, oversize items, and boundary fills
# included. Spark-side integration is covered by the driver oracle row.


def _python_greedy_fold(toks: list[int], budget: int) -> list[int]:
    pack_ids = []
    pack, fill = 0, 0
    for i, tok in enumerate(toks):
        if i > 0 and fill + tok > budget:
            pack += 1
            fill = 0
        fill += tok
        pack_ids.append(pack)
    return pack_ids


@given(
    st.lists(
        st.integers(min_value=0, max_value=700), min_size=1, max_size=40
    ),
    st.integers(min_value=1, max_value=600),
)
@settings(max_examples=60, deadline=None)
def test_pack_fold_matches_recursive_cte(toks, budget):
    import duckdb

    from vectordb_etl_spark.operators.packing import pack_sequences_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, n_tokens BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(toks))
    )
    sql = pack_sequences_sql(
        "t", id_expr="doc_id", token_expr="n_tokens",
        budget=budget, buckets=1, out_id="doc_id",
    )
    oracle = {
        int(i): int(p) for i, _, p, _ in con.execute(sql).fetchall()
    }
    con.close()
    got = _python_greedy_fold(toks, budget)
    assert {i: p for i, p in enumerate(got)} == oracle


# -- chunk_text_sql ≡ chunk_text over random separator-rich texts ------------
#
# The DuckDB restatement of the C1-C4 splitter (chunker.chunk_text_sql) is
# the one non-trivial SQL artifact whose correctness is structural, not a
# formula — property-test it against the Python kernel on adversarial
# random documents built FROM the separator alphabet itself, so split
# boundaries, cascade descent, overlap carry-back, and small-merge all get
# fuzzed. One DuckDB run per example batch keeps this fast.

_CHUNK_ATOMS = st.sampled_from(
    ["word", "x" * 40, "Y", "\n", "\n\n", "\n\n\n", ". ", "? ", "! ",
     "; ", ", ", " ", "longtoken" * 12]
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_CHUNK_ATOMS, min_size=0, max_size=220))
def test_chunk_text_sql_matches_python_random(atoms):
    import duckdb

    from vectordb_etl_spark.config import ChunkerConfig
    from vectordb_etl_spark.operators.chunker import chunk_text, chunk_text_sql

    text = "".join(atoms)
    cfg = ChunkerConfig()
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, source VARCHAR, text VARCHAR)")
    con.execute("INSERT INTO docs VALUES (0, 's', ?)", [text])
    rows = con.execute(
        chunk_text_sql("SELECT doc_id, source, text FROM docs")
        + " ORDER BY chunk_index"
    ).fetchall()
    got = [r[4] for r in rows]
    assert got == chunk_text(text, cfg)


@given(
    st.integers(5, 60),
    st.integers(2, 8),
    st.integers(0, 10_000),
)
@settings(max_examples=25, deadline=None)
def test_hnsw_full_ef_is_exact_on_random_corpora(n, dim, seed):
    """For ANY corpus shape/size/seed: level-0 stays connected and
    bidirectional, and hnsw_search at ef >= n returns exactly the
    brute-force ranking (score desc, position asc) — the randomized twin
    of the deterministic exact-edge test."""
    import numpy as np

    from vectordb_etl_spark.operators.graph_ann import (
        _normalize_rows,
        build_hnsw,
        hnsw_levels,
        hnsw_search,
    )

    rng = np.random.RandomState(seed)
    mat = _normalize_rows(rng.standard_normal((n, dim)))
    levels = hnsw_levels(np.arange(n), m=4)
    adjs, entry = build_hnsw(mat, levels, m=4, ef_construction=8)
    # bidirectional at every level; level 0 connected
    for adj in adjs:
        for i, nbrs in enumerate(adj):
            for j in nbrs:
                assert i in adj[j]
    seen, stack = {0}, [0]
    while stack:
        for j in adjs[0][stack.pop()]:
            if j not in seen:
                seen.add(j)
                stack.append(j)
    assert len(seen) == n
    q = _normalize_rows(rng.standard_normal((1, dim)))[0]
    got = [nd for _, nd in hnsw_search(mat, adjs, entry, q, ef=n)]
    # per-row dots, NOT mat @ q: BLAS gemv may sum in a different order
    # than the search's row-wise dot, and the tie rule needs exact floats
    scores = [float(mat[i] @ q) for i in range(n)]
    want = sorted(range(n), key=lambda i: (-scores[i], i))
    assert got == want


@given(
    st.integers(min_value=2, max_value=60),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=7),  # mask stride: ~14-100% pass
)
@settings(max_examples=25, deadline=None)
def test_filtered_full_beam_is_exact_filtered_ranking(n, m, seed, stride):
    # ACORN invariant (r10): with ef >= n, the allowed-mask beam must
    # return exactly the brute-force ranking RESTRICTED to allowed nodes
    # — for any graph, any query, any mask — and with an all-True mask it
    # must equal the unfiltered beam result including eval counts.
    import numpy as np

    from vectordb_etl_spark.operators.graph_ann import (
        _normalize_rows,
        beam_search,
        build_nsw,
    )

    rng = np.random.RandomState(seed)
    mat = _normalize_rows(rng.standard_normal((n, 8)))
    adj = build_nsw(mat, m=m, ef_construction=4 * m)
    q = rng.standard_normal(8)
    q = q / np.linalg.norm(q)
    allowed = np.zeros(n, dtype=bool)
    allowed[::stride] = True
    got = [node for _, node in beam_search(mat, adj, q, ef=n, allowed=allowed)]
    scores = mat @ q
    want = sorted(
        (i for i in range(n) if allowed[i]), key=lambda i: (-scores[i], i)
    )
    assert got == want
    s_none, s_all = {}, {}
    r_none = beam_search(mat, adj, q, ef=max(2, n // 2), stats=s_none)
    r_all = beam_search(
        mat, adj, q, ef=max(2, n // 2), stats=s_all,
        allowed=np.ones(n, dtype=bool),
    )
    assert r_none == r_all and s_none["evals"] == s_all["evals"]


# --------------------------------------------------------------------------
# Dynamic meta fold round-trip (enable_dynamic_field parity): ANY set of
# extra columns folds into the map and reads back exactly, regardless of
# names/types/null patterns, with an optional pre-existing meta merged
# under typed-column precedence
# --------------------------------------------------------------------------

_IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s not in ("meta", "doc_id")
)
_VAL = st.one_of(
    st.none(),
    st.integers(min_value=-10**9, max_value=10**9),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0xD7FF),
        max_size=12,
    ),
)


@given(
    extras=st.dictionaries(_IDENT, _VAL, min_size=0, max_size=5),
    pre_meta=st.one_of(
        st.none(),
        st.dictionaries(
            _IDENT, st.text(max_size=6), min_size=0, max_size=3
        ),
    ),
)
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fold_dynamic_meta_roundtrip_property(spark, extras, pre_meta):
    from pyspark.sql.types import (
        LongType, MapType, StringType, StructField, StructType,
    )

    from vectordb_etl_spark.store.collections import fold_dynamic_meta

    fields = [StructField("doc_id", LongType())]
    for k, v in extras.items():
        fields.append(
            StructField(k, LongType() if isinstance(v, int) else StringType())
        )
    fields.append(StructField("meta", MapType(StringType(), StringType())))
    df = spark.createDataFrame(
        [tuple([1] + list(extras.values()) + [pre_meta])],
        StructType(fields),
    )
    got = fold_dynamic_meta(df).collect()[0]["meta"]
    want = dict(pre_meta or {})
    for k, v in extras.items():  # typed columns win on collision
        want[k] = None if v is None else str(v)
    assert got == want
