"""Pipeline runner (M7) end-to-end: extract→transform→load→validate→search
over a temp HTML tree, plus CLI smoke via the same SparkSession-free parser."""

from __future__ import annotations

import pytest

from vectordb_etl_spark.cli import build_parser, create_config
from vectordb_etl_spark.config import (
    ChunkerConfig,
    EmbeddingConfig,
    PipelineConfig,
    StoreConfig,
)
from vectordb_etl_spark.pipeline import PipelineRunner

PAGE = """<html><head><title>{title}</title></head><body>
<h1>{title}</h1>
{paras}
</body></html>"""


@pytest.fixture(scope="module")
def input_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("input")
    for folder, lang_text in [
        ("hr", "Employee handbook section about vacation policy and benefits. "),
        ("eng", "Engineering onboarding guide with setup instructions. "),
    ]:
        d = root / folder
        d.mkdir()
        for i in range(3):
            paras = "".join(
                f"<p>{lang_text * 8} Document {folder}-{i} paragraph {j}.</p>"
                for j in range(4)
            )
            (d / f"doc{i}.html").write_text(
                PAGE.format(title=f"{folder} doc {i}", paras=paras), encoding="utf-8"
            )
    # a duplicate page to exercise dedup
    (root / "hr" / "dup.html").write_text(
        (root / "hr" / "doc0.html").read_text(), encoding="utf-8"
    )
    return root


@pytest.fixture(scope="module")
def runner(spark, input_tree, tmp_path_factory):
    work = tmp_path_factory.mktemp("work")
    cfg = PipelineConfig(
        input_dir=str(input_tree),
        checkpoint_dir=str(work / "ckpt"),
        chunker=ChunkerConfig(),
        embedding=EmbeddingConfig(dimension=32),
        store=StoreConfig(warehouse_dir=str(work / "warehouse")),
    )
    return PipelineRunner(spark, cfg)


def test_full_pipeline_stages(runner):
    ext = runner.extract()
    assert ext.rows == 7  # 6 docs + 1 dup

    tr = runner.transform()
    assert tr.rows > 0
    chunks = runner.spark.read.parquet(runner.chunks_path)
    assert {"chunk_id", "chunk_index", "total_chunks", "chunk_size_chars",
            "chunk_size_tokens"} <= set(chunks.columns)
    # dup.html's chunks must have been deduplicated away (same text as doc0)
    per_doc = chunks.groupBy("filename").count().collect()
    assert {r["filename"] for r in per_doc} <= {f"doc{i}.html" for i in range(3)} | {"dup.html"}

    ld = runner.load()
    assert set(ld.extra["collections"]) == {"html_hr", "html_eng"}
    assert sum(ld.extra["collections"].values()) == tr.rows

    val = runner.validate()
    assert val.rows == tr.rows
    assert val.extra["language_distribution"]

    hits = runner.search("vacation policy handbook", k=3)
    assert len(hits) == 3
    assert all(h.score is not None for h in hits)
    assert "vacation" in hits[0].text.lower()


def test_search_scoped_to_collection(runner):
    hits = runner.search("setup instructions", k=2, collection="html_eng")
    assert hits and all(
        h.metadata.get("collection") == "html_eng" for h in hits
    )


def test_reset_requires_confirm(runner):
    with pytest.raises(ValueError):
        runner.reset(confirm=False)


def test_cli_config_plumbing():
    args = build_parser().parse_args(
        ["--stage", "all", "--kind", "hwp", "--chunk-size", "200",
         "--warehouse", "/tmp/w", "--dimension", "64"]
    )
    cfg = create_config(args)
    assert cfg.chunker.chunk_size == 200
    assert cfg.store.collection_prefix == "hwp"
    assert cfg.store.warehouse_dir == "/tmp/w"
    assert cfg.embedding.dimension == 64


def test_curate_stage_and_load_prefers_curated(runner):
    # The fixture corpus is template-generated, so near-identical paragraphs
    # across docs are true near-dups the transitive pass must collapse;
    # load must then pick up curated.parquet instead of raw chunks.
    from pathlib import Path

    if not Path(runner.chunks_path).exists():  # allow -k selection to run solo
        runner.extract()
        runner.transform()
    tr_rows = runner.spark.read.parquet(runner.chunks_path).count()
    cur = runner.curate(sample_fractions=None)
    assert cur.rows < tr_rows
    assert cur.extra["removed_rows"] == tr_rows - cur.rows
    ld = runner.load()
    assert sum(ld.extra["collections"].values()) == cur.rows


def test_load_skips_stale_curated(runner):
    # re-running transform AFTER curate makes curated.parquet stale; load
    # must warn and fall back to the fresh chunks checkpoint (the run_all
    # extract→transform→load path would otherwise resurrect old data).
    import time as _time
    from pathlib import Path

    # self-contained setup (no dependence on earlier tests in this module):
    # ensure documents/chunks checkpoints and a curated.parquet exist
    if not Path(runner.documents_path).exists():
        runner.extract()
    if not Path(runner.chunks_path).exists():
        runner.transform()
    if not Path(runner.curated_path).exists():
        runner.curate(sample_fractions=None)

    _time.sleep(1.1)  # ensure a strictly newer mtime on the chunks commit
    tr = runner.transform()
    assert runner._ckpt_mtime(runner.chunks_path) > runner._ckpt_mtime(
        runner.curated_path
    )
    with pytest.warns(UserWarning, match="predates"):
        ld = runner.load()
    assert sum(ld.extra["collections"].values()) == tr.rows
    # explicit override still loads curated
    ld2 = runner.load(use_curated=True)
    cur_rows = runner.spark.read.parquet(runner.curated_path).count()
    assert sum(ld2.extra["collections"].values()) == cur_rows


def test_cli_curate_stage_parses():
    args = build_parser().parse_args(
        ["--stage", "curate", "--sample-fractions", '{"english": 0.5}',
         "--length-band", "0.01,0.99", "--boilerplate-max-frac", "0.5",
         "--substring-dup-max-frac", "0.4"]
    )
    assert args.stage == "curate"
    import json as _json

    assert _json.loads(args.sample_fractions) == {"english": 0.5}
    assert args.length_band == "0.01,0.99"
    assert args.boilerplate_max_frac == 0.5
    assert args.substring_dup_max_frac == 0.4


def test_curate_screens_length_band_and_boilerplate(runner):
    from pathlib import Path

    if not Path(runner.chunks_path).exists():
        runner.extract()
        runner.transform()
    base = runner.curate(near_dup=False, redact_pii=False)
    # a tight length band must drop the extreme-length chunks that survive
    # the no-screen run
    banded = runner.curate(
        near_dup=False, redact_pii=False, length_band=(0.10, 0.90)
    )
    assert banded.rows < base.rows
    # the fixture corpus is template-generated, so cross-doc shared shingles
    # are plentiful: an aggressive boilerplate cap must remove chunks too
    screened = runner.curate(
        near_dup=False, redact_pii=False, boilerplate_max_frac=0.2
    )
    assert screened.rows < base.rows
    # the template corpus repeats exact 40-char spans across docs, so the
    # Lee-et-al. substring screen must also remove chunks
    sub = runner.curate(
        near_dup=False, redact_pii=False, substring_dup_max_frac=0.2
    )
    assert sub.rows < base.rows
    # a no-op band keeps everything (inclusive bounds at 0/1)
    noop = runner.curate(
        near_dup=False, redact_pii=False, length_band=(0.0, 1.0)
    )
    assert noop.rows == base.rows


def test_search_with_filter_string(runner):
    from pathlib import Path

    if not Path(runner.chunks_path).exists():
        runner.extract()
        runner.transform()
        runner.load()
    hits = runner.search(
        "handbook", k=2, filter='language == "english" and chunk_index >= 0'
    )
    assert hits and all(h.metadata["language"] == "english" for h in hits)


def test_cli_filter_arg_parses():
    args = build_parser().parse_args(
        ["--stage", "search", "--query", "x", "--filter", 'language == "korean"']
    )
    assert args.filter == 'language == "korean"'
