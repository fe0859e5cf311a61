from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_etl_spark.session import get_spark  # noqa: E402

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4, extra_conf={
        "spark.master": "local[4]",
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_tiny(spark):
    return spark.read.parquet(f"{SF_TINY}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings_tiny(spark):
    return spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
