from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from pmocr_spark.session import get_spark

    s = get_spark(app="pmocr_tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir():
    d = tempfile.mkdtemp(prefix="pmocr_corpus_")
    from pmocr_spark import corpus

    corpus.write(d, n_docs=120, seed=42)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def expected(corpus_dir):
    import pyarrow.parquet as pq

    from pmocr_spark import corpus

    docs = pq.read_table(f"{corpus_dir}/documents.parquet")
    blobs = pq.read_table(f"{corpus_dir}/media_blobs.parquet")
    return corpus.reference_convert(docs, blobs)
