"""Posting-list compression (operators/postings.py): LEB128 codec vs a
pure-python reference, encode∘decode identity through Spark, block
independence (gaps reset at block bases), exact size arithmetic parity
between compressed_stats and the physical payloads, and the
compression win vs raw 8-byte ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmocr_spark.operators.postings import (
    BLOCK_BITS,
    _decode_leb128,
    _encode_leb128,
    compressed_stats,
    decode_postings,
    encode_postings,
    posting_gaps,
)


def test_leb128_roundtrip_and_lengths():
    vals = [0, 1, 127, 128, 300, 16383, 16384, 2**21 - 1, 2**21, 2**35, 2**56]
    payload = _encode_leb128(vals)
    assert _decode_leb128(payload) == vals
    # one byte per started 7-bit group
    assert len(_encode_leb128([127])) == 1
    assert len(_encode_leb128([128])) == 2
    assert len(_encode_leb128([16384])) == 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


ROWS = [
    (0, "alpha beta gamma"),
    (5, "alpha beta"),
    (70000, "alpha delta"),  # second 2^16 block for 'alpha'
    (70001, "alpha"),
    (131072, "alpha"),  # third block, exactly on the base
]


def test_gaps_reset_at_block_bases(spark):
    g = {
        (r.term, r.doc_id): (r.block, r.gap)
        for r in posting_gaps(_docs(spark, ROWS)).collect()
        if r.term == "alpha"
    }
    assert g[("alpha", 0)] == (0, 1)  # base -1 -> gap 1
    assert g[("alpha", 5)] == (0, 5)
    assert g[("alpha", 70000)] == (1, 70000 - (1 << BLOCK_BITS) + 1)
    assert g[("alpha", 70001)] == (1, 1)
    assert g[("alpha", 131072)] == (2, 1)  # block base exactly


def test_encode_decode_identity(spark):
    docs = _docs(spark, ROWS)
    want = {
        (r.term, r.doc_id)
        for r in docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
            "doc_id",
        ).collect()
    }
    got = {
        (r.term, r.doc_id)
        for r in decode_postings(encode_postings(docs)).collect()
    }
    assert got == want


def test_stats_match_physical_payload_bytes(spark):
    docs = _docs(spark, ROWS)
    stats = {
        r.term: (r.n_postings, r.n_bytes) for r in compressed_stats(docs).collect()
    }
    phys = (
        encode_postings(docs)
        .groupBy("term")
        .agg(
            F.sum("n_postings").alias("np"),
            F.sum(F.length("payload")).alias("nb"),
        )
        .collect()
    )
    for r in phys:
        assert stats[r.term] == (r.np, r.nb), r.term


def test_compression_beats_raw_ids(spark):
    # clustered ids -> small gaps -> ~1 byte per posting vs 8 raw
    rows = [(i, "term") for i in range(0, 4000, 2)]
    st = compressed_stats(_docs(spark, rows)).collect()[0]
    assert st.n_postings == 2000
    assert st.n_bytes < 2000 * 2  # every gap is 2 -> 1 byte each (+block starts)


def test_compress_postings_cli(spark, tmp_path, capsys):
    """--compress-postings maintenance mode: compressed index rows with
    the expected schema, decode round-trip count verified by the
    command itself, exclusivity validation."""
    import pytest

    from pmocr_spark import cli

    _docs(spark, ROWS).write.parquet(str(tmp_path / "docs"))
    out = str(tmp_path / "pidx")
    cli.main(["--compress-postings", "--input", str(tmp_path / "docs"),
              "--output", out, "--master", "local[4]"])
    idx = spark.read.parquet(out)
    assert set(idx.columns) == {"term", "block", "n_postings", "payload"}
    assert "round-trip ok" in capsys.readouterr().out
    got = {
        (r.term, r.doc_id) for r in decode_postings(idx).collect()
    }
    assert ("alpha", 131072) in got and len(got) == 9

    with pytest.raises(SystemExit):
        cli.parse_args(["--compress-postings", "--input", "x"])  # no output
    with pytest.raises(SystemExit):
        cli.parse_args(["--compress-postings", "--batch", "--input", "x",
                        "--output", "o"])
