"""OCR engine adapters (pmocr_spark.engines): pmOCR's OCR_ENGINE switch
(pmocr.sh:1825-1852 SetOCREngineOptions) as a registry of per-blob
decode callables plugged into the fused extraction UDF. Tests drive the
FULL CLI through an injected fake engine; the real tesseract adapter is
exercised when its deps exist and pinned to a clear fast failure when
they don't."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from pmocr_spark import cli, codecs, engines


def _have_tesseract() -> bool:
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        return False
    return shutil.which("tesseract") is not None


def test_registry_and_unknown_engine():
    names = engines.engine_names()
    assert "codec" in names and "tesseract" in names
    with pytest.raises(ValueError, match="unknown OCR engine"):
        engines.decode_fn_for("abbyy")


def test_codec_engine_is_the_default_codec():
    fn = engines.decode_fn_for("codec")
    blob = codecs.encode_image("hello engine", "png", salt="t")
    assert fn(blob) == "hello engine"


def test_tesseract_guarded_import():
    """Without pytesseract/Pillow the adapter must fail FAST with an
    actionable message (driver-side, not deep in an executor task)."""
    if _have_tesseract():
        pytest.skip("tesseract deps present; guarded-import path not reachable")
    with pytest.raises(RuntimeError, match="pytesseract"):
        engines.decode_fn_for("tesseract")


@pytest.mark.skipif(not _have_tesseract(), reason="pytesseract/Pillow/tesseract absent")
def test_tesseract_real_decode():  # pragma: no cover - env-dependent
    """Real-OCR smoke: render a word with Pillow, recognize it back."""
    import io

    from PIL import Image, ImageDraw

    img = Image.new("L", (220, 60), 255)
    ImageDraw.Draw(img).text((10, 10), "HELLO", fill=0)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = engines.decode_fn_for("tesseract")(buf.getvalue())
    assert "HELLO" in out.upper()


def test_cli_engine_flag_runs_injected_fake_engine(corpus_dir, tmp_path):
    """--engine routes the WHOLE batch pipeline through the selected
    adapter: a registered fake engine (codec decode + a marker suffix)
    must show up in every successfully OCR'd media span's output, and
    the poison pill must still quarantine (error-as-data is engine-
    independent)."""

    def _fake_factory():
        def decode(blob: bytes) -> str:
            return codecs.decode_blob(blob) + " [fake-engine]"

        return decode

    engines.register_engine("fake", _fake_factory)
    out, lineage = str(tmp_path / "out"), str(tmp_path / "lineage")
    cli.main(
        [
            "--batch",
            "--input", f"{corpus_dir}/documents.parquet",
            "--blobs", f"{corpus_dir}/media_blobs.parquet",
            "--output", out,
            "--lineage", lineage,
            "--targets", "txt",
            "--engine", "fake",
            "--master", "local[4]",
        ]
    )
    rows = duckdb.sql(
        f"SELECT status, txt FROM read_parquet('{out}/*.parquet')"
    ).fetchall()
    done = [t for s, t in rows if s == "done"]
    assert len(done) > 0
    # every done doc with a media span carries the fake engine's marker
    marked = [t for t in done if "[fake-engine]" in t]
    assert marked, "fake engine output never reached the txt target"
    # poison pill still fails cleanly under a custom engine
    assert any(s == "failed" for s, _t in rows)


def test_cli_unknown_engine_fails_fast(corpus_dir, tmp_path):
    with pytest.raises(ValueError, match="unknown OCR engine"):
        cli.main(
            [
                "--batch",
                "--input", f"{corpus_dir}/documents.parquet",
                "--blobs", f"{corpus_dir}/media_blobs.parquet",
                "--output", str(tmp_path / "o"),
                "--lineage", str(tmp_path / "l"),
                "--engine", "nope",
                "--master", "local[2]",
            ]
        )


def test_cli_engine_flag_service_mode(corpus_dir, tmp_path):
    """--engine also routes every service-mode monitor: a --once pass
    with the fake engine marks extracted media spans in epoch output."""
    import os
    import shutil

    def _fake_factory():
        def decode(blob: bytes) -> str:
            return codecs.decode_blob(blob) + " [fake-engine]"

        return decode

    engines.register_engine("fake2", _fake_factory)
    land = tmp_path / "land"
    os.makedirs(land)
    shutil.copy(f"{corpus_dir}/documents.parquet", land / "drop.parquet")
    cli.main(
        [
            "--service", "--once",
            "--input", str(land),
            "--blobs", f"{corpus_dir}/media_blobs.parquet",
            "--output", str(tmp_path / "out"),
            "--lineage", str(tmp_path / "lin"),
            "--stream-checkpoint", str(tmp_path / "ck"),
            "--engine", "fake2",
            "--master", "local[4]",
        ]
    )
    rows = duckdb.sql(
        f"SELECT status, txt FROM read_parquet('{tmp_path}/out/epoch-0/*.parquet')"
    ).fetchall()
    assert any("[fake-engine]" in t for s, t in rows if s == "done" and t)


def test_fallback_chain_decode():
    """fallback_decode: first success wins, later engines untouched;
    a primary failure falls through; total failure names every engine."""
    calls = []

    def _flaky_factory():
        def decode(blob: bytes) -> str:
            calls.append("flaky")
            text = codecs.decode_blob(blob)
            if "MARKER" in text:
                raise ValueError("flaky engine cannot read this")
            return "flaky:" + text

        return decode

    def _solid_factory():
        def decode(blob: bytes) -> str:
            calls.append("solid")
            return "solid:" + codecs.decode_blob(blob)

        return decode

    engines.register_engine("flaky", _flaky_factory)
    engines.register_engine("solid", _solid_factory)
    chain = engines.fallback_decode(["flaky", "solid"])

    good = codecs.encode_image("plain doc", "png", salt="a")
    assert chain(good) == "flaky:plain doc"
    assert calls == ["flaky"]  # secondary never ran

    calls.clear()
    bad_for_primary = codecs.encode_image("has MARKER inside", "png", salt="b")
    assert chain(bad_for_primary) == "solid:has MARKER inside"
    assert calls == ["flaky", "solid"]

    def _dead_factory():
        def decode(blob: bytes) -> str:
            raise RuntimeError("dead engine")

        return decode

    engines.register_engine("dead", _dead_factory)
    both = engines.fallback_decode(["dead", "flaky"])
    with pytest.raises(RuntimeError, match=r"all 2 engines failed.*dead.*flaky"):
        both(codecs.encode_image("x MARKER y", "png", salt="c"))

    # an unavailable engine anywhere in the chain fails at RESOLVE time
    with pytest.raises(ValueError, match="unknown OCR engine"):
        engines.fallback_decode(["codec", "abbyy"])


def test_cli_engine_chain(corpus_dir, tmp_path):
    """--engine a,b drives the full batch pipeline through the fallback
    chain: spans the primary rejects are recovered by the secondary,
    and the poison pill (which every engine rejects) still quarantines
    with the chain's combined error."""

    def _picky_factory():
        def decode(blob: bytes) -> str:
            text = codecs.decode_blob(blob)
            if "7" in text:  # rejects a deterministic subset
                raise ValueError("picky engine rejects 7s")
            return text + " [picky]"

        return decode

    engines.register_engine("picky", _picky_factory)
    out, lineage = str(tmp_path / "out"), str(tmp_path / "lineage")
    cli.main(
        [
            "--batch",
            "--input", f"{corpus_dir}/documents.parquet",
            "--blobs", f"{corpus_dir}/media_blobs.parquet",
            "--output", out,
            "--lineage", lineage,
            "--targets", "txt",
            "--engine", "picky,codec",
            "--master", "local[4]",
        ]
    )
    rows = duckdb.sql(
        f"SELECT status, txt FROM read_parquet('{out}/*.parquet')"
    ).fetchall()
    done = [t for s, t in rows if s == "done"]
    assert any("[picky]" in t for t in done), "primary engine never used"
    # fallback recovered the rejected spans: media text present, unmarked
    assert any("[picky]" not in t and t for t in done)
    assert any(s == "failed" for s, _t in rows)  # poison still quarantined
