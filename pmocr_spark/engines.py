"""Pluggable OCR engine adapters — pmOCR's OCR_ENGINE switch.

pmOCR selects its engine at config time (OCR_ENGINE=tesseract3|abbyyocr11,
pmocr.sh:1825-1852 SetOCREngineOptions) and every conversion call then
routes through the selected binary. The Spark-native analog: an engine is
a per-blob decode callable `bytes -> str`; the selected one travels in
the fused pandas-UDF closure (udfs.make_ocr_extract), so the whole
M1->M2->M3 chain runs batched under whichever engine is picked, with the
same error-as-data / time-budget semantics for every engine.

Engines:

- ``codec`` (default): the deterministic synthetic codec
  (pmocr_spark.codecs). It is the CORRECTNESS engine — decode(encode(x))
  == x makes every pipeline output oracle-checkable, which no real OCR
  engine can offer. Always available.
- ``tesseract``: real OCR via pytesseract + Pillow (guarded import —
  neither ships in this container, matching the build brief's stub
  policy). Point the CLI at real scanned TIFF/PNG blob bytes with
  ``--engine tesseract`` and each media span is rasterized by Pillow and
  recognized by the tesseract binary. Requires pytesseract, Pillow and
  the tesseract executable on EVERY executor (ship via your cluster
  image; pmOCR has the same per-host requirement for its engines).

``register_engine`` lets deployments (and tests) plug in any other
engine without touching pipeline code — the test suite registers a fake
engine and drives the full CLI through it.
"""

from __future__ import annotations

from collections.abc import Callable

#: name -> zero-arg factory returning the per-blob decode callable.
#: The factory runs ONCE driver-side (import guards fire early, at CLI
#: parse time, not deep inside an executor task); the returned callable
#: must be picklable into the UDF closure (top-level functions and
#: closures over imported modules both are, via cloudpickle).
_ENGINES: dict[str, Callable[[], Callable[[bytes], str]]] = {}


def register_engine(name: str, factory: Callable[[], Callable[[bytes], str]]) -> None:
    """Register/replace an engine adapter under `name`."""
    _ENGINES[name] = factory


def engine_names() -> list[str]:
    return sorted(_ENGINES)


def decode_fn_for(name: str) -> Callable[[bytes], str]:
    """Resolve an engine name to its per-blob decode callable, running
    the factory's import guard now (fail fast, driver-side)."""
    try:
        factory = _ENGINES[name]
    except KeyError:
        raise ValueError(
            f"unknown OCR engine {name!r}; available: {', '.join(engine_names())}"
        ) from None
    return factory()


def fallback_decode(names: list[str]) -> Callable[[bytes], str]:
    """Engine FALLBACK CHAIN: try each engine in order per blob, return
    the first success; if every engine fails, raise one error carrying
    each engine's failure (the error-as-data wrapper turns it into the
    row's error struct). pmOCR retries a failed conversion with the
    SAME engine and then quarantines (pmocr.sh:926-987, 2103-2108);
    the chain is the production extension — a cheap/fast primary with
    a slower, more robust secondary ('tesseract,codec') — at zero plan
    cost: the chain lives inside the one fused UDF closure, so a
    fallback decode never re-shuffles or re-reads the blob, and the
    per-blob time budget covers the WHOLE chain (a runaway primary
    cannot launder extra wall-clock through its fallback).

    All factories resolve NOW, driver-side — a chain naming an
    unavailable engine fails at CLI parse time, not mid-job on an
    executor."""
    fns = [(n, decode_fn_for(n)) for n in names]

    def decode(blob: bytes) -> str:
        errs = []
        for n, fn in fns:
            try:
                return fn(blob)
            except Exception as e:  # noqa: BLE001 — try the next engine
                errs.append(f"{n}: {type(e).__name__}: {e}")
        raise RuntimeError(
            f"all {len(fns)} engines failed — " + " | ".join(errs)
        )

    return decode


def ocr_udf_for(name: str, **udf_kwargs):
    """The selected engine as the pipeline's fused extraction UDF
    (udfs.make_ocr_extract with this engine's decode_fn); pass the
    result as run_batch/monitor's `ocr_udf`. A comma-separated `name`
    ('tesseract,codec') builds a fallback_decode chain."""
    from .udfs import make_ocr_extract

    names = [n.strip() for n in name.split(",") if n.strip()]
    if not names:
        raise ValueError(f"no engine named in {name!r}")
    fn = decode_fn_for(names[0]) if len(names) == 1 else fallback_decode(names)
    return make_ocr_extract(decode_fn=fn, **udf_kwargs)


def _codec_factory() -> Callable[[bytes], str]:
    from . import codecs

    return codecs.decode_blob


def _tesseract_factory() -> Callable[[bytes], str]:
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "engine 'tesseract' needs pytesseract + Pillow (and the "
            "tesseract binary) installed on the driver and every "
            "executor; this container ships neither — use the default "
            "'codec' engine here, or run on a cluster image that "
            "bundles them (pmOCR's engines have the same per-host "
            "install requirement, pmocr.sh:1825-1852)"
        ) from e

    def decode(blob: bytes) -> str:
        import io

        import pytesseract
        from PIL import Image

        img = Image.open(io.BytesIO(blob))
        pages = []
        for frame in range(getattr(img, "n_frames", 1)):
            img.seek(frame)
            pages.append(pytesseract.image_to_string(img).strip())
        return "\n".join(pages)

    return decode


register_engine("codec", _codec_factory)
register_engine("tesseract", _tesseract_factory)
