"""OCR provider SPI (§2.10) — pluggable extraction backends.

Mirrors the reference provider architecture:

* ``OcrProvider`` interface (reference
  ocrprocessing/provider/OcrProvider.java:1-85): extract, supports(mime),
  availability, max file size.
* Registry + availability-gated lookup + ordered fallback
  (ocrprocessing/provider/OcrProviderFactory.java:22-34,54-88,108-135).
* Failure-as-result semantics: a provider error produces an error result
  row, never an exception that kills the batch
  (TesseractOcrProvider.java:102-119).

Real engines (Tesseract, Google Vision) are not installable in this
environment; ``TesseractProvider``/``VisionProvider`` are import-gated
stubs with the real actor-side plumbing, and ``FakeOcrProvider`` is the
deterministic test engine (FIXTURES.md: ``ocr(sha256(media_ref)[:12])``).

Providers are instantiated once per actor in the OCR stage's ``__init__``
(the reference wastefully re-instantiates Tesseract per request,
TesseractOcrProvider.java:210-228 — fixed here by construction).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

POISON_MARKER = "s3://corpus/POISON"

IMAGE_MIMES = frozenset({"image/gif", "image/jpeg", "image/png", "image/jpg"})
PDF_MIME = "application/pdf"


class OcrError(RuntimeError):
    """Provider-level extraction failure."""


@dataclass
class OcrOutput:
    text: str | None
    confidence: float | None
    language: str | None
    success: bool
    error_message: str | None = None


class OcrProvider:
    """Provider protocol. Subclass & register; see FakeOcrProvider."""

    name = "base"
    max_file_size_bytes = 10 * 1024 * 1024  # OcrProperties.java:44-47
    # True => the provider holds a heavyweight warm engine/client and the
    # pipeline schedules it on a dedicated actor pool; False => worker-cached
    # task execution suffices (see stages.ocr_task).
    requires_warm_state = True

    def is_available(self) -> bool:
        return True

    def supports(self, mime_type: str | None) -> bool:
        return mime_type in IMAGE_MIMES or mime_type == PDF_MIME

    def extract(self, media_ref: str, language: str | None = None) -> str:
        """Return extracted text for one media object; raise OcrError on failure."""
        raise NotImplementedError

    def extract_batch(self, media_refs: list[str], language: str | None = None) -> list[OcrOutput]:
        """Batched extraction with failure-as-result semantics."""
        out: list[OcrOutput] = []
        for ref in media_refs:
            try:
                text = self.extract(ref, language)
                out.append(OcrOutput(text, 1.0, language or "eng", True))
            except Exception as exc:  # noqa: BLE001 — poison rows must not kill the task
                out.append(OcrOutput(None, None, None, False, f"{type(exc).__name__}: {exc}"))
        return out


def fake_confidence_bp(media_ref: str) -> int:
    """Deterministic per-ref confidence in basis points, [9000, 9999].

    Mirrors the reference's per-result confidence (OcrResult.java:34-41;
    Vision mean-block confidence GoogleVisionOcrProvider.java:273-304) with
    a deterministic derivation so oracles can recompute it exactly.
    """
    h = hashlib.sha256(media_ref.encode("utf-8")).hexdigest()
    return 9000 + int(h[:3], 16) % 1000


class FakeOcrProvider(OcrProvider):
    """Deterministic test engine: ``ocr(sha256(media_ref)[:12])``.

    Raises on the poison marker so quarantine paths are exercised
    (FIXTURES.md §1; failure semantics TesseractOcrProvider.java:102-119).
    Confidence is fake_confidence_bp(ref)/10000 — deterministic, non-trivial.
    """

    name = "fake"
    requires_warm_state = False  # pure hashing; no engine to warm

    def extract(self, media_ref: str, language: str | None = None) -> str:
        if media_ref is None or POISON_MARKER in media_ref:
            raise OcrError(f"provider cannot read media: {media_ref!r}")
        digest = hashlib.sha256(media_ref.encode("utf-8")).hexdigest()[:12]
        return f"ocr({digest})"

    def extract_batch(self, media_refs: list[str], language: str | None = None) -> list[OcrOutput]:
        """Batched fast path: one digest per ref, no per-row exception
        machinery (hot stage at 10^6 OCR units per run). Output strings
        are byte-identical to the generic extract() path."""
        lang = language or "eng"
        out: list[OcrOutput] = []
        ap = out.append
        for ref in media_refs:
            if ref is None or POISON_MARKER in ref:
                ap(OcrOutput(None, None, None, False,
                             f"OcrError: provider cannot read media: {ref!r}"))
            else:
                h = hashlib.sha256(ref.encode("utf-8")).hexdigest()
                ap(OcrOutput(f"ocr({h[:12]})",
                             (9000 + int(h[:3], 16) % 1000) / 10000.0,
                             lang, True))
        return out


class TesseractProvider(OcrProvider):
    """Real-Tesseract stub: plumbing is real, engine import is gated.

    On a production image this would hold a ``tesserocr.PyTessBaseAPI``
    built once per actor (datapath/lang/psm/oem from config — reference
    OcrProperties.java:159-181).
    """

    name = "tesseract"

    def __init__(self) -> None:
        try:
            import tesserocr  # type: ignore  # noqa: F401

            self._available = True
        except ImportError:
            self._available = False

    def is_available(self) -> bool:
        return self._available

    def extract(self, media_ref: str, language: str | None = None) -> str:
        raise NotImplementedError(
            "tesserocr not available in this environment; use FakeOcrProvider"
        )


class VisionProvider(OcrProvider):
    """Google-Vision stub: warm RPC client per actor in production
    (GoogleVisionConfig.java:47-84); unavailable offline."""

    name = "google_vision"

    def is_available(self) -> bool:
        return False

    def extract(self, media_ref: str, language: str | None = None) -> str:
        raise NotImplementedError("no network access; use FakeOcrProvider")


_PROVIDER_CLASSES: dict[str, type[OcrProvider]] = {
    "fake": FakeOcrProvider,
    "tesseract": TesseractProvider,
    "google_vision": VisionProvider,
}


def register_provider(name: str, cls: type[OcrProvider]) -> None:
    _PROVIDER_CLASSES[name] = cls


class ProviderRegistry:
    """Per-actor provider map with ordered fallback.

    Mirrors OcrProviderFactory (OcrProviderFactory.java:22-34 registry,
    :108-135 ordered fallback): resolve the preferred provider; if it is
    unavailable or fails, fall back down the chain, recording
    ``fallback_from`` (OcrProcessingService.java:208-296 tag :286).
    """

    def __init__(self, preferred: str = "fake", fallback_chain: tuple[str, ...] = ("fake",),
                 max_retries: int = 1, backoff_base_s: float = 0.0,
                 sleep=None):
        """``max_retries`` = attempts per provider before falling down the
        chain (ocr.max-retries, OcrProperties.java:50-57; Vision retries 3
        RPC attempts, GoogleVisionConfig.java:56-67). Backoff between
        attempts is a deterministic exponential schedule
        ``backoff_base_s * 2^attempt`` (0 by default — no wall-clock
        dependence in tests); ``sleep`` is injectable for testing."""
        import time as _time

        self.providers: dict[str, OcrProvider] = {}
        for name in dict.fromkeys((preferred, *fallback_chain)):
            cls = _PROVIDER_CLASSES.get(name)
            if cls is not None:
                inst = cls()
                if inst.is_available():
                    self.providers[name] = inst
        self.preferred = preferred
        self.chain = [n for n in dict.fromkeys((preferred, *fallback_chain)) if n in self.providers]
        if not self.chain:
            raise OcrError(f"no available OCR provider among {preferred}, {fallback_chain}")
        self.max_retries = max(1, int(max_retries))
        self.backoff_base_s = backoff_base_s
        self._sleep = sleep or _time.sleep

    def _attempt(self, provider: OcrProvider, media_refs: list[str],
                 language: str | None) -> list[OcrOutput]:
        """One provider pass over a ref list, retried up to max_retries
        with deterministic backoff; per-ref: first success wins, else the
        last attempt's failure output is kept."""
        outputs = provider.extract_batch(media_refs, language)
        for attempt in range(1, self.max_retries):
            retry = [i for i, o in enumerate(outputs) if not o.success]
            if not retry:
                break
            if self.backoff_base_s:
                self._sleep(self.backoff_base_s * (2 ** (attempt - 1)))
            redo = provider.extract_batch([media_refs[i] for i in retry], language)
            for i, o in zip(retry, redo):
                if o.success:
                    outputs[i] = o
        return outputs

    def extract_batch(self, media_refs: list[str], language: str | None = None
                      ) -> tuple[list[OcrOutput], list[str]]:
        """Extract a batch; per-provider retry budget, then per-ref
        fallback down the chain. Returns (outputs, provider_names)."""
        outputs = self._attempt(self.providers[self.chain[0]], media_refs, language)
        names = [self.chain[0]] * len(outputs)
        for alt in self.chain[1:]:
            pending = [i for i, o in enumerate(outputs) if not o.success]
            if not pending:
                break
            alt_out = self._attempt(
                self.providers[alt], [media_refs[i] for i in pending], language)
            for i, o in zip(pending, alt_out):
                if o.success:
                    o.error_message = None
                    outputs[i] = o
                    names[i] = alt
        return outputs, names
