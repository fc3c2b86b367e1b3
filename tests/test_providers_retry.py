"""Provider retry budget + fallback chain (A3 + ocr.max-retries,
OcrProperties.java:50-57; GoogleVisionConfig.java:56-67 retries Vision
RPCs 3 times before failing)."""

from unravel_ray.providers import (
    FakeOcrProvider,
    OcrOutput,
    OcrProvider,
    ProviderRegistry,
    register_provider,
)


class FlakyProvider(OcrProvider):
    """Fails the first N calls per ref, then succeeds — the transient-RPC
    model. Class-level state so registry-constructed instances share it."""

    name = "flaky"
    requires_warm_state = False
    fail_first = 2
    calls: dict[str, int] = {}

    def extract(self, media_ref, language=None):
        n = self.calls.get(media_ref, 0)
        self.calls[media_ref] = n + 1
        if n < self.fail_first:
            raise RuntimeError(f"transient error #{n} for {media_ref}")
        return f"flaky({media_ref})"


class AlwaysFails(OcrProvider):
    name = "broken"
    requires_warm_state = False

    def extract(self, media_ref, language=None):
        raise RuntimeError("permanently down")


def setup_module():
    register_provider("flaky", FlakyProvider)
    register_provider("broken", AlwaysFails)


def test_transient_failure_recovers_via_retry_not_fallback():
    FlakyProvider.calls = {}
    reg = ProviderRegistry("flaky", ("flaky", "fake"), max_retries=3)
    outs, names = reg.extract_batch(["ref-a", "ref-b"])
    assert all(o.success for o in outs)
    # served by the PREFERRED provider (retry succeeded), not the fallback
    assert names == ["flaky", "flaky"]
    assert outs[0].text == "flaky(ref-a)"
    assert FlakyProvider.calls["ref-a"] == 3  # 2 failures + 1 success


def test_retry_budget_exhausted_falls_back():
    FlakyProvider.calls = {}
    FlakyProvider.fail_first = 10  # beyond any budget
    try:
        reg = ProviderRegistry("flaky", ("flaky", "fake"), max_retries=3)
        outs, names = reg.extract_batch(["ref-x"])
        assert outs[0].success
        assert names == ["fake"]  # fell through after 3 attempts
        assert FlakyProvider.calls["ref-x"] == 3
    finally:
        FlakyProvider.fail_first = 2


def test_poison_fails_through_all_retries_and_providers():
    from unravel_ray.providers import POISON_MARKER

    reg = ProviderRegistry("fake", ("fake", "broken"), max_retries=3)
    outs, names = reg.extract_batch([POISON_MARKER, "s3://ok/img.png"])
    assert not outs[0].success
    assert "OcrError" in outs[0].error_message
    assert outs[1].success
    assert names[1] == "fake"


def test_backoff_schedule_is_deterministic_exponential():
    FlakyProvider.calls = {}
    FlakyProvider.fail_first = 3
    slept: list[float] = []
    try:
        reg = ProviderRegistry("flaky", ("flaky",), max_retries=4,
                               backoff_base_s=0.5, sleep=slept.append)
        outs, _ = reg.extract_batch(["r"])
        assert outs[0].success
        assert slept == [0.5, 1.0, 2.0]
    finally:
        FlakyProvider.fail_first = 2


def test_default_single_attempt_preserves_old_behavior():
    reg = ProviderRegistry("fake", ("fake",))
    outs, names = reg.extract_batch(["s3://x/y.png"])
    assert outs[0].success and names == ["fake"]
    assert isinstance(reg.providers["fake"], FakeOcrProvider)
    assert isinstance(outs[0], OcrOutput)
