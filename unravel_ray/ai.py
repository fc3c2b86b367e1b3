"""AI enrichment stage — summary, document type, tags (reference ``ai/``).

Mirrors the reference flow (ai/service/AiSummarizationService.java,
AiClassificationService.java): truncate input to the model cap (M11,
:165-171), call a provider behind the AiModelProvider SPI (:127-150
fallback chain), parse the LLM's JSON with fence-stripping defaults
(M12, :152-186), store tags as the reference's comma-joined string
(OcrData.aiTags) whose consumers re-split with M14 semantics
(GetOcrDataImpl.java:66-71).

No network/model in this environment: ``FakeLlmProvider`` is the
deterministic stand-in (keyword-rule document type, top-word tags); a
real client slots into the same protocol and, being heavyweight, flags
``requires_warm_state=True`` to get the actor pool.
"""

from __future__ import annotations

import collections
import json

import pyarrow as pa

from ray.data import Dataset

from .export import render_spans
from .functions import parse_llm_json, split_tags, truncate_text

MAX_INPUT_LENGTH = 4000  # ai.max-input-length analog


class LlmProvider:
    """AI model SPI (AiModelProvider analog)."""

    name = "base"
    requires_warm_state = True

    def summarize(self, text: str) -> str:
        raise NotImplementedError

    def classify(self, text: str) -> str:
        """Returns the raw model response (possibly fenced JSON)."""
        raise NotImplementedError


class FakeLlmProvider(LlmProvider):
    """Deterministic test model: summary = first 15 words; classification
    from keyword rules + two most frequent words as tags."""

    name = "fake_llm"
    requires_warm_state = False

    _TYPE_RULES = (
        ("invoice", ("invoice", "total", "amount", "payment")),
        ("report", ("report", "summary", "analysis", "findings")),
        ("letter", ("dear", "sincerely", "regards")),
    )

    def summarize(self, text: str) -> str:
        words = (text or "").split()
        head = " ".join(words[:15])
        return head + ("…" if len(words) > 15 else "")

    def classify(self, text: str) -> str:
        lower = (text or "").lower()
        doc_type = "other"
        for t, keys in self._TYPE_RULES:
            if any(k in lower for k in keys):
                doc_type = t
                break
        counts = collections.Counter(w for w in lower.split() if len(w) > 3)
        tags = [w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:2]]
        confidence = round((sum(counts.values()) % 100) / 100, 2)
        # fenced, like real model output — the parser must strip it (M12)
        return "```json\n" + json.dumps(
            {"document_type": doc_type, "tags": tags or ["unclassified"],
             "confidence": confidence}
        ) + "\n```"


class AiEnrichStage:
    """Actor/task stage: extracted rows -> ai_summary / document_type /
    ai_tags columns. Only COMPLETED docs are enriched (the reference
    requires finished OCR before AI runs); the provider is held per
    actor/worker."""

    def __init__(self, provider: LlmProvider | None = None,
                 max_input_length: int = MAX_INPUT_LENGTH):
        self.provider = provider or FakeLlmProvider()
        self.max_input_length = max_input_length

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        summaries, doc_types, tags_col, confs = [], [], [], []
        for r in rows:
            if r["status"] != "completed":
                summaries.append(None)
                doc_types.append(None)
                tags_col.append(None)
                confs.append(None)
                continue
            text = truncate_text(render_spans(r["spans"]), self.max_input_length)
            summaries.append(self.provider.summarize(text))
            parsed = parse_llm_json(self.provider.classify(text))
            doc_types.append(parsed["document_type"])
            tags_col.append(",".join(parsed["tags"]))  # stringly, like OcrData.aiTags
            confs.append(parsed["confidence"])
        return (
            batch.append_column("ai_summary", pa.array(summaries, pa.string()))
            .append_column("document_type", pa.array(doc_types, pa.string()))
            .append_column("ai_tags", pa.array(tags_col, pa.string()))
            .append_column("ai_confidence", pa.array(confs, pa.float64()))
        )


def enrich(extracted: Dataset, provider_cls: type[LlmProvider] = FakeLlmProvider,
           concurrency=2, batch_size: int = 64,
           max_input_length: int = MAX_INPUT_LENGTH) -> Dataset:
    """Enrichment pipeline entry, parameterized by the LlmProvider SPI.

    Scheduling honors ``provider_cls.requires_warm_state`` (same rule as
    the OCR stage): a heavyweight client gets a dedicated actor pool with
    the provider built once per actor; a stateless provider runs as tasks
    with a per-worker cache.
    """
    if provider_cls.requires_warm_state:
        return extracted.map_batches(
            AiEnrichStage,
            fn_constructor_kwargs={"provider": provider_cls(),
                                   "max_input_length": max_input_length},
            batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency,
        )

    def task(batch: pa.Table) -> pa.Table:
        stage = _STAGE_CACHE.get(provider_cls)
        if stage is None:
            stage = _STAGE_CACHE[provider_cls] = AiEnrichStage(
                provider_cls(), max_input_length
            )
        return stage(batch)

    return extracted.map_batches(task, batch_format="pyarrow", batch_size=batch_size)


_STAGE_CACHE: dict[type, "AiEnrichStage"] = {}


def tags_as_list(enriched: Dataset) -> Dataset:
    """Round-trip the stringly tags back to a list column (M14 consumer,
    GetOcrDataImpl.java:66-71)."""

    def split(batch: pa.Table) -> pa.Table:
        tags = [split_tags(t) for t in batch["ai_tags"].to_pylist()]
        return batch.append_column("ai_tags_list", pa.array(tags, pa.list_(pa.string())))

    return enriched.map_batches(split, batch_format="pyarrow")
