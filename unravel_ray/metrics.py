"""Per-partition metrics accumulation (G8 analog, SURVEY.md §2.5/§4).

The reference tracks per-provider counters, timers and percentile
summaries via Micrometer (ocrprocessing/metrics/OcrMetrics.java:42-143).
In a batch engine those become per-partition metric dicts folded into the
lineage manifest: each stage emits mergeable partials (count/sum/min/max +
a fixed-boundary histogram that yields approximate percentiles), merged
associatively at the end — the same shape as a tree aggregate.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field

# fixed log-spaced boundaries (ms) for latency-ish distributions
DEFAULT_BOUNDS = [1, 2, 5, 10, 20, 50, 100, 200, 500, 1000, 2000, 5000, 10000]


@dataclass
class MetricPartial:
    """Mergeable summary of one numeric stream."""

    count: int = 0
    total: float = 0.0
    minimum: float = float("inf")
    maximum: float = float("-inf")
    bounds: list[float] = field(default_factory=lambda: list(DEFAULT_BOUNDS))
    buckets: list[int] = field(default_factory=lambda: [0] * (len(DEFAULT_BOUNDS) + 1))

    def observe(self, value: float) -> None:
        self.count += 1
        self.total += value
        self.minimum = min(self.minimum, value)
        self.maximum = max(self.maximum, value)
        self.buckets[bisect.bisect_right(self.bounds, value)] += 1

    def merge(self, other: "MetricPartial") -> "MetricPartial":
        assert self.bounds == other.bounds
        out = MetricPartial(bounds=list(self.bounds))
        out.count = self.count + other.count
        out.total = self.total + other.total
        out.minimum = min(self.minimum, other.minimum)
        out.maximum = max(self.maximum, other.maximum)
        out.buckets = [a + b for a, b in zip(self.buckets, other.buckets)]
        return out

    def percentile(self, q: float) -> float:
        """Histogram-approximate percentile (upper bucket bound)."""
        if self.count == 0:
            return 0.0
        target = q * self.count
        acc = 0
        for i, n in enumerate(self.buckets):
            acc += n
            if acc >= target:
                return self.bounds[i] if i < len(self.bounds) else self.maximum
        return self.maximum

    def to_dict(self) -> dict:
        return {
            "count": self.count,
            "total": round(self.total, 6),
            "min": self.minimum if self.count else None,
            "max": self.maximum if self.count else None,
            "mean": round(self.total / self.count, 6) if self.count else None,
            "p50": self.percentile(0.50),
            "p95": self.percentile(0.95),
            "p99": self.percentile(0.99),
        }


@dataclass
class StageMetrics:
    """Per-stage counter/distribution bundle (one per partition/actor)."""

    counters: dict[str, int] = field(default_factory=dict)
    distributions: dict[str, MetricPartial] = field(default_factory=dict)

    def incr(self, name: str, n: int = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + n

    def observe(self, name: str, value: float) -> None:
        self.distributions.setdefault(name, MetricPartial()).observe(value)

    def merge(self, other: "StageMetrics") -> "StageMetrics":
        out = StageMetrics(dict(self.counters), dict(self.distributions))
        for k, v in other.counters.items():
            out.counters[k] = out.counters.get(k, 0) + v
        for k, v in other.distributions.items():
            out.distributions[k] = out.distributions[k].merge(v) if k in out.distributions else v
        return out

    def to_dict(self) -> dict:
        return {
            "counters": dict(self.counters),
            "distributions": {k: v.to_dict() for k, v in self.distributions.items()},
        }
