from unravel_ray.metrics import MetricPartial, StageMetrics


def test_partial_merge_equals_single_stream():
    a, b, c = MetricPartial(), MetricPartial(), MetricPartial()
    for v in (1, 3, 7, 150):
        a.observe(v)
        c.observe(v)
    for v in (900, 4, 60):
        b.observe(v)
        c.observe(v)
    m = a.merge(b)
    assert m.count == c.count == 7
    assert m.total == c.total
    assert m.minimum == 1 and m.maximum == 900
    assert m.buckets == c.buckets
    assert m.percentile(0.5) == c.percentile(0.5)


def test_stage_metrics_merge():
    s1, s2 = StageMetrics(), StageMetrics()
    s1.incr("ok", 3)
    s2.incr("ok")
    s2.incr("failed")
    s1.observe("latency_ms", 12)
    s2.observe("latency_ms", 480)
    m = s1.merge(s2)
    assert m.counters == {"ok": 4, "failed": 1}
    d = m.to_dict()["distributions"]["latency_ms"]
    assert d["count"] == 2 and d["max"] == 480
