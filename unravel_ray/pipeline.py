"""Flagship extraction pipeline composition (SURVEY.md §3.1 rebuilt on Ray Data).

The reference's bulk-upload→Kafka→consumer→provider→rollup flow
(BulkDocumentUploadExtractionImpl.java:62-204 → ProcessOcr.java:57-151)
collapses into one lazy streaming Dataset plan:

    read → explode_extract (stateless tasks)
         → OcrStage (actor pool, warm providers)
         → reassembly: block-local merge + slim groupby(doc_id) verify
           (+ targeted repair), or literal groupby(hash(doc_id)%B)+sort
         → extracted
    extracted → groupby(collection_id) aggregate → rollup   # G2

Everything streams with backpressure; nothing materializes the full input.
Library code never calls ray.init() — callers own the session.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from .config import PipelineConfig
from .schema import EXTRACTED_SCHEMA
from .stages import (
    OcrStage,
    add_bucket,
    explode_extract,
    finalize_block,
    finalize_bucket,
    ocr_task,
    pack_partials,
)
from .synth import interleave_documents_batch


def _ocr_stage(units: Dataset, cfg: PipelineConfig) -> Dataset:
    """OCR stage scheduling (A1/A2):

    * providers holding heavyweight warm engines -> dedicated ACTOR POOL
      (state in __init__, cfg.ocr_concurrency x cfg.ocr_num_cpus);
    * provider chains that declare requires_warm_state=False -> task-based
      with a per-worker-process registry cache (same warm-state guarantee,
      no pool spin-up/autoscale ramp, fuses with neighboring task stages).
    cfg.ocr_compute: "auto" (above) | "actors" | "tasks".
    """
    mode = cfg.ocr_compute
    if mode == "auto":
        from .providers import _PROVIDER_CLASSES

        chain = dict.fromkeys((cfg.preferred_provider, *cfg.fallback_chain))
        warm = any(
            getattr(_PROVIDER_CLASSES.get(n), "requires_warm_state", True)
            for n in chain
        )
        mode = "actors" if warm else "tasks"
    if mode == "tasks":
        return units.map_batches(
            ocr_task,
            fn_kwargs={
                "preferred": cfg.preferred_provider,
                "fallback_chain": tuple(cfg.fallback_chain),
            },
            batch_format="pyarrow",
            batch_size=cfg.ocr_batch_size,
        )
    return units.map_batches(
        OcrStage,
        fn_constructor_kwargs={
            "preferred": cfg.preferred_provider,
            "fallback_chain": cfg.fallback_chain,
        },
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.ocr_concurrency,
        num_cpus=cfg.ocr_num_cpus,
    )


def build_extraction(ds: Dataset, cfg: PipelineConfig | None = None) -> Dataset:
    """docs (DOCS_SCHEMA) -> extracted (EXTRACTED_SCHEMA).

    Reassembly strategies (cfg.reassembly):

    * "local" (default): explode_extract keeps each doc's work units
      contiguous in one block, so reassembly is a shuffle-free per-block
      merge + in-doc sort(offset, sub). A slim groupby(doc_id) count then
      verifies no doc was split by a mid-table block cut (possible only
      when a map output exceeds target_max_block_size); any split doc is
      recomputed exactly from the source (_repair_split_docs). Net effect:
      only doc_id strings ever ride a shuffle — measured 20x faster than
      shipping span payloads through Ray's sort (16 MB/s) at equal output.

    * "shuffle": the literal pack -> groupby(hash(doc_id)%B) ->
      sort-within-group restore. Payload-heavy but layout-independent;
      kept for comparison and as a fallback.
    """
    cfg = cfg or PipelineConfig()
    units = ds.map_batches(
        explode_extract, batch_format="pyarrow", batch_size=cfg.explode_batch_size
    )
    ocred = _ocr_stage(units, cfg)
    if cfg.reassembly == "shuffle":
        packed = ocred.map_batches(pack_partials, batch_format="pyarrow", batch_size=None)
        bucketed = packed.map_batches(
            add_bucket, fn_kwargs={"n_buckets": cfg.reassemble_buckets},
            batch_format="pyarrow",
        )
        return bucketed.groupby("bucket").map_groups(
            finalize_bucket, batch_format="pyarrow"
        )
    extracted = ocred.map_batches(finalize_block, batch_format="pyarrow", batch_size=None)
    if cfg.verify_colocation:
        extracted = _repair_split_docs(ds, extracted, cfg)
    return extracted


def _repair_split_docs(docs: Dataset, extracted: Dataset, cfg: PipelineConfig) -> Dataset:
    """Correctness net for local reassembly: find doc_ids that produced >1
    output row (split across blocks), recompute exactly those docs from the
    source in a single block, and splice them in. The check shuffles ONLY
    the doc_id column (slim); in the common case the dup set is empty and
    the output passes through untouched.

    In checkpointed runs the same check runs against the written partition
    (see checkpoint.py), so nothing extra materializes at scale; here the
    output is pinned once (it is the final result being handed back).
    """
    extracted = extracted.materialize()
    counts = (
        extracted.select_columns(["doc_id"]).groupby("doc_id").count()
    )
    dup_rows = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)), batch_format="pyarrow"
    ).take_all()
    if not dup_rows:
        return extracted
    dup_ids = {r["doc_id"] for r in dup_rows}
    import ray

    ref = ray.put(frozenset(dup_ids))

    def drop_dups(t: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        mask = pa.array([d not in bad for d in t["doc_id"].to_pylist()], pa.bool_())
        return t.filter(mask)

    def keep_dups(t: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        mask = pa.array([d in bad for d in t["doc_id"].to_pylist()], pa.bool_())
        return t.filter(mask)

    clean = extracted.map_batches(drop_dups, batch_format="pyarrow")
    redo_src = docs.map_batches(keep_dups, batch_format="pyarrow").repartition(1)
    redo_units = redo_src.map_batches(
        explode_extract, batch_format="pyarrow", batch_size=cfg.explode_batch_size
    )
    redo = _ocr_stage(redo_units, cfg).map_batches(
        finalize_block, batch_format="pyarrow", batch_size=None
    )
    return clean.union(redo)


def build_rollup(extracted: Dataset) -> Dataset:
    """Collection status roll-up (G2, ProcessOcr.java:185-217).

    Partial aggregation first: indicator columns inside map_batches, then a
    small groupby-sum — no raw-row shuffle of span payloads.
    """

    def indicators(batch: pa.Table) -> pa.Table:
        status = batch["status"]
        completed = pc.cast(pc.equal(status, "completed"), pa.int64())
        failed = pc.cast(
            pc.is_in(status, value_set=pa.array(
                ["failed", "failed_validation", "failed_storage"])),
            pa.int64(),
        )
        pending = pc.cast(
            pc.invert(
                pc.is_in(
                    status,
                    value_set=pa.array(
                        ["completed", "failed", "failed_validation", "failed_storage"]),
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "collection_id": batch["collection_id"],
                "completed": completed,
                "failed": failed,
                "pending": pending,
            }
        )

    agg = (
        extracted.map_batches(indicators, batch_format="pyarrow")
        .groupby("collection_id")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("completed", alias_name="n_completed"),
            Sum("failed", alias_name="n_failed"),
            Sum("pending", alias_name="n_pending"),
        )
    )

    def decide(batch: pa.Table) -> pa.Table:
        n, comp, fail = batch["n_docs"], batch["n_completed"], batch["n_failed"]
        terminal = pc.add(comp, fail)
        status = pc.if_else(
            pc.equal(comp, n),
            pa.scalar("processed"),
            pc.if_else(pc.equal(terminal, n), pa.scalar("failed_ocr"),
                       pa.scalar("processing")),
        )
        return batch.append_column("collection_status", status)

    return agg.map_batches(decide, batch_format="pyarrow")


def read_docs_corpus(path: str) -> Dataset:
    """Read an interleaved docs table from parquet (the Lance-analog store)."""
    return ray.data.read_parquet(path)


def documents_to_docs(sf_dir: str, cfg: PipelineConfig | None = None) -> Dataset:
    """Driver testdata bridge: documents.parquet -> interleaved DOCS rows.

    The testdata files are single-row-group parquet => one read block; the
    repartition splits it so the python-heavy bridge (and everything fused
    after it) parallelizes instead of running on one task.
    """
    cfg = cfg or PipelineConfig()
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).repartition(32)
    return ds.map_batches(
        interleave_documents_batch, fn_kwargs={"seed": cfg.seed},
        batch_format="pyarrow",
    )


def run_flagship(sf_dir: str, cfg: PipelineConfig | None = None) -> Dataset:
    """documents.parquet -> interleave -> extract; the entry() pipeline."""
    cfg = cfg or PipelineConfig()
    return build_extraction(documents_to_docs(sf_dir, cfg), cfg)


def extracted_schema() -> pa.Schema:
    return EXTRACTED_SCHEMA
