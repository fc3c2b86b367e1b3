"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

No reference analog (the reference delegates text understanding to OCR
providers and an LLM); these are the large-scale-pipeline extensions.
All stages are batch transforms; the language profiles / regexes are
compiled once per actor (`__init__`), not per batch.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

# Tiny deterministic stopword profiles — enough for a frequency heuristic.
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "de", "que", "por", "para"},
}

# BPE-ish tokenizer: word pieces OR single non-space punctuation.
TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


class LangIdStage:
    """n-gram/stopword language heuristic; profiles built once per actor."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zA-ZäöüßéèêàçñáíóúÄÖÜ]+")
        self.profiles = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def detect(self, text: str) -> tuple[str, float]:
        words = [w.lower() for w in self.word_re.findall(text or "")]
        if not words:
            return "und", 0.0  # undetermined
        best, best_hits = "und", 0
        for lang, prof in self.profiles.items():
            hits = sum(1 for w in words if w in prof)
            if hits > best_hits or (hits == best_hits and hits and lang < best):
                best, best_hits = lang, hits
        return (best if best_hits else "und"), round(best_hits / len(words), 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        det = [self.detect(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(
            "lang_detected", pa.array([d[0] for d in det], pa.string())
        ).append_column(
            "lang_confidence", pa.array([d[1] for d in det], pa.float64())
        )


class QualityStage:
    """Heuristic document-quality features + score.

    Integer feature counts (vectorizable, hash-stable); score is a
    deterministic rational of those counts.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = frozenset(STOPWORDS["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n_chars, n_words, n_punct, n_stop, mean_wl = [], [], [], [], []
        for t in texts:
            t = t or ""
            words = t.split()
            n_chars.append(len(t))
            n_words.append(len(words))
            n_punct.append(sum(1 for c in t if not c.isalnum() and not c.isspace()))
            n_stop.append(sum(1 for w in words if w.lower() in self.stop))
            mean_wl.append(round(sum(map(len, words)) / len(words), 4) if words else 0.0)
        nw = np.maximum(np.array(n_words, dtype=np.float64), 1.0)
        punct_ratio = np.round(np.array(n_punct) / np.maximum(np.array(n_chars, dtype=np.float64), 1.0), 6)
        stop_ratio = np.round(np.array(n_stop) / nw, 6)
        # crude quality: enough words, moderate punctuation, some stopwords
        score = np.clip(
            np.minimum(nw / 50.0, 1.0) * (1.0 - np.minimum(punct_ratio * 4, 1.0)) * (0.5 + stop_ratio),
            0.0, 1.0,
        )
        score[np.array(n_words) == 0] = 0.0  # an empty doc has no quality
        return (
            batch.append_column("n_words", pa.array(n_words, pa.int64()))
            .append_column("n_punct", pa.array(n_punct, pa.int64()))
            .append_column("n_stopwords", pa.array(n_stop, pa.int64()))
            .append_column("mean_word_len", pa.array(mean_wl, pa.float64()))
            .append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
            .append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))
            .append_column("quality_score", pa.array(np.round(score, 6), pa.float64()))
        )


def token_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    """Whitespace words + BPE-ish regex tokens per doc (vectorized regex)."""

    def count(batch: pa.Table) -> pa.Table:
        words = pc.cast(pc.count_substring_regex(batch[text_col], pattern=r"\S+"), pa.int64())
        tokens = pc.cast(
            pc.count_substring_regex(batch[text_col], pattern=TOKEN_RE.pattern), pa.int64()
        )
        return batch.append_column("n_words", words).append_column("n_tokens", tokens)

    return ds.map_batches(count, batch_format="pyarrow")


def fingerprint64(text: str, window: int = 8) -> str:
    """Winnowing-style document fingerprint: min rolling hash over word
    windows, hex-encoded. Deterministic; robust to small edits outside the
    minimal window."""
    words = (text or "").lower().split()
    if not words:
        return "0" * 16
    hashes = [
        int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        for w in words
    ]
    if len(hashes) <= window:
        combined = min(hashes)
    else:
        acc = []
        for i in range(len(hashes) - window + 1):
            h = 0
            for j in range(window):
                h = (h * 1099511628211 + hashes[i + j]) % (1 << 64)
            acc.append(h)
        combined = min(acc)
    return f"{combined:016x}"


def fingerprints(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    def fp(batch: pa.Table) -> pa.Table:
        vals = pa.array([fingerprint64(t) for t in batch[text_col].to_pylist()], pa.string())
        return pa.table({id_col: batch[id_col], "fingerprint": vals})

    return ds.map_batches(fp, batch_format="pyarrow")


def lang_distribution(ds: Dataset, text_col: str = "text", concurrency=2) -> Dataset:
    """Detected-language histogram over a corpus (actor-pool stage + tiny
    grouped count)."""
    return (
        ds.map_batches(LangIdStage, fn_constructor_kwargs={"text_col": text_col},
                       batch_format="pyarrow", concurrency=concurrency)
        .groupby("lang_detected")
        .aggregate(Count(alias_name="n_docs"))
    )
