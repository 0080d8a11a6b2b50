"""Property tests for the substring-dedup operators: the Spark plans are
checked against direct pure-Python references on randomized inputs — a
second independent implementation of the SPEC, complementing the DuckDB
oracle parity (which shares the SQL-ish formulation) and the planted
fixtures (which pin a handful of cases)."""

from __future__ import annotations

import hashlib
import random

import pandas as pd
import pytest

from pipeline.hashing import h60_py


def _spans_py(texts, k, mod, min_docs, gap):
    """Pure-Python reference of repeated_substring_spans' spec."""
    sampled = []  # (doc_id, pos, h)
    for doc_id, t in texts.items():
        if len(t) < k:
            continue
        for pos in range(len(t) - k + 1):
            h = h60_py("ss", t[pos : pos + k])
            if h % mod == 0:
                sampled.append((doc_id, pos, h))
    from collections import defaultdict

    docs_per_h = defaultdict(set)
    for doc_id, _, h in sampled:
        docs_per_h[h].add(doc_id)
    rep = {h for h, ds in docs_per_h.items() if len(ds) >= min_docs}
    hits = defaultdict(list)
    for doc_id, pos, h in sampled:
        if h in rep:
            hits[doc_id].append(pos)
    spans = []
    for doc_id, positions in hits.items():
        positions.sort()
        start = prev = positions[0]
        n = 1
        for pos in positions[1:]:
            if pos - prev > gap:
                spans.append((doc_id, start, prev + k, prev + k - start, n))
                start, n = pos, 0
            prev = pos
            n += 1
        spans.append((doc_id, start, prev + k, prev + k - start, n))
    return sorted(spans)


def _cut_py(text, spans):
    """Pure-Python reference of cut_spans' splice."""
    out, last = [], 0
    for s, e in sorted(spans):
        out.append(text[last:s])
        last = e
    out.append(text[last:])
    return "".join(out)


def test_spans_match_python_reference_on_random_corpora(spark):
    """Randomized corpora with planted shared blocks at random offsets:
    the Spark plan must equal the pure-Python spec exactly."""
    from pipeline.extras.dedup import repeated_substring_spans

    rng = random.Random(11)
    k, mod, gap = 12, 2, 24  # small k/gap so tiny texts exercise merging

    def noise(n):
        return "".join(rng.choice("abcdef gh") for _ in range(n))

    for trial in range(4):
        shared = [noise(rng.randint(15, 60)) for _ in range(3)]
        texts = {}
        for d in range(8):
            parts = []
            for _ in range(rng.randint(1, 4)):
                if rng.random() < 0.6:
                    parts.append(rng.choice(shared))
                parts.append(noise(rng.randint(0, 40)))
            texts[d] = "".join(parts)

        docs = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": list(texts), "text": list(texts.values())}
            )
        )
        got = sorted(
            map(
                tuple,
                repeated_substring_spans(
                    docs, k=k, sample_mod=mod, merge_gap=gap
                )
                .toPandas()
                .values,
            )
        )
        want = _spans_py(texts, k, mod, min_docs=2, gap=gap)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_cut_spans_matches_python_reference_on_random_spans(spark):
    """Random non-overlapping spans over random texts: the F.aggregate
    splice must equal the Python slice-and-join byte for byte."""
    from pipeline.extras.dedup import cut_spans

    rng = random.Random(17)
    doc_rows, span_rows, expect = [], [], {}
    for d in range(25):
        t = "".join(rng.choice("xyzw .") for _ in range(rng.randint(0, 80)))
        doc_rows.append((d, t))
        spans, cursor = [], 0
        while cursor < len(t) and rng.random() < 0.7:
            s = rng.randint(cursor, len(t))
            e = rng.randint(s, len(t))
            if e > s:
                spans.append((s, e))
            cursor = e + rng.randint(1, 5)
        for s, e in spans:
            span_rows.append((d, s, e))
        expect[d] = (
            _cut_py(t, spans),
            sum(e - s for s, e in spans),
            len(spans),
        )

    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    spans_df = spark.createDataFrame(
        span_rows or [(999, 0, 0)],
        "doc_id long, span_start long, span_end long",
    )
    out = cut_spans(docs, spans_df).toPandas().set_index("doc_id")
    for d, (clean, removed, n) in expect.items():
        assert out.loc[d, "text_clean"] == clean, d
        assert out.loc[d, "chars_removed"] == removed, d
        assert out.loc[d, "n_cut"] == n, d
