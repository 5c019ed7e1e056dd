"""Property tests for the round-8 operators: gaps-and-islands vs a
pure-Python reference model on random bucket multisets, and RP-index ≡
one-shot retrieval on random corpora mixing valid rows with every
invalid class (including magnitudes straddling the int64 envelope)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_subscription_etl_spark.operators.similarity import (
    _rp_max_abs,
    random_projection_topk,
    rp_topk_indexed,
    write_rp_index,
)
from airflow_subscription_etl_spark.operators.temporal import gaps_and_islands

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _islands_model(rows, max_gap):
    """Pure-Python reference: per source, sort by (bucket, doc_id);
    a row starts a new island when its gap to the previous bucket
    exceeds max_gap (first row always starts one). Returns
    {doc_id: (source, island_index)}."""
    out = {}
    by_src = {}
    for doc_id, source, b in rows:
        by_src.setdefault(source, []).append((b, doc_id))
    for source, items in by_src.items():
        items.sort()
        island = 0
        prev = None
        for b, doc_id in items:
            if prev is None or b - prev > max_gap:
                island += 1
            out[doc_id] = (source, island)
            prev = b
    return out


@given(
    buckets=st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(0, 20)),
        min_size=1,
        max_size=30,
    ),
    max_gap=st.integers(1, 3),
)
@_SETTINGS
def test_islands_match_python_model(spark, buckets, max_gap):
    """Same partition blocks as the sequential model: two rows share an
    island label iff the model groups them (labels themselves are
    positional indexes in both, so direct equality holds too)."""
    rows = [(i, src, b) for i, (src, b) in enumerate(buckets)]
    df = spark.createDataFrame(rows, "doc_id long, source string, b long")
    got = {
        r["doc_id"]: (r["source"], r["island"])
        for r in gaps_and_islands(
            df, "source", "b", max_gap=max_gap, order_tiebreak="doc_id"
        ).collect()
    }
    assert got == _islands_model(rows, max_gap)


@given(
    data=st.data(),
    dims=st.sampled_from([4, 8]),
    r_dims=st.sampled_from([2, 3]),
)
@_SETTINGS
def test_rp_index_equals_oneshot_on_random_corpora(spark, data, dims, r_dims):
    """Index-then-probe ≡ one-shot on random vectors whose magnitudes
    straddle the validity envelope: rows beyond max_abs (or carrying
    NaN/Inf) must drop out of BOTH paths identically, and the retained
    rows must produce the identical top-k (candidate budget covers the
    corpus, so recall plays no role — this pins arithmetic, exclusion,
    and tiebreaks, not approximation quality)."""
    limit = _rp_max_abs(dims, r_dims)
    elem = st.one_of(
        st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False),
        st.floats(limit * 0.99, limit * 1.01, allow_nan=False,
                  allow_infinity=False),
        st.just(float("nan")),
        st.just(float("inf")),
    )
    vecs = data.draw(
        st.lists(
            st.lists(elem, min_size=dims, max_size=dims),
            min_size=2,
            max_size=12,
        )
    )
    qv = data.draw(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False),
            min_size=dims,
            max_size=dims,
        )
    )
    import numpy as np  # noqa: PLC0415

    # zero-NORM vectors are out of scope: cosine is mathematically
    # undefined there and the shared rerank raises the same ANSI
    # divide-by-zero on BOTH paths (equal, but vacuously) — nudge any
    # draw that is all-zero AFTER float32 rounding (the stored type;
    # a 1e-40 float64 flushes to 0.0f) off zero instead of discarding
    def _nonzero32(v):
        return any(
            math.isfinite(x) and float(np.float32(x)) != 0.0 for x in v
        )

    vecs = [v if _nonzero32(v) else ([0.5] + v[1:]) for v in vecs]
    if not _nonzero32(qv):
        qv = [0.5] + qv[1:]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # validity model must see the FLOAT32-rounded values the engine
    # stores (array<float>): a draw just past the envelope can round
    # back inside it (and vice versa) at the boundary
    valid = [
        v
        for v in vecs
        if all(
            math.isfinite(x) and abs(float(np.float32(x))) <= limit
            for x in v
        )
    ]
    import tempfile  # noqa: PLC0415

    with tempfile.TemporaryDirectory(prefix="rp_prop_") as tmp:
        write_rp_index(df, f"{tmp}/idx", dims=dims, r_dims=r_dims)
        want = random_projection_topk(
            df, qv, k=5, r_dims=r_dims, candidates=len(rows)
        ).collect()
        got = rp_topk_indexed(
            spark, f"{tmp}/idx", qv, k=5, candidates=len(rows)
        ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) == min(5, len(valid))
