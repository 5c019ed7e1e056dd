"""Property tests for the round-11 additions: the streaming
cross-source duplication matrix's any-split convergence (random
corpora, random epoch partitions — the maintained matrix must equal
the batch operator on the union), and the bucketed-state layer's
bucket-resolution invariant (every key's newest snapshot wins
regardless of which epochs touched its bucket)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_subscription_etl_spark.operators.dedup import (
    cross_source_duplication,
)
from airflow_subscription_etl_spark.streaming.source_matrix_stream import (
    process_source_matrix_batch,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocab + few sources → digests collide across sources on nearly
# every example, exercising within-epoch, cross-epoch and no-pair paths
_WORDS = ["a", "b", "c", "dd"]
_SOURCES = ["cc", "wiki", "books"]

_docs = st.lists(
    st.tuples(
        st.sampled_from(_SOURCES),
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6).map(
            " ".join
        ),
    ),
    min_size=1,
    max_size=8,
)
# epoch split: a cut-point set over the doc list
_cuts = st.sets(st.integers(1, 7), max_size=3)


def _split(rows, cuts):
    idx = sorted(c for c in cuts if c < len(rows))
    out, prev = [], 0
    for c in [*idx, len(rows)]:
        if c > prev:
            out.append(rows[prev:c])
            prev = c
    return out


@given(docs=_docs, cuts=_cuts)
@_SETTINGS
def test_matrix_stream_any_split_converges(spark, tmp_path_factory, docs, cuts):
    root = str(tmp_path_factory.mktemp("smprop"))
    epochs = _split(docs, cuts)
    df_all = spark.createDataFrame(docs, "source string, text string")
    want = sorted(
        tuple(r) for r in cross_source_duplication(df_all, span=2).collect()
    )
    for i, rows in enumerate(epochs):
        process_source_matrix_batch(
            spark.createDataFrame(rows, "source string, text string"),
            i,
            root,
            span=2,
            n_buckets=4,  # small modulus → bucket collisions on purpose
        )
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(
            f"{root}/matrix/batch={len(epochs) - 1}"
        ).collect()
    )
    assert got == want
