"""Property tests for the round-10 operators: span_dedup_rewrite
pinned against a pure-Python direct model on hypothesis-generated
corpora (keeper selection, boilerplate dominance, and byte-exact
reassembly beyond fixed fixtures), and the reworked
grouped_exact_rank's class split under adversarial tie shapes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_subscription_etl_spark.operators.dedup import span_dedup_rewrite
from airflow_subscription_etl_spark.operators.scale import grouped_exact_rank

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocabulary → chunk collisions are common, exercising both
# duplicate and boilerplate paths on nearly every example
_WORDS = ["a", "b", "c", "dd", "ee"]

_corpus = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=9).map(" ".join),
    min_size=1,
    max_size=12,
)


def _ref_rewrite(rows, span, boilerplate_df):
    """Direct model: dict-driven replay of the operator contract."""
    chunks = []  # (doc, pos, chunk)
    for doc, text in rows:
        toks = text.lower().strip().split()
        for pos in range(0, (len(toks) + span - 1) // span):
            chunks.append((doc, pos, " ".join(toks[pos * span : pos * span + span])))
    docs_per = {}
    for doc, _, c in chunks:
        docs_per.setdefault(c, set()).add(doc)
    first = {}
    for doc, pos, c in sorted(chunks):
        first.setdefault(c, (doc, pos))
    out = {}
    for doc, _ in rows:
        out[doc] = [0, 0, 0, 0, []]  # n_chunks, kept, dup, boiler, kept-chunks
    for doc, pos, c in sorted(chunks):
        rec = out[doc]
        rec[0] += 1
        if boilerplate_df is not None and len(docs_per[c]) >= boilerplate_df:
            rec[3] += 1
        elif first[c] == (doc, pos):
            rec[1] += 1
            rec[4].append((pos, c))
        else:
            rec[2] += 1
    return {
        doc: (
            " ".join(c for _, c in sorted(rec[4])),
            rec[0],
            rec[1],
            rec[2],
            rec[3],
        )
        for doc, rec in out.items()
    }


@given(corpus=_corpus, span=st.integers(1, 3), bdf=st.none() | st.integers(2, 4))
@_SETTINGS
def test_span_rewrite_matches_direct_model(spark, corpus, span, bdf):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (
            r["text_clean"],
            r["n_chunks"],
            r["n_kept"],
            r["n_dup_dropped"],
            r["n_boiler_dropped"],
        )
        for r in span_dedup_rewrite(
            df, span=span, boilerplate_df=bdf
        ).collect()
    }
    assert got == _ref_rewrite(rows, span, bdf)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 40),  # id pool with collisions across groups
            st.sampled_from(["g1", "g2"]),
            st.sampled_from([-5, 0, 0, 0, 7, 2**40]),  # heavy ties + outlier
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[1], r[0]),
    ),
    nbins=st.sampled_from([1, 2, 3, 7]),
    nsub=st.sampled_from([3, 4, 16]),
)
@_SETTINGS
def test_grouped_rank_class_split_matches_window(spark, rows, nbins, nsub):
    """Adversarial shapes for the r10 class split: mass ties, a 2^40
    outlier stretching the bin range (concentrating everything else
    into one bin), tiny nbins (incl. the overflow-routed 1 and 2), and
    coarse nsub — ranks must equal the naive window everywhere."""
    df = spark.createDataFrame(rows, "id bigint, grp string, score bigint")
    got = {
        (r["grp"], r["id"]): r["rank"]
        for r in grouped_exact_rank(
            df, "grp", "score", "id", nbins=nbins, nsub=nsub
        ).collect()
    }
    want = {}
    for g in {r[1] for r in rows}:
        members = sorted(
            ((s, i) for i, gg, s in rows if gg == g),
        )
        for rank, (_, i) in enumerate(members, start=1):
            want[(g, i)] = rank
    assert got == want
