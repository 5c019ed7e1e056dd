"""Round-10 operator: span_dedup_rewrite — the Lee et al. exact-span
dedup ACTION (rewrite) with C4-style boilerplate-line dropping, the
companion to span_dedup's stats. The registered query
``doc_span_rewrite`` pins corpus-scale parity against DuckDB; these
tests pin the SEMANTICS on constructed corpora."""

from __future__ import annotations

from airflow_subscription_etl_spark.operators.dedup import (
    span_dedup,
    span_dedup_rewrite,
)


def _rows(df):
    return {
        r["doc_id"]: (
            r["text_clean"],
            r["n_chunks"],
            r["n_kept"],
            r["n_dup_dropped"],
            r["n_boiler_dropped"],
        )
        for r in df.collect()
    }


def test_globally_first_occurrence_survives(spark):
    """Chunk 'a b' appears in docs 1 and 2 and twice in doc 1: only
    doc 1's FIRST occurrence survives; within-doc repeats drop too."""
    df = spark.createDataFrame(
        [
            (1, "a b a b c d"),  # chunks: [a b], [a b], [c d]
            (2, "a b e f"),  # chunks: [a b], [e f]
        ],
        "doc_id bigint, text string",
    )
    got = _rows(span_dedup_rewrite(df, span=2))
    assert got[1] == ("a b c d", 3, 2, 1, 0)
    assert got[2] == ("e f", 2, 1, 1, 0)


def test_boilerplate_dominates_and_drops_keeper(spark):
    """A chunk in >= boilerplate_df distinct docs is dropped from
    EVERY doc (keeper included) and never counts as a duplicate."""
    df = spark.createDataFrame(
        [(1, "buy now x y"), (2, "buy now u v"), (3, "buy now w z")],
        "doc_id bigint, text string",
    )
    got = _rows(span_dedup_rewrite(df, span=2, boilerplate_df=3))
    # 'buy now' hits 3 docs -> dropped everywhere, keeper (doc 1)
    # included; each doc's unique tail survives
    assert got[1] == ("x y", 2, 1, 0, 1)
    assert got[2] == ("u v", 2, 1, 0, 1)
    assert got[3] == ("w z", 2, 1, 0, 1)
    # without the threshold 'buy now' is plain dup-dedup: doc 1 keeps
    # it, docs 2-3 lose their copy as duplicates
    got2 = _rows(span_dedup_rewrite(df, span=2))
    assert got2[1] == ("buy now x y", 2, 2, 0, 0)
    assert got2[2] == ("u v", 2, 1, 1, 0)
    assert got2[3] == ("w z", 2, 1, 1, 0)


def test_null_rows_excluded_and_ragged_tail(spark):
    df = spark.createDataFrame(
        [(1, "p q r"), (None, "p q r"), (2, None)],
        "doc_id bigint, text string",
    )
    got = _rows(span_dedup_rewrite(df, span=2))
    # only doc 1 remains; ragged last chunk 'r' is its own chunk
    assert got == {1: ("p q r", 2, 2, 0, 0)}


def test_counts_reconcile_with_span_dedup_signal(spark):
    """The rewrite's per-doc chunk totals must equal span_dedup's on
    the same corpus/segmentation, and every chunk is exactly one of
    kept/dup/boiler."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rw = _rows(span_dedup_rewrite(docs, span=8, boilerplate_df=3))
    sig = {
        r["doc_id"]: r["n_chunks"] for r in span_dedup(docs, span=8).collect()
    }
    assert set(rw) == set(sig)
    for doc_id, (_, n_chunks, kept, dup, boiler) in rw.items():
        assert n_chunks == sig[doc_id]
        assert kept + dup + boiler == n_chunks


def test_rewrite_is_idempotent_on_its_own_output(spark):
    """Running the rewrite on already-cleaned text drops nothing new
    when chunk boundaries align (kept chunks are unique corpus-wide
    and below the boilerplate threshold by construction)."""
    df = spark.createDataFrame(
        [(1, "a b a b c d"), (2, "a b e f"), (3, "c d g h")],
        "doc_id bigint, text string",
    )
    once = span_dedup_rewrite(df, span=2)
    again = span_dedup_rewrite(
        once.selectExpr("doc_id", "text_clean as text"), span=2
    )
    r1 = {k: v[0] for k, v in _rows(once).items()}
    r2 = {k: v[0] for k, v in _rows(again).items()}
    assert r1 == r2
    assert all(v[3] == v[4] == 0 for v in _rows(again).values()), (
        "second pass dropped chunks — not idempotent"
    )


# ----------------------------------------------- doc-level novelty llr


def test_novelty_scores_flag_off_baseline_docs(spark, tmp_path):
    """A document far from the baseline distribution must score a
    higher llr_per_token than an in-distribution one, and the scores
    must equal the source-grained face when each doc IS its own
    group (same integer algebra, different grouping)."""
    from airflow_subscription_etl_spark.streaming.drift_stream import (
        score_drift_frame,
        score_novelty_frame,
        write_drift_baseline,
    )

    base_corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "nb")
    write_drift_baseline(base_corpus, path, num_buckets=64)
    probe = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "zzz qqq vvv kkk www yyy xxx uuu jjj ppp"),
        ],
        "doc_id bigint, text string",
    )
    nov = {
        r["doc_id"]: r["llr_per_token_micro"]
        for r in score_novelty_frame(spark, path, probe).collect()
    }
    assert nov[101] > nov[100], nov
    # per-doc face == source face with doc_id as the group column
    src = {
        r["doc_id"]: (r["n_tokens"], r["llr_micro"], r["llr_per_token_micro"])
        for r in score_drift_frame(
            spark, path, probe, group_col="doc_id"
        ).collect()
    }
    full = {
        r["doc_id"]: (r["n_tokens"], r["llr_micro"], r["llr_per_token_micro"])
        for r in score_novelty_frame(spark, path, probe).collect()
    }
    assert src == full


def test_novelty_totals_are_not_hint_broadcast(spark, tmp_path):
    """The doc-grained face must NOT carry broadcast hints on its
    per-group totals (corpus-sized — one row per doc): exactly the one
    hint for the ≤num_buckets baseline remains. The source face keeps
    its three (baseline + totals twice, catalog-sized)."""
    from airflow_subscription_etl_spark.streaming.drift_stream import (
        score_drift_frame,
        score_novelty_frame,
        write_drift_baseline,
    )

    corpus = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "p q r")],
        "doc_id bigint, source string, text string",
    )
    path = str(tmp_path / "nb2")
    write_drift_baseline(corpus, path, num_buckets=16)
    n_hints = lambda df: df._jdf.queryExecution().analyzed().toString().count(  # noqa: E731
        "UnresolvedHint"
    ) + df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    assert n_hints(score_novelty_frame(spark, path, corpus)) == 1
    assert n_hints(score_drift_frame(spark, path, corpus)) == 3


def test_span_rewrite_plan_shape(spark):
    """Plan pin for the r11 de-skewed design (VERDICT r10): ZERO
    Window nodes — keep/drop decisions come from a per-digest
    AGGREGATE (min(struct(id,pos)) keeper + count_distinct docs, both
    partial-aggregatable, so a boilerplate digest occurring in every
    document collapses map-side) JOINED back on the digest (the shape
    AQE's skew-join split can fan out — a window partition it never
    can). The r10 design funneled every occurrence of a hot digest
    through one window task. Exactly one join (the digest join-back);
    the second corpus scan is the agg side's — column-pruned, and the
    price of skew immunity."""
    from airflow_subscription_etl_spark.queries import REGISTRY

    fn, _ = REGISTRY["doc_span_rewrite"]
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert tree.count("Scan parquet") == 2
    assert tree.count("Join") == 1


def test_novelty_monitor_stream_matches_batch_face(spark, tmp_path):
    """Real readStream drive of the per-doc novelty monitor: streamed
    per-batch scores equal the batch face over the same rows, and a
    replayed epoch overwrites its own directory with identical rows."""
    from airflow_subscription_etl_spark.streaming.drift_stream import (
        process_novelty_batch,
        score_novelty_frame,
        start_novelty_monitor,
        write_drift_baseline,
    )

    base = spark.createDataFrame(
        [(i, "steady state corpus words here") for i in range(10)],
        "doc_id bigint, text string",
    )
    bpath = str(tmp_path / "baseline")
    write_drift_baseline(base, bpath, num_buckets=32)

    rows = [(100, "steady state corpus words here"), (101, "utterly alien payload zz")]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(f"{src}/f0")
    out = str(tmp_path / "scores")
    q = start_novelty_monitor(
        spark.readStream.schema("doc_id bigint, text string").parquet(f"{src}/f*"),
        bpath,
        out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["n_tokens"], r["llr_micro"])
        for r in spark.read.parquet(f"{out}/batch=0").collect()
    }
    batch_face = {
        r["doc_id"]: (r["n_tokens"], r["llr_micro"])
        for r in score_novelty_frame(
            spark, bpath, spark.createDataFrame(rows, "doc_id bigint, text string")
        ).collect()
    }
    assert streamed == batch_face
    # replay: same epoch id → identical rows, no duplication
    process_novelty_batch(
        spark.createDataFrame(rows, "doc_id bigint, text string"), 0, bpath, out
    )
    assert {
        r["doc_id"]: (r["n_tokens"], r["llr_micro"])
        for r in spark.read.parquet(f"{out}/batch=0").collect()
    } == batch_face


# -------------------------------------------- cross-source dup matrix


def test_cross_source_duplication_matrix(spark):
    from airflow_subscription_etl_spark.operators.dedup import (
        cross_source_duplication,
    )

    df = spark.createDataFrame(
        [
            ("A", 1, "a b c d"),  # chunks(2): [a b], [c d]
            ("A", 2, "a b x y"),  # A distinct: {a b, c d, x y} = 3
            ("B", 3, "a b c d"),  # B distinct: {a b, c d} = 2
            ("C", 4, "zz ww"),  # C distinct: {zz ww} = 1 — no overlap
            ("B", 5, None),  # NULL text excluded
        ],
        "source string, doc_id bigint, text string",
    )
    got = {
        (r["source_a"], r["source_b"]): (
            r["shared_chunks"],
            r["n_chunks_a"],
            r["n_chunks_b"],
            r["containment_a_micro"],
            r["containment_b_micro"],
        )
        for r in cross_source_duplication(df, span=2).collect()
    }
    # A∩B = {a b, c d}: containment 2/3 of A, 2/2 of B
    assert got == {
        ("A", "B"): (2, 3, 2, 2_000_000 // 3, 1_000_000)
    }, got


def test_cross_source_duplication_three_way(spark):
    """A chunk shared by three sources contributes to every pair, and
    within-source repeats never inflate the distinct counts."""
    from airflow_subscription_etl_spark.operators.dedup import (
        cross_source_duplication,
    )

    df = spark.createDataFrame(
        [
            ("A", 1, "k k"),
            ("A", 2, "k k"),  # same chunk again — distinct once
            ("B", 3, "k k"),
            ("C", 4, "k k u u"),
        ],
        "source string, doc_id bigint, text string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["shared_chunks"]
        for r in cross_source_duplication(df, span=2).collect()
    }
    assert got == {("A", "B"): 1, ("A", "C"): 1, ("B", "C"): 1}
