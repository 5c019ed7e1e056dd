"""Python Data Source API: the synthdocs generator source."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airflow_subscription_etl_spark.sources.synth import (
    _HAS_PYDS,
    register_synthdocs,
)

pytestmark = pytest.mark.skipif(
    not _HAS_PYDS, reason="Python Data Source API absent (Spark < 4)"
)


@pytest.fixture()
def synth(spark):
    assert register_synthdocs(spark)
    return spark


def test_rows_schema_and_parallelism(synth):
    df = (
        synth.read.format("synthdocs")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 500
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    row = df.filter(F.col("doc_id") == 123).collect()[0]
    assert row["n_chars"] == len(row["text"]) and row["source"] == "src3"


def test_content_independent_of_partitioning(synth):
    a = sorted(
        map(
            str,
            synth.read.format("synthdocs")
            .option("rows", 200)
            .option("partitions", 3)
            .load()
            .collect(),
        )
    )
    b = sorted(
        map(
            str,
            synth.read.format("synthdocs")
            .option("rows", 200)
            .option("partitions", 13)
            .load()
            .collect(),
        )
    )
    assert a == b
    assert len(a) == 200


def test_generated_corpus_feeds_operators(synth):
    from airflow_subscription_etl_spark.operators.text import (
        with_quality_score,
    )

    df = (
        synth.read.format("synthdocs")
        .option("rows", 100)
        .option("partitions", 4)
        .load()
    )
    scored = with_quality_score(df)
    assert scored.count() == 100
    assert scored.filter(F.col("quality_score").isNull()).count() == 0


def test_bad_options_raise(synth):
    with pytest.raises(Exception, match="partitions"):
        (
            synth.read.format("synthdocs")
            .option("rows", 10)
            .option("partitions", 0)
            .load()
            .count()
        )


def test_streaming_leg_reaches_cap_and_matches_batch(synth, tmp_path):
    """The streaming reader must emit exactly the capped corpus across
    micro-batches, byte-identical to the batch reader's output."""
    q = (
        synth.readStream.format("synthdocs")
        .option("rows", 120)
        .option("rowsPerBatch", 50)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(str, synth.sql("SELECT * FROM synth_stream").collect()))
    want = sorted(
        map(
            str,
            synth.read.format("synthdocs")
            .option("rows", 120)
            .option("partitions", 4)
            .load()
            .collect(),
        )
    )
    assert got == want and len(got) == 120


def test_streaming_curation_pipeline_end_to_end(synth, tmp_path):
    """Corpus curation ON A STREAM: the synthdocs stream feeds the
    batch curation operators unchanged (quality score + token filter),
    proving the operator library is engine-mode agnostic — the same
    declarative transforms run under the micro-batch planner. The
    streamed+filtered result must equal the batch-filtered result."""
    import pyspark.sql.functions as F

    from airflow_subscription_etl_spark.operators.packing import (
        with_token_count,
    )
    from airflow_subscription_etl_spark.operators.text import (
        with_quality_score,
    )

    def curate(df):
        # token filter first (with_quality_score projects to its own
        # score columns), then quality filter on the scored frame
        long_enough = with_token_count(df).filter(F.col("n_tokens") >= 25)
        return (
            with_quality_score(long_enough)
            .filter(F.col("quality_score") > 0.4)
            .select("doc_id", "quality_score")
        )

    q = (
        curate(
            synth.readStream.format("synthdocs")
            .option("rows", 300)
            .option("rowsPerBatch", 120)
            .load()
        )
        .writeStream.format("memory")
        .queryName("curated_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        map(str, synth.sql("SELECT * FROM curated_stream").collect())
    )
    want = sorted(
        map(
            str,
            curate(
                synth.read.format("synthdocs")
                .option("rows", 300)
                .option("partitions", 4)
                .load()
            ).collect(),
        )
    )
    assert got == want
    assert 0 < len(got) < 300  # the filter actually discriminates


def test_vocab_size_option(synth):
    """vocabSize > 0 draws words from a synthetic w<k> space; content
    stays a pure function of (doc_id, vocabSize) — same rows under any
    partitioning — and distinct corpora get corpus-proportional shingle
    diversity (the synth_probe requirement)."""
    a = (
        synth.read.format("synthdocs")
        .option("rows", 120)
        .option("vocabSize", 50_000)
        .option("partitions", 3)
        .load()
    )
    b = (
        synth.read.format("synthdocs")
        .option("rows", 120)
        .option("vocabSize", 50_000)
        .option("partitions", 7)
        .load()
    )
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    words = set()
    for _, text, *_ in ra:
        for w in text.split():
            assert w.startswith("w") and w[1:].isdigit()
            words.add(w)
    # 120 docs × ~30 words from a 50k space → nearly all distinct
    assert len(words) > 2000
    # default (vocabSize absent) is unchanged: legacy 26-word vocab
    legacy = (
        synth.read.format("synthdocs").option("rows", 5).load().collect()
    )
    assert all(not w.startswith("w0") for r in legacy for w in r["text"].split())


def test_vocab_size_rejects_negative(synth):
    with pytest.raises(Exception, match="vocabSize"):
        (
            synth.read.format("synthdocs")
            .option("rows", 10)
            .option("vocabSize", -1)
            .load()
            .collect()
        )
