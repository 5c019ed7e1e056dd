"""streaming/rp_stream.py — streaming maintenance of the RP index:
batch/stream parity, replay idempotence, probe freshness through a
real readStream."""

from __future__ import annotations

import glob
import os
import shutil

from airflow_subscription_etl_spark.operators.similarity import (
    random_projection_topk,
    rp_topk_indexed,
    write_rp_index,
)
from airflow_subscription_etl_spark.streaming.rp_stream import (
    process_rp_batch,
    start_rp_index_append,
)


def _vec(i: int, dims: int = 16) -> list[float]:
    return [float(((i * 13 + d * 7) % 29) - 14) / 14.0 for d in range(dims)]


def _rows(ids):
    return [(i, _vec(i)) for i in ids]


def test_batch_backfill_parity_and_replay(spark, tmp_path):
    """Base build + two backfill batches must probe IDENTICALLY to a
    one-shot over the union corpus; replaying a batch (same epoch id)
    must leave the index bit-unchanged (overwrite-own-directory
    idempotence)."""
    base = spark.createDataFrame(
        _rows(range(40)), "vec_id long, embedding array<float>"
    )
    full = spark.createDataFrame(
        _rows(range(60)), "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "idx")
    write_rp_index(base, path, dims=16, r_dims=4)

    b0 = spark.createDataFrame(
        _rows(range(40, 50)) + [(997, None)],  # dirty row drops at append
        "vec_id long, embedding array<float>",
    )
    b1 = spark.createDataFrame(
        _rows(range(50, 60)), "vec_id long, embedding array<float>"
    )
    process_rp_batch(b0, 0, path)
    process_rp_batch(b1, 1, path)

    qv = _vec(0)
    want = random_projection_topk(full, qv, k=5, r_dims=4, candidates=60).collect()
    got = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    before = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/vectors")
        .select("vec_id", "rp_proj")
        .collect()
    )
    process_rp_batch(b0, 0, path)  # replay epoch 0
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/vectors")
        .select("vec_id", "rp_proj")
        .collect()
    )
    assert after == before
    got2 = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in want]


def test_real_readstream_appends_and_probe_sees_them(spark, tmp_path):
    """The same parity through an actual Structured Streaming query:
    parquet file source, maxFilesPerTrigger=1 → one epoch per file,
    availableNow drain; the probe sees the appended rows with no
    rebuild of batch=0."""
    base = spark.createDataFrame(
        _rows(range(40)), "vec_id long, embedding array<float>"
    )
    full = spark.createDataFrame(
        _rows(range(60)), "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "idx")
    write_rp_index(base, path, dims=16, r_dims=4)

    src = str(tmp_path / "src")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for bid, ids in enumerate((range(40, 50), range(50, 60))):
        spark.createDataFrame(
            _rows(ids), "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{bid}")
        part = glob.glob(f"{src}/b{bid}/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/vecs_{bid}.parquet")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    q = start_rp_index_append(
        stream, path, checkpoint=str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(240), "streaming drain did not finish in 240s"

    qv = _vec(0)
    want = random_projection_topk(full, qv, k=5, r_dims=4, candidates=60).collect()
    got = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # base partition untouched; two appended epochs present
    batches = {
        r["batch"]
        for r in spark.read.parquet(f"{path}/vectors")
        .select("batch")
        .distinct()
        .collect()
    }
    assert batches == {0, 1, 2}


def test_compaction_preserves_probe_and_collapses_batches(spark, tmp_path):
    """Compaction must be invisible to probes (identical result) while
    folding every batch partition EXCEPT the highest-numbered one into
    a fresh batch=0 (the tail may be a written-but-uncommitted epoch —
    see the replay test below); appends after compaction keep working
    (epoch ids never collide with 0)."""
    from airflow_subscription_etl_spark.streaming.rp_stream import (
        compact_rp_index,
    )

    base = spark.createDataFrame(
        _rows(range(40)), "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "idx")
    write_rp_index(base, path, dims=16, r_dims=4)
    for epoch, ids in enumerate(
        (range(40, 45), range(45, 50), range(50, 55))
    ):
        process_rp_batch(
            spark.createDataFrame(
                _rows(ids), "vec_id long, embedding array<float>"
            ),
            epoch,
            path,
        )
    qv = _vec(0)
    before = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()

    # dirs {0,1,2,3}: folds 0..2 (40+5+5 rows), preserves tail dir 3
    n = compact_rp_index(spark, path)
    assert n == 50
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    vectors = spark.read.schema(meta["vec_schema"]).parquet(f"{path}/vectors")
    assert {
        r["batch"] for r in vectors.select("batch").distinct().collect()
    } == {0, 3}
    after = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]

    # base-only index: nothing to fold, index untouched
    solo = str(tmp_path / "solo")
    write_rp_index(base, solo, dims=16, r_dims=4)
    assert compact_rp_index(spark, solo) == 0

    # post-compaction append lands in its own partition and is seen
    process_rp_batch(
        spark.createDataFrame(
            _rows(range(55, 60)), "vec_id long, embedding array<float>"
        ),
        7,
        path,
    )
    full = spark.createDataFrame(
        _rows(range(60)), "vec_id long, embedding array<float>"
    )
    want = random_projection_topk(full, qv, k=5, r_dims=4, candidates=60).collect()
    got = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_compaction_replay_idempotent_and_crash_recoverable(spark, tmp_path):
    """The review-r8 failure scenario: an epoch written but NOT yet
    committed when the stream went down is replayed after compaction.
    Because the tail directory is preserved at its original number,
    the replay overwrites it with identical rows — no duplication, and
    the probe result is byte-identical. Also pins crash recovery: a
    stale ``vectors_old`` left mid-swap is restored/cleaned on the
    next call."""
    import shutil as sh

    from airflow_subscription_etl_spark.streaming.rp_stream import (
        compact_rp_index,
    )

    base = spark.createDataFrame(
        _rows(range(40)), "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "idx")
    write_rp_index(base, path, dims=16, r_dims=4)
    b0 = spark.createDataFrame(
        _rows(range(40, 50)), "vec_id long, embedding array<float>"
    )
    b1 = spark.createDataFrame(
        _rows(range(50, 60)), "vec_id long, embedding array<float>"
    )
    process_rp_batch(b0, 0, path)  # committed epoch
    process_rp_batch(b1, 1, path)  # written, then crash before commit

    qv = _vec(0)
    before = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()
    compact_rp_index(spark, path)  # folds {0,1}, preserves dir 2
    process_rp_batch(b1, 1, path)  # restart replays the in-flight epoch

    rows = spark.read.parquet(f"{path}/vectors").select("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 60  # no duplicated rows
    got = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in before]

    # crash between the two swap renames: vectors/ missing, full copy
    # in vectors_old — the next call restores it, then returns 0: the
    # recovered layout {0, 2} is already compacted (nothing between
    # base and tail), so re-folding would copy the corpus for nothing
    sh.move(f"{path}/vectors", f"{path}/vectors_old")
    assert compact_rp_index(spark, path) == 0
    recovered = rp_topk_indexed(spark, path, qv, k=5, candidates=60).collect()
    assert [tuple(r) for r in recovered] == [tuple(r) for r in before]


def test_query_stream_parity_and_replay(spark, tmp_path):
    """The query side of the module: a real readStream of query
    vectors drained through start_rp_knn_stream must produce, per
    batch, EXACTLY the batched-join answer for that batch's queries
    (queries are independent, so per-batch results equal the one-shot
    join restricted to those queries); replaying a batch id leaves the
    results byte-unchanged; dirty queries drop engine-uniformly."""
    from airflow_subscription_etl_spark.operators.similarity import (
        rp_knn_join_indexed,
    )
    from airflow_subscription_etl_spark.streaming.rp_stream import (
        process_rp_query_batch,
        start_rp_knn_stream,
    )

    corpus = spark.createDataFrame(
        _rows(range(60)), "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "idx")
    write_rp_index(corpus, path, dims=16, r_dims=4)

    q_batches = (
        _rows(range(3)) + [(901, None)],  # dirty query drops
        _rows(range(30, 34)),
    )
    src = str(tmp_path / "qsrc")
    flat = str(tmp_path / "qflat")
    os.makedirs(flat)
    for bid, rows in enumerate(q_batches):
        spark.createDataFrame(
            rows, "query_id long, embedding array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{bid}")
        part = glob.glob(f"{src}/b{bid}/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/queries_{bid}.parquet")

    stream = (
        spark.readStream.schema("query_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out_root = str(tmp_path / "results")
    q = start_rp_knn_stream(
        stream, path, out_root, checkpoint=str(tmp_path / "qckpt"),
        k=5, candidates=60,
    )
    assert q.awaitTermination(240), "query-stream drain did not finish"

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out_root)
        .select("query_id", "vec_id", "cosine_sim")
        .collect()
    )
    all_queries = spark.createDataFrame(
        [r for rows in q_batches for r in rows],
        "query_id long, embedding array<float>",
    )
    want = sorted(
        tuple(r)
        for r in rp_knn_join_indexed(
            spark, path, all_queries, k=5, candidates=60
        ).collect()
    )
    assert got == want
    assert {t[0] for t in got} == {0, 1, 2, 30, 31, 32, 33}  # 901 dropped

    # replay of one batch id rewrites its own dir: byte-identical state
    replay = spark.createDataFrame(
        q_batches[1], "query_id long, embedding array<float>"
    )
    process_rp_query_batch(replay, 1, path, out_root, k=5, candidates=60)
    again = sorted(
        tuple(r)
        for r in spark.read.parquet(out_root)
        .select("query_id", "vec_id", "cosine_sim")
        .collect()
    )
    assert again == got


def test_query_batch_releases_internal_cache(spark, tmp_path):
    """Huge-regime batches pin a persisted pair frame to the result;
    the sink must release it after its write, or a continuous serving
    stream leaks one JVM cache block PER MICRO-BATCH (review r8). The
    regime knobs pass through the sink, so a batch forced huge
    (pushdown_limit=0) must leave the SQL cache exactly as it found
    it — and still land correct results."""
    from airflow_subscription_etl_spark.streaming.rp_stream import (
        process_rp_query_batch,
    )

    corpus = spark.createDataFrame(
        _rows(range(40)), "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "idx")
    write_rp_index(corpus, path, dims=16, r_dims=4)
    queries = spark.createDataFrame(
        _rows(range(4)), "query_id long, embedding array<float>"
    )
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    out_root = str(tmp_path / "res")
    process_rp_query_batch(
        queries, 0, path, out_root, k=3, candidates=12, pushdown_limit=0
    )
    assert cm.isEmpty(), "huge-regime pair cache leaked past the write"
    assert spark.read.parquet(out_root).count() == 4 * 3
