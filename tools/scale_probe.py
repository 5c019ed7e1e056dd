"""8× empirical scale probe (SCALE.md's methodology, persisted as a
tool so each round can extend the table instead of re-deriving the
harness).

Replicates selected sf0.1 tables 8× into a temp dir — per-replica KEY
SHIFTS so join/group/graph cardinality scales with the data, not just
row counts — then times registered queries warm (noop sink, min of 2
passes) at 1× and 8×.

Usage: python tools/scale_probe.py [query ...]   (default: round-5 set)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_subscription_etl_spark import get_spark  # noqa: E402
from airflow_subscription_etl_spark.queries import REGISTRY  # noqa: E402
from airflow_subscription_etl_spark.sources.io import read_star_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 8

#: table → key columns shifted per replica (offset = rep · 10^9 keeps
#: replicas disjoint in every keyed domain)
SHIFTS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}

DEFAULT_QUERIES = ["ivm_join_delta", "graph_kcore", "vocab_zipf_fit"]

#: which tables each probed query scans (replicate only those).
#: PAIR GENERATORS over replicated content (containment, minhash,
#: hard negatives) are NOT probed this way: replicas are verbatim
#: clones, so the pair graph grows quadratically BY SEMANTICS (the
#: clones really are dups/neighbors) — the growth would measure the
#: synthetic corpus, not the plan.
NEEDS = {
    "ivm_join_delta": ["orders", "lineitem"],
    "graph_kcore": ["lineitem"],
    "vocab_zipf_fit": ["documents"],
    "emb_ivfpq_topk": ["embeddings"],
    "ev_holdout_split": ["events"],
    "graph_lpa": ["lineitem"],
    "ev_next_event": ["events"],
    "doc_rrf_retrieval": ["documents", "embeddings"],
    "orders_bitmap_distinct": ["orders"],
    # r8 third wave — all linear-scan ops (no pair generation), so
    # verbatim-clone replication measures exactly what we claim:
    # dsir/nb featurize shuffles scale with tokens, mmr stage 1 with
    # corpus rows (stages 2-3 are O(pool²), corpus-independent).
    "doc_dsir_sample": ["documents"],
    "doc_nb_confusion": ["documents"],
    "emb_mmr_rerank": ["embeddings"],
    # keyness replicates per-source token mass (clones multiply counts,
    # not the pair graph) — the G² plan is the thing under test
    "source_keyness": ["documents"],
    # r9 — linear-scan ops (no pair generation): the budget cut's
    # histogram/agg shuffles scale with tokens (absolute budgets just
    # fill earlier in the content order — the boundary-window cost is
    # the thing under test), the rank's histogram + fine windows with
    # rows, drift's bag counts with tokens. emb_contamination is a
    # pair generator over replicated content (verbatim vector clones
    # share every bucket) and is deliberately NOT probed this way —
    # the NEEDS policy above.
    "doc_token_budget_mix": ["documents"],
    "doc_quality_tiers": ["documents"],
    "source_drift_llr": ["documents"],
    # r10 — span rewrite is digest-keyed windows + doc re-agg (no pair
    # generation): ID-shifted verbatim clones make every chunk digest
    # an 8-way dup class, which is exactly the mass-dedup regime the
    # keep/drop windows must absorb — the digest shuffle's growth is
    # the thing under test.
    "doc_span_rewrite": ["documents"],
    # r11 — de-skewed siblings of the rewrite (same agg+join shape);
    # the stream probes run their single-epoch faces end to end
    "doc_span_dedup": ["documents"],
    "doc_span_stream": ["documents"],
    "source_dup_stream": ["documents"],
    # doc_minhash_stream is NOT probed here: it is a pair generator
    # over replicated content (verbatim clones share every band
    # bucket), the exact exclusion the NEEDS policy above names; its
    # growth story is the synth_probe held-pair-density methodology
    # via incremental_minhash_pairs, which it drives unchanged.
    "bpe_merges_local": ["documents"],
    "doc_novelty_llr": ["documents"],
    # the dup MATRIX output is replication-invariant (replicas keep
    # their source names, so the distinct (digest, source) set and
    # every containment is unchanged) — what grows is the chunking +
    # distinct shuffle feeding it, which is the plan under test
    "source_dup_matrix": ["documents"],
}


def replicate(spark, out_dir: str, tables: list[str]) -> None:
    for t in sorted(set(tables)):
        base = read_star_table(spark, SF_DIR, t)
        parts = []
        for rep in range(REPS):
            df = base
            for key in SHIFTS.get(t, []):
                df = df.withColumn(key, F.col(key) + F.lit(rep * 1_000_000_000))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def time_query(spark, name: str, sf_dir: str) -> float:
    fn, _ = REGISTRY[name]
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    unknown = [n for n in names if n not in NEEDS or n not in REGISTRY]
    if unknown:
        print(
            f"not probe-able: {unknown} — a query needs a NEEDS table "
            f"mapping (and registry entry) to be replicated; "
            f"known: {sorted(NEEDS)}",
            file=sys.stderr,
        )
        raise SystemExit(2)
    spark = get_spark("scale-probe")
    out_dir = tempfile.mkdtemp(prefix="scale8_")
    try:
        replicate(spark, out_dir, [t for n in names for t in NEEDS[n]])
        # warmup BOTH dirs so codegen/JIT/footer reads aren't billed to
        # either side's first timed pass
        for n in names:
            REGISTRY[n][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            REGISTRY[n][0](spark, out_dir).write.format("noop").mode("overwrite").save()
        for n in names:
            t1 = time_query(spark, n, SF_DIR)
            t8 = time_query(spark, n, out_dir)
            print(f"{n:24s} 1x={t1:6.2f}s  8x={t8:6.2f}s  growth={t8 / t1:4.1f}x")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
