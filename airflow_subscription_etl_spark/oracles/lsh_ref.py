"""Driver-side reference implementations → generated VALUES oracles
for the three queries whose Spark plans are seeded by ``xxhash64``
(MinHash LSH, SimHash, IVF): the same trick that oracled ``mm_resize``
(queries.py::_sql_mm_resize). Each function recomputes the ENTIRE
operator single-threaded in plain Python/numpy over the fixture
parquet — no Spark — using the bit-exact XXH64 replica
(:mod:`.xxh64`, validated against ``F.xxhash64`` in
tests/test_oracle_hash.py), and emits the expected output as a VALUES
table for DuckDB. The comparison then pins that the distributed
execution (banded self-joins, broadcast Lloyd iterations, partitioned
top-k) reproduces the sequential reference EXACTLY — signatures,
bucketing, tie-breaks, and float arithmetic included.

Float discipline: every value that reaches the output is computed with
the same operation ORDER Spark's expression tree uses (sequential
``aggregate`` folds in float64), so doubles match bit-for-bit and the
driver's stringified comparison holds. Intermediate k-means centroids
are float32-truncated by the operator itself, which absorbs the one
place (grouped ``avg``) where Spark's summation order is
partitioning-dependent.

Tokenization parity notes (dedup.norm_tokens = split(trim(lower(s)),
'\\s+')): Spark ``trim`` strips 0x20 only, and Java's ``\\s`` is ASCII
[ \\t\\n\\x0b\\f\\r] — both replicated literally here rather than via
Python's unicode-aware ``strip``/``\\s``.
"""

from __future__ import annotations

import os
import re
from collections import defaultdict

from .xxh64 import MASK64, hash_bytes, hash_int, hash_long, to_signed

#: Java's \s (no UNICODE_CHARACTER_CLASS) is exactly this ASCII set —
#: Python's \s would also eat U+00A0 etc. and diverge
_JAVA_WS_RUN = re.compile(r"[ \t\n\x0b\f\r]+")


def _norm_tokens(text: str) -> list[str]:
    """split(trim(lower(s)), '\\s+') with Spark/Java semantics: trim
    strips 0x20 only; split keeps a leading/trailing empty token when
    non-space whitespace survives the trim (Java limit=-1)."""
    return _JAVA_WS_RUN.split(text.lower().strip(" "))


def _docs(sf_dir: str) -> list[tuple[int, str]]:
    import pyarrow.parquet as pq  # noqa: PLC0415

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    d = t.to_pydict()
    return list(zip(d["doc_id"], d["text"]))


def _values_sql(rows: list[str], cols: str) -> str | None:
    if not rows:
        return None
    return f"SELECT {cols} FROM (VALUES " + ",".join(rows) + ") AS t(c0, c1, c2)"


def _dbl(v: float) -> str:
    """Bit-exact double literal: VARCHAR → DOUBLE cast (a bare decimal
    literal would land in DuckDB's DECIMAL type and re-round)."""
    return f"'{v!r}'"


# --- MinHash LSH (dedup.minhash_lsh_pairs) ----------------------------------


def _minhash_signature(
    text: str | None, k_shingle: int, num_hashes: int
) -> list[int]:
    if text is None:
        # Spark: NULL text → NULL token array → size() = -1 → one index
        # [0] whose F.get lookups are all NULL → xxhash64 of all-NULL
        # args returns the SEED (42). Every null-text doc therefore
        # carries the identical [42]-shingle signature and pairs at
        # est_jaccard 1.0 — replicated, NOT skipped (verified against
        # the operator in tests/test_lsh_oracles.py).
        distinct = [42]
    else:
        th = [
            to_signed(hash_bytes(t.encode("utf-8"), 42)) for t in _norm_tokens(text)
        ]
        n = len(th)
        sh: list[int] = []
        for i in range(max(n - k_shingle, 0) + 1):
            h = 42
            for j in range(k_shingle):
                if i + j < n:  # F.get beyond length → NULL → skipped
                    h = hash_long(th[i + j], h)
            sh.append(to_signed(h))
        distinct = list(dict.fromkeys(sh))
    sig: list[int] = []
    for perm in range(num_hashes):
        best = None
        for x in distinct:
            v = to_signed(hash_int(perm, hash_long(x, 42)))
            if best is None or v < best:
                best = v
        sig.append(best)  # type: ignore[arg-type]
    return sig


def minhash_pairs_reference(
    sf_dir: str,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
) -> list[tuple[int, int, float]]:
    docs = _docs(sf_dir)
    sigs = {
        int(doc_id): _minhash_signature(text, k_shingle, num_hashes)
        for doc_id, text in docs
    }
    rows_per_band = num_hashes // bands
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for doc_id, sig in sigs.items():
        for b in range(bands):
            csv = ",".join(str(v) for v in sig[b * rows_per_band : (b + 1) * rows_per_band])
            buckets[(b, to_signed(hash_bytes(csv.encode("utf-8"), 42)))].append(doc_id)
    seen: set[tuple[int, int]] = set()
    out: list[tuple[int, int, float]] = []
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b_id in members[i + 1 :]:
                if (a, b_id) in seen:
                    continue
                sa, sb = sigs[a], sigs[b_id]
                est = sum(x == y for x, y in zip(sa, sb)) / float(num_hashes)
                if est >= threshold:
                    seen.add((a, b_id))
                    out.append((a, b_id, est))
    return out


_ORACLE_CACHE: dict[tuple[str, str], str | None] = {}


def _cached(kind: str, build) -> str | None:
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    key = (kind, sf_dir)
    if key not in _ORACLE_CACHE:
        try:
            _ORACLE_CACHE[key] = build(sf_dir)
        except OSError:  # unreadable/missing fixture → rows-only
            # ONLY the documented environment case degrades silently —
            # a programming error in a reference must RAISE, not get
            # cached as None and quietly weaken four oracle checks
            _ORACLE_CACHE[key] = None
    return _ORACLE_CACHE[key]


def sql_doc_minhash_pairs() -> str | None:
    def build(sf_dir: str) -> str | None:
        rows = [
            f"({a},{b},{_dbl(est)})"
            for a, b, est in minhash_pairs_reference(sf_dir)
        ]
        return _values_sql(
            rows,
            "CAST(c0 AS BIGINT) AS id_a, CAST(c1 AS BIGINT) AS id_b, "
            "CAST(c2 AS DOUBLE) AS est_jaccard",
        )

    return _cached("minhash", build)


# --- SimHash (dedup.simhash_near_pairs) -------------------------------------


def _simhash(text: str) -> int:
    import numpy as np  # noqa: PLC0415

    th = [hash_bytes(t.encode("utf-8"), 42) & MASK64 for t in _norm_tokens(text)]
    arr = np.array(th, dtype=np.uint64)
    # bit i of each hash; vote sum > 0  ⟺  2·ones > n
    ones = ((arr[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).sum(
        axis=0
    )
    n = len(th)
    sig = 0
    for i in range(64):
        if 2 * int(ones[i]) > n:
            sig |= 1 << i
    return to_signed(sig)


def simhash_pairs_reference(
    sf_dir: str, max_hamming: int = 16
) -> list[tuple[int, int, int]]:
    docs = _docs(sf_dir)
    # NULL text → Spark's per-bit when(vote>0).otherwise(0) over a NULL
    # vote yields signature 0, so null-text docs DO bucket together and
    # emit hamming-0 pairs — replicate, don't skip. (The MinHash path
    # handles NULLs inside _minhash_signature: identical [42]-shingle
    # signatures → est 1.0 pairs, also emitted.)
    sigs = {
        int(doc_id): (_simhash(text) if text is not None else 0)
        for doc_id, text in docs
    }
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for doc_id, sig in sigs.items():
        for chunk in range(4):
            buckets[(chunk, (sig >> (chunk * 16)) & 0xFFFF)].append(doc_id)
    seen: set[tuple[int, int]] = set()
    out: list[tuple[int, int, int]] = []
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b_id in members[i + 1 :]:
                if (a, b_id) in seen:
                    continue
                ham = bin((sigs[a] ^ sigs[b_id]) & MASK64).count("1")
                if ham <= max_hamming:
                    seen.add((a, b_id))
                    out.append((a, b_id, ham))
    return out


def sql_doc_simhash_pairs() -> str | None:
    def build(sf_dir: str) -> str | None:
        rows = [f"({a},{b},{h})" for a, b, h in simhash_pairs_reference(sf_dir)]
        return _values_sql(
            rows,
            "CAST(c0 AS BIGINT) AS id_a, CAST(c1 AS BIGINT) AS id_b, "
            "CAST(c2 AS INTEGER) AS hamming",
        )

    return _cached("simhash", build)


# --- IVF top-k (similarity.ivf_topk) ----------------------------------------


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _seq_d2(a, b) -> float:
    """Sequential-fold squared L2 — bit-matches Spark's F.aggregate
    fold (and ivfpq_topk's driver probe). numpy's pairwise-unrolled
    .sum() would disagree in final ulps, and assignment/probe argmins
    DECIDE on those values — near-ties must break identically."""
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc = acc + d * d
    return acc


def _seq_norm(a) -> float:
    import math  # noqa: PLC0415

    acc = 0.0
    for x in a:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _ivf_fit(sf_dir: str, n_lists: int, lloyd_iters: int):
    """Shared IVF coarse-quantizer replication: ids, raw float32
    matrix, float64 view, min-id query vector, final assignments and
    the (list_ids, centroids) table — exactly
    similarity.ivf_assignments' semantics.

    Seeds are the ``n_lists`` smallest xxhash64(vec_id) (rank →
    list_id). Lloyd: argmin over squared L2 (ties → lowest list_id:
    rows stay sorted by list_id so argmin's first-minimum is the
    lowest id), then float64 means truncated to float32 — the
    operator's cast("float") boundary, which absorbs sub-ulp
    summation-order differences vs Spark's partitioning-dependent
    avg(). A list that captures no vectors DROPS OUT of the centroid
    table (Spark's groupBy only yields assigned lists) — replicated.
    """
    import numpy as np  # noqa: PLC0415
    import pyarrow.parquet as pq  # noqa: PLC0415

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    d = t.to_pydict()
    ids = [int(v) for v in d["vec_id"]]
    X32 = np.array(d["embedding"], dtype=np.float32)  # raw storage dtype
    X = X32.astype(np.float64)
    qv = X32[int(np.argmin(ids))].astype(np.float64)  # min vec_id's vector

    hashed = sorted(range(len(ids)), key=lambda i: to_signed(hash_long(ids[i], 42)))
    list_ids = list(range(n_lists))
    centroids = X32[hashed[:n_lists]].astype(np.float64)  # list_id = rank

    # assignment argmin distances via SEQUENTIAL folds (see _seq_d2 —
    # a numpy pairwise sum could flip near-tie assignments); only the
    # centroid MEANS stay numpy, where the float32 truncation below
    # absorbs summation-order ulps by design
    def _assign():
        return np.asarray(
            [
                min(
                    ((_seq_d2(row, centroids[pos]), list_ids[pos]) for pos in range(len(list_ids)))
                )[1]
                for row in X
            ]
        )

    for _ in range(max(1, lloyd_iters)):
        assign = _assign()
        survivors = [lid for lid in list_ids if (assign == lid).any()]
        centroids = (
            np.stack([X[assign == lid].mean(axis=0) for lid in survivors])
            .astype(np.float32)
            .astype(np.float64)
        )
        list_ids = survivors
    # final assignment against the FINAL centroids — mirrors
    # similarity.ivf_assignments' r12 fix: the returned pair must be
    # mutually consistent (the in-loop assign described the previous
    # centroid table)
    assign = _assign()
    return ids, X32, X, qv, assign, list_ids, centroids


def _probe_lists(qv, list_ids, centroids, nprobe: int) -> list[int]:
    probe = sorted(
        range(len(list_ids)),
        key=lambda pos: (_seq_d2(centroids[pos], qv), list_ids[pos]),
    )[:nprobe]
    return [list_ids[pos] for pos in probe]


def ivf_topk_reference(
    sf_dir: str,
    k: int = 20,
    n_lists: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 2,
) -> list[tuple[int, float]]:
    ids, X32, _X, qv, assign, list_ids, centroids = _ivf_fit(
        sf_dir, n_lists, lloyd_iters
    )
    probe_set = set(_probe_lists(qv, list_ids, centroids, nprobe))

    # exact cosine for candidates, SEQUENTIAL float64 folds (bit-match
    # to similarity.dot/l2_norm's aggregate order)
    qn = _seq_norm(qv)
    scored = []
    for i, vid in enumerate(ids):
        if int(assign[i]) not in probe_set:
            continue
        sim = _seq_dot(X32[i], qv) / (_seq_norm(X32[i]) * qn)
        scored.append((vid, sim))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[:k]


def _round_half_up_spark(v: float) -> int:
    """Spark's round(double): the double's SHORTEST-DECIMAL string →
    BigDecimal → HALF_UP (BigDecimal.valueOf goes through
    Double.toString). Python's repr is the same shortest decimal, so
    Decimal(repr(v)) replicates the pre-round value exactly."""
    import decimal  # noqa: PLC0415

    return int(
        decimal.Decimal(repr(v)).to_integral_value(rounding=decimal.ROUND_HALF_UP)
    )


def _d2_micro_ref(a, b) -> int:
    """similarity._d2_micro: Σ_d round(((a_d−b_d)·(a_d−b_d))·1e6) as
    exact integers, same per-term expression order."""
    tot = 0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        tot += _round_half_up_spark(d * d * 1_000_000.0)
    return tot


def ivfpq_topk_reference(
    sf_dir: str,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    lloyd_iters: int = 2,
) -> list[tuple[int, int, str, int]]:
    """similarity.ivfpq_topk replicated: residuals vs the Lloyd
    centroids, md5-ranked residual codebook, per-list query residuals,
    integer-micro ADC. Scores are exact integers → no float-compare
    risk in the oracle at all."""
    import hashlib  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    ids, _X32, X, qv, assign, list_ids, centroids = _ivf_fit(
        sf_dir, n_lists, lloyd_iters
    )
    dims = X.shape[1]
    dsub = dims // m
    cent_by_lid = {lid: centroids[pos] for pos, lid in enumerate(list_ids)}
    res = X - np.stack([cent_by_lid[int(a)] for a in assign])

    # codebook: residual subvectors of the n_codes rows with the
    # smallest (md5(str(id)), id) — pq_codebook's TakeOrdered sample
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )[:n_codes]
    cb = [[res[i][j * dsub : (j + 1) * dsub] for i in order] for j in range(m)]

    probes = _probe_lists(qv, list_ids, centroids, nprobe)
    qres = {lid: qv - cent_by_lid[lid] for lid in probes}
    probe_set = set(probes)

    out = []
    for i, vid in enumerate(ids):
        lid = int(assign[i])
        if lid not in probe_set:
            continue
        codes = []
        approx = 0
        for j in range(m):
            sub = res[i][j * dsub : (j + 1) * dsub]
            best = min(
                (( _d2_micro_ref(sub, cb[j][c]), c) for c in range(n_codes))
            )[1]
            codes.append(best)
            approx += _d2_micro_ref(qres[lid][j * dsub : (j + 1) * dsub], cb[j][best])
        out.append((vid, lid, ",".join(str(c) for c in codes), approx))
    out.sort(key=lambda r: (r[3], r[0]))
    return out[:k]


def sql_emb_ivfpq_topk() -> str | None:
    def build(sf_dir: str) -> str | None:
        rows = [
            f"({vid},{lid},'{codes}',{approx})"
            for vid, lid, codes, approx in ivfpq_topk_reference(sf_dir)
        ]
        if not rows:
            return None
        return (
            "SELECT CAST(c0 AS BIGINT) AS vec_id, CAST(c1 AS INTEGER) AS list_id, "
            "c2 AS pq_codes, CAST(c3 AS BIGINT) AS approx_d2_micro "
            "FROM (VALUES " + ",".join(rows) + ") AS t(c0, c1, c2, c3)"
        )

    return _cached("ivfpq", build)


def sql_emb_ivf_topk() -> str | None:
    def build(sf_dir: str) -> str | None:
        rows = [f"({vid},{_dbl(sim)},0)" for vid, sim in ivf_topk_reference(sf_dir)]
        return _values_sql(
            rows,
            "CAST(c0 AS BIGINT) AS vec_id, CAST(c1 AS DOUBLE) AS cosine_sim",
        )

    return _cached("ivf", build)
