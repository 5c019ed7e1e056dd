"""Python Data Source API (Spark 4): a deterministic synthetic-corpus
generator, registered as ``spark.read.format("synthdocs")``.

The reference reads fixed JSON fixtures (subscription_flow.py:27–34);
a scale-focused engine also needs a *generator* source — the TPC-DS
dsdgen analogue — so scale probes and soak tests can materialize an
arbitrarily large corpus without shipping data. The Python Data Source
API is the Spark-4-native way to plug one in: the planner asks
:meth:`SynthDocsReader.partitions` for the split layout, then runs
:meth:`read` once per partition ON EXECUTORS — generation is
partition-parallel, so a 1000-executor cluster generates 1000 ways.

Determinism contract (same as every sampling op here): content derives
from ``md5(doc_id)`` only — never from partition layout, RNG state, or
time — so any (rows, partitions) request yields byte-identical rows in
any order, and a regenerated corpus reproduces exactly. The generated
schema matches the ``documents`` star table, so every corpus operator
(dedup, quality, batching…) runs on generated data unchanged.
"""

from __future__ import annotations

import hashlib

try:  # pragma: no cover — API added in Spark 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    _HAS_PYDS = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]
    _HAS_PYDS = False

#: tiny fixed vocabulary — enough to exercise tokenizers/dedup without
#: shipping wordlists; mirrors the flavor of the driver's testdata
_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window join shuffle plan the a of to is and filter push"
).split()


def _doc_text(
    doc_id: int, min_words: int = 20, span: int = 21, vocab_size: int = 0
) -> str:
    """Deterministic word stream for one doc: md5(doc_id) seeds both
    the length (min_words..min_words+span-1) and every word pick.
    Pure function of doc_id — no RNG object, no partition state.

    ``vocab_size`` > 0 draws words from a synthetic ``w<k>`` space of
    that size instead of the fixed 26-word list. Scale probes size it
    PROPORTIONAL to the corpus (real distinct corpora draw from an
    effectively unbounded n-gram space, so shingle diversity grows
    with corpus size): at fixed vocab, background shingle collisions
    grow quadratically by the birthday bound — which would measure the
    vocabulary, not the plan."""
    h = hashlib.md5(str(doc_id).encode()).digest()
    n = min_words + h[0] % span
    words = []
    x = int.from_bytes(h[1:9], "big")
    for i in range(n):
        # xorshift64* step — cheap, stateless given the seed
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        if vocab_size > 0:
            words.append(f"w{x % vocab_size}")
        else:
            words.append(_VOCAB[x % len(_VOCAB)])
    return " ".join(words)


class _Range(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.vocab_size = int(options.get("vocabSize", 0))
        if self.rows < 0 or self.num_partitions <= 0 or self.vocab_size < 0:
            raise ValueError(
                f"need rows >= 0, partitions > 0, vocabSize >= 0, got "
                f"{self.rows}/{self.num_partitions}/{self.vocab_size}"
            )

    def partitions(self):  # noqa: D102 — API hook
        per = -(-self.rows // self.num_partitions) if self.rows else 0
        return [
            _Range(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per or 1)
        ] or [_Range(0, 0)]

    def read(self, partition):  # noqa: D102 — runs on executors
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id, vocab_size=self.vocab_size)
            yield (
                doc_id,
                text,
                "en",
                f"src{doc_id % 20}",
                len(text),
            )


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming leg: each micro-batch emits the next ``rowsPerBatch``
    doc ids until the ``rows`` cap, then empty batches with a frozen
    offset (so ``processAllAvailable``/availableNow terminate).

    Offsets are plain dicts ``{"next": k}``; because content is a pure
    function of doc_id, :meth:`readBetweenOffsets` replays any offset
    range byte-identically after a restart — exactly the replayability
    contract Structured Streaming requires of a source.
    """

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 100))
        self.vocab_size = int(options.get("vocabSize", 0))
        if self.rows < 0 or self.per_batch <= 0 or self.vocab_size < 0:
            raise ValueError(
                f"need rows >= 0, rowsPerBatch > 0, vocabSize >= 0, got "
                f"{self.rows}/{self.per_batch}/{self.vocab_size}"
            )

    def initialOffset(self) -> dict:  # noqa: N802 — API hook
        return {"next": 0}

    def _gen(self, start: int, end: int) -> list:
        # a LIST, not a generator: the simple-reader prefetch wrapper
        # pickles the returned rows to replay them on executors
        return [
            (doc_id, text, "en", f"src{doc_id % 20}", len(text))
            for doc_id in range(start, end)
            for text in (_doc_text(doc_id, vocab_size=self.vocab_size),)
        ]

    def read(self, start: dict):  # noqa: D102 — API hook
        s = int(start["next"])
        # never move the offset BACKWARDS: restarting from a checkpoint
        # with a lowered `rows` cap must freeze at the prior high-water
        # mark (emit nothing), not emit a regressing offset the engine
        # would reject or replay as a negative range
        e = max(s, min(s + self.per_batch, self.rows))
        # iter() over the list: the runner drains with next() AND
        # pickles — list_iterator satisfies both (a bare generator
        # can't pickle, a bare list can't next())
        return iter(self._gen(s, e)), {"next": e}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter(self._gen(int(start["next"]), int(end["next"])))


class SynthDocsDataSource(DataSource):
    """``spark.read[Stream].format("synthdocs").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:  # noqa: N802
        return SynthDocsStreamReader(self.options)


def register_synthdocs(spark) -> bool:
    """Register the source on a session; False if this Spark lacks the
    Python Data Source API (import-gated, never raises)."""
    if not _HAS_PYDS:
        return False
    spark.dataSource.register(SynthDocsDataSource)
    return True
