"""Exactly-once sink patterns (reference parity for R12-R14).

The reference gets exactly-once via Kafka transactions: offsets are
committed atomically with produced records
(``receiveExactlyOnce(transactionManager)`` + per-batch
``sender.send(...).concatWith(txn.commit())``,
StreamsApplication.java:146-150, transactional.id at :112).

Structured Streaming's replay model differs (SURVEY.md §4): the checkpoint
WAL gives exactly-once *state*; sinks are at-least-once unless the write
itself is idempotent or transactional per epoch. The patterns here close
that gap:

- ``ForeachBatchIdempotentWriter``: epoch-keyed idempotent writes — the
  batchId is stable across replays of the same epoch, so a replayed batch
  overwrites its own output instead of duplicating (file sinks) or is
  skipped via a committed-epoch ledger (any sink).
- ``kafka_transactional_batch_writer``: the foreachBatch transactional
  Kafka producer pattern (transactional.id = f"{query_id}-{partition}"),
  stubbed behind an import-try since no Kafka client ships in this
  container — the recipe and config mapping are the deliverable.

Delivery-semantics delta vs the reference, explicitly: the reference
aborts the txn on first failure then relies on redelivery
(StreamsApplication.java:151-160); Spark re-runs the failed epoch from the
checkpoint. Both end exactly-once for committed output; the reference's
"second failure commits empty" subtlety (:157-158) is subsumed — a Spark
epoch either commits its sink writes + checkpoint or neither.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class ForeachBatchIdempotentWriter:
    """Epoch-keyed idempotent file writer for ``foreachBatch``.

    Each micro-batch lands in ``{base_dir}/batch_id={epoch}`` with
    overwrite semantics plus a ledger entry; a replayed epoch rewrites the
    same directory (no dup) and an interrupted write is invisible until
    the ledger records it. Works on any filesystem with atomic rename —
    locally and on object stores via committers.
    """

    base_dir: str
    fmt: str = "parquet"

    @property
    def ledger_path(self) -> str:
        return os.path.join(self.base_dir, "_committed_epochs.json")

    def committed_epochs(self) -> set[int]:
        try:
            with open(self.ledger_path) as f:
                return set(json.load(f))
        except (FileNotFoundError, json.JSONDecodeError):
            return set()

    def _record(self, epoch_id: int) -> None:
        epochs = self.committed_epochs()
        epochs.add(int(epoch_id))
        tmp = self.ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(epochs), f)
        os.replace(tmp, self.ledger_path)  # atomic publish

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if int(epoch_id) in self.committed_epochs():
            return  # replayed epoch: already fully committed, skip
        out = os.path.join(self.base_dir, f"batch_id={int(epoch_id)}")
        batch_df.write.mode("overwrite").format(self.fmt).save(out)
        self._record(epoch_id)


def kafka_transactional_batch_writer(
    bootstrap_servers: str,
    topic: str = "replies",
    transactional_id_prefix: str = "kssp",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body reproducing the reference's transactional produce
    (R12): all records of the epoch in one Kafka transaction, committed
    before the epoch checkpoints.

    Requires a Kafka client library on the executors/driver; none ships in
    this container, so constructing the writer raises with the exact
    recipe. The idempotence story: ``transactional.id`` is stable per
    (query, partition-set), so a replayed epoch fences the old producer
    (zombie fencing) and its re-send is the transaction that counts.
    """
    try:  # pragma: no cover - not installed here
        from kafka import KafkaProducer  # type: ignore[import-not-found]  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Kafka client not available in this environment. Recipe: in "
            "foreachBatch(batch_df, epoch_id): collect per-partition via "
            "batch_df.rdd.foreachPartition with a KafkaProducer("
            f"bootstrap_servers={bootstrap_servers!r}, "
            f"transactional_id=f'{transactional_id_prefix}-{{query_id}}-{{partition}}'), "
            "producer.init_transactions(); begin_transaction(); "
            f"send all rows to {topic!r}; commit_transaction(). "
            "A replayed epoch re-runs the same transactional.id and fences "
            "the previous attempt (exactly-once)."
        ) from e


def run_with_restarts(
    start_query: Callable[[], "object"],
    max_restarts: int = 3,
    on_failure: Callable[[int, Exception], None] | None = None,
):
    """Supervised restart loop (R14: the reference's ``while (!closed)``
    rebuild at StreamsApplication.java:135-171).

    Each restart resumes from the checkpoint (the analog of resuming from
    transaction-committed offsets). Returns when the query stops cleanly;
    re-raises after ``max_restarts`` consecutive failures.
    """
    attempt = 0
    while True:
        query = start_query()
        try:
            query.awaitTermination()
            return query
        except Exception as e:  # noqa: BLE001 - supervision boundary
            attempt += 1
            if on_failure:
                on_failure(attempt, e)
            if attempt > max_restarts:
                raise
