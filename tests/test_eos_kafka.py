"""Kafka transactional-writer semantics against a fake broker.

No Kafka client ships in this container, so the broker/producer pair here
implements exactly the transactional contract the writer depends on:
pending buffers become visible only on commit_transaction, abort discards
them, and init_transactions with an existing transactional.id fences the
previous producer generation (reference semantics:
StreamsApplication.java:112,146-150).
"""

from __future__ import annotations

import pytest

from kafka_stream_service_spark.eos import (
    KafkaTransactionalEpochWriter,
    kafka_transactional_batch_writer,
)


class Fenced(Exception):
    pass


class FakeBroker:
    def __init__(self):
        self.committed: dict[str, list[tuple]] = {}  # topic -> [(key, value)]
        self.generation: dict[str, int] = {}  # transactional_id -> current gen

    def producer(self, txn_id: str) -> "FakeProducer":
        return FakeProducer(self, txn_id)

    def last_committed_epoch(self, txn_id: str, marker_topic: str):
        """What a read_committed consumer on the marker topic would see."""
        epochs = [v for k, v in self.committed.get(marker_topic, []) if k == txn_id]
        return max(epochs) if epochs else None


class FakeProducer:
    def __init__(self, broker: FakeBroker, txn_id: str):
        self.broker = broker
        self.txn_id = txn_id
        self.gen = None
        self.pending: list[tuple[str, object, object]] = []
        self.in_txn = False
        self.log: list[str] = []

    def _check_fenced(self):
        if self.gen != self.broker.generation.get(self.txn_id):
            raise Fenced(f"producer generation {self.gen} fenced")

    def init_transactions(self):
        # bumping the generation aborts/fences any previous producer
        self.broker.generation[self.txn_id] = self.broker.generation.get(self.txn_id, 0) + 1
        self.gen = self.broker.generation[self.txn_id]
        self.log.append("init")

    def begin_transaction(self):
        self._check_fenced()
        assert not self.in_txn, "nested transaction"
        self.in_txn = True
        self.pending = []
        self.log.append("begin")

    def send(self, topic, key, value):
        self._check_fenced()
        assert self.in_txn, "send outside transaction"
        self.pending.append((topic, key, value))

    def commit_transaction(self):
        self._check_fenced()
        assert self.in_txn
        for topic, key, value in self.pending:
            self.broker.committed.setdefault(topic, []).append((key, value))
        self.pending = []
        self.in_txn = False
        self.log.append("commit")

    def abort_transaction(self):
        assert self.in_txn
        self.pending = []
        self.in_txn = False
        self.log.append("abort")


def test_happy_path_commits_records_and_marker():
    broker = FakeBroker()
    w = KafkaTransactionalEpochWriter(broker.producer, topic="replies", transactional_id="t1")
    assert w.write_epoch(0, [(b"k1", b"v1"), (b"k2", b"v2")]) is True
    assert broker.committed["replies"] == [(b"k1", b"v1"), (b"k2", b"v2")]
    # the epoch marker commits atomically with the records
    assert broker.committed["replies.epochs"] == [("t1", 0)]
    assert w._producer.log == ["init", "begin", "commit"]


def test_failure_mid_send_aborts_then_replay_commits_once():
    broker = FakeBroker()
    w = KafkaTransactionalEpochWriter(broker.producer, topic="replies", transactional_id="t1")

    def exploding():
        yield (b"k1", b"v1")
        raise RuntimeError("source failure mid-epoch")

    with pytest.raises(RuntimeError, match="mid-epoch"):
        w.write_epoch(0, exploding())
    # nothing visible: the abort discarded the partial transaction
    assert broker.committed == {}
    assert w._producer.log == ["init", "begin", "abort"]

    # Spark replays the epoch; the retry commits exactly one copy
    assert w.write_epoch(0, [(b"k1", b"v1"), (b"k2", b"v2")]) is True
    assert broker.committed["replies"] == [(b"k1", b"v1"), (b"k2", b"v2")]


def test_committed_epoch_replay_is_skipped():
    broker = FakeBroker()
    w = KafkaTransactionalEpochWriter(broker.producer, transactional_id="t1")
    w.write_epoch(7, [(b"k", b"v")])
    # crash after commit but before checkpoint: new writer resumes from
    # the broker's marker tail and must NOT double-produce epoch 7
    resumed = KafkaTransactionalEpochWriter(
        broker.producer,
        transactional_id="t1",
        last_committed_epoch=broker.last_committed_epoch("t1", "replies.epochs"),
    )
    assert resumed.write_epoch(7, [(b"k", b"v")]) is False
    assert broker.committed["replies"] == [(b"k", b"v")]  # still one copy
    assert resumed.write_epoch(8, [(b"k2", b"v2")]) is True
    assert broker.committed["replies"] == [(b"k", b"v"), (b"k2", b"v2")]


def test_zombie_producer_is_fenced():
    broker = FakeBroker()
    zombie = KafkaTransactionalEpochWriter(broker.producer, transactional_id="t1")
    zombie.write_epoch(0, [(b"a", b"1")])
    # a restarted writer takes over the same transactional.id
    successor = KafkaTransactionalEpochWriter(broker.producer, transactional_id="t1")
    successor.write_epoch(1, [(b"b", b"2")])
    # the zombie's next transaction must be rejected, not silently merged
    with pytest.raises(Fenced):
        zombie.write_epoch(1, [(b"a", b"dup")])
    committed = broker.committed["replies"]
    assert (b"b", b"2") in committed and (b"a", b"dup") not in committed


def test_foreachbatch_adapter_extracts_columns(spark):
    broker = FakeBroker()
    body = kafka_transactional_batch_writer(
        broker.producer, topic="out", transactional_id="q1", key_col="k", value_col="v"
    )
    batch = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    body(batch, 0)  # exactly what foreachBatch invokes
    assert sorted(broker.committed["out"]) == [("a", "1"), ("b", "2")]
    assert broker.committed["out.epochs"] == [("q1", 0)]
    body(batch, 0)  # replayed epoch: writer remembers the commit
    assert len(broker.committed["out"]) == 2
