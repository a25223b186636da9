"""Kafka source option assembly (sources/kafka.py) — pure-Python, no
connector jar, mirroring the JDBC option-assembly test strategy."""

import pytest

from relational_data_loader_spark.sources.kafka import build_kafka_options


def test_minimal_uri_defaults():
    opts = build_kafka_options("kafka://b1:9092,b2:9092/cdc.transcripts")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "cdc.transcripts",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }


def test_batch_mode_bounds_the_range():
    opts = build_kafka_options("kafka://b:9092/t", streaming=False)
    assert opts["endingOffsets"] == "latest"
    # streaming mode must NOT carry endingOffsets even if the URI pins it
    # (the streaming reader rejects the option)
    s = build_kafka_options("kafka://b:9092/t?endingOffsets=latest")
    assert "endingOffsets" not in s


def test_interpreted_and_passthrough_options():
    opts = build_kafka_options(
        "kafka://b:9092/t?startingOffsets=latest&maxOffsetsPerTrigger=500000"
        "&kafka.security.protocol=SASL_SSL"
    )
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "500000"
    assert opts["kafka.security.protocol"] == "SASL_SSL"


def test_fail_on_data_loss_default_and_override():
    """A pruned topic is the CT log-truncation case — loud by default."""
    assert build_kafka_options("kafka://b:9092/t")["failOnDataLoss"] == "true"
    assert (
        build_kafka_options("kafka://b:9092/t?failOnDataLoss=false")[
            "failOnDataLoss"
        ]
        == "false"
    )


def test_bad_uris_rejected():
    with pytest.raises(ValueError, match="bootstrap servers"):
        build_kafka_options("kafka:///t")
    with pytest.raises(ValueError, match="topic"):
        build_kafka_options("kafka://b:9092")
    with pytest.raises(ValueError, match="unknown kafka option"):
        build_kafka_options("kafka://b:9092/t?fetchsize=10")


def test_blank_option_values_rejected():
    """'?failOnDataLoss' (missing '=false') must error, not silently apply
    the default the user thinks they overrode."""
    with pytest.raises(ValueError, match="has no value"):
        build_kafka_options("kafka://b:9092/t?failOnDataLoss")
    with pytest.raises(ValueError, match="has no value"):
        build_kafka_options("kafka://b:9092/t?maxOffsetsPerTrigger=")


def test_batch_size_bounds_streaming_micro_batches():
    """spec.batch_size (C2) defaults maxOffsetsPerTrigger so an
    earliest-offsets subscription can't pull the whole backlog into one
    epoch; a URI pin wins; batch mode is unaffected."""
    opts = build_kafka_options("kafka://b:9092/t", batch_size=5_000_000)
    assert opts["maxOffsetsPerTrigger"] == "5000000"
    pinned = build_kafka_options(
        "kafka://b:9092/t?maxOffsetsPerTrigger=100", batch_size=5_000_000
    )
    assert pinned["maxOffsetsPerTrigger"] == "100"
    batch = build_kafka_options("kafka://b:9092/t", streaming=False,
                                batch_size=5_000_000)
    assert "maxOffsetsPerTrigger" not in batch
    unbounded = build_kafka_options("kafka://b:9092/t", batch_size=0)
    assert "maxOffsetsPerTrigger" not in unbounded
