"""Generate tests/fixtures/kafka_connector_raw.parquet — the spark-sql-kafka
contract fixture.

The sandbox has no broker and no spark-sql-kafka jar, so
``canonicalize_kafka_frame`` can never see the connector's real output here.
This fixture freezes the connector's EXACT raw schema (column names, order,
and types as documented in the Structured Streaming + Kafka integration
guide, ``includeHeaders=true`` variant):

    key         binary          nullable
    value       binary          nullable   (NULL = tombstone, b"" = alive)
    topic       string
    partition   int32
    offset      int64
    timestamp   timestamp[us]   (TimestampType; Kafka's "missing" = -1 ms,
                                 delivered as a negative value, NOT NULL)
    timestampType int32         (0=NoTimestampType, 1=CreateTime, 2=LogAppendTime)
    headers     list<struct<key string, value binary>>

Checked in as a binary parquet (not generated per-test) so schema drift in
generation code can't silently weaken the contract. Deterministic: fixed
rows, no RNG. Regenerate only deliberately:

    python tools/gen_kafka_contract_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "kafka_connector_raw.parquet",
)

US = 1_000_000  # µs per second
BASE = 1_700_000_000 * US  # 2023-11-14T22:13:20Z


def rows() -> list[dict]:
    h = [{"key": "trace-id", "value": b"\x01\x02"}]
    return [
        # partition 0: contiguous offsets, every edge case the report reads
        {"key": b"k-a", "value": b"v0", "topic": "contract", "partition": 0,
         "offset": 0, "timestamp": BASE, "timestampType": 1, "headers": h},
        # sub-millisecond µs survive: floor to ms, never round
        {"key": b"k-a", "value": b"v1-longer", "topic": "contract", "partition": 0,
         "offset": 1, "timestamp": BASE + 123_999, "timestampType": 1, "headers": []},
        # tombstone: NULL value, key present
        {"key": b"k-b", "value": None, "topic": "contract", "partition": 0,
         "offset": 2, "timestamp": BASE + 2 * US, "timestampType": 1, "headers": []},
        # missing timestamp -> Kafka -1 ms sentinel (negative, NOT null)
        {"key": b"k-c", "value": b"v3", "topic": "contract", "partition": 0,
         "offset": 3, "timestamp": -1_000, "timestampType": 0, "headers": []},
        # null key (unkeyed), empty-but-alive value
        {"key": None, "value": b"", "topic": "contract", "partition": 0,
         "offset": 4, "timestamp": BASE + 4 * US, "timestampType": 2, "headers": []},
        # partition 1: all-tombstone keyed partition (alive == 0)
        {"key": b"k-d", "value": None, "topic": "contract", "partition": 1,
         "offset": 0, "timestamp": BASE + 5 * US, "timestampType": 1, "headers": []},
        {"key": b"k-e", "value": None, "topic": "contract", "partition": 1,
         "offset": 1, "timestamp": BASE + 6 * US, "timestampType": 1, "headers": []},
        # partition 2: single unkeyed row, epoch-0 timestamp (already 0)
        {"key": None, "value": b"v-final", "topic": "contract", "partition": 2,
         "offset": 0, "timestamp": 0, "timestampType": 1, "headers": []},
    ]


def main() -> None:
    schema = pa.schema(
        [
            pa.field("key", pa.binary()),
            pa.field("value", pa.binary()),
            pa.field("topic", pa.string(), nullable=False),
            pa.field("partition", pa.int32(), nullable=False),
            pa.field("offset", pa.int64(), nullable=False),
            # tz-aware so Spark reads TimestampType (instant semantics, like
            # the connector), not TimestampNTZ
            pa.field("timestamp", pa.timestamp("us", tz="UTC"), nullable=False),
            pa.field("timestampType", pa.int32(), nullable=False),
            pa.field(
                "headers",
                pa.list_(
                    pa.struct([pa.field("key", pa.string()), pa.field("value", pa.binary())])
                ),
            ),
        ]
    )
    data = rows()
    cols = {
        name: [r[name] for r in data] for name in schema.names
    }
    table = pa.Table.from_pydict(cols, schema=schema)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {len(data)} rows -> {OUT}")


if __name__ == "__main__":
    main()
