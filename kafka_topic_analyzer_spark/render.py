"""Report rendering — the reference's stdout sink (S5, ``src/main.rs:123-179``).

Collects only the tiny aggregate result (one row per partition + one global
row) to the driver and formats the same 15-column table and summary block
the reference prints, with the same column headers and legend.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame

# Header order mirrors ref src/main.rs:150
TABLE_HEADERS = [
    "P", "< OS", "> OS", "Total", "Alive", "Tmb", "DR",
    "K Null", "K !Null", "P-Bytes", "K-Bytes", "V-Bytes",
    "A K-Sz", "A V-Sz", "A M-Sz",
]

_FIELDS = [
    "partition", "start_offset", "end_offset", "total", "alive", "tombstones",
    "dirty_ratio", "key_null", "key_non_null", "p_bytes", "key_bytes",
    "value_bytes", "key_size_avg", "value_size_avg", "message_size_avg",
]

LEGEND = (
    "P = Partition, OS = Offset, Tmb = Tombstone, DR = Dirty Ratio,\n"
    "K = Key, V = Value, Sz = Size, A = Average, M = Message"
)


def _fmt_ts(epoch_sec: int | None) -> str:
    if epoch_sec is None:
        return "-"
    dt = datetime.fromtimestamp(int(epoch_sec), tz=timezone.utc)
    return dt.strftime("%Y-%m-%d %H:%M:%S UTC")  # ref src/main.rs:132-133 format


def _ascii_table(headers: list[str], rows: list[list[str]]) -> str:
    widths = [
        max(len(h), *(len(r[i]) for r in rows)) if rows else len(h)
        for i, h in enumerate(headers)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "| " + " | ".join(h.ljust(w) for h, w in zip(headers, widths)) + " |", sep]
    for r in rows:
        out.append("| " + " | ".join(c.rjust(w) for c, w in zip(r, widths)) + " |")
    out.append(sep)
    return "\n".join(out)


def render_report(
    partition_df: DataFrame,
    global_df: DataFrame,
    topic: str = "topic",
    scan_seconds: float | None = None,
    alive_keys: int | None = None,
) -> str:
    """Full report text: summary block + per-partition table + legend."""
    g = global_df.collect()[0].asDict()
    rows = [r.asDict() for r in partition_df.collect()]

    lines = ["=" * 120, f"Topic analysis: {topic}"]
    if scan_seconds is not None:
        msg_s = g["overall_count"] / max(scan_seconds, 1)  # ref src/main.rs:130
        lines += [
            f"Scan time: {scan_seconds:.1f} s",
            f"Estimated Msg/s: {msg_s:,.0f}",
        ]
    lines += [
        f"Earliest message: {_fmt_ts(g['earliest_ts_sec'])}",
        f"Latest message:   {_fmt_ts(g['latest_ts_sec'])}",
        f"Largest message:  {g['largest_message']:,} bytes",
        f"Smallest message: {g['smallest_message']:,} bytes",
        f"Topic size: {g['overall_size']:,} bytes ({g['overall_count']:,} messages)",
    ]
    if alive_keys is not None:
        lines.append(f"Alive keys: {alive_keys:,}")
    lines.append("=" * 120)

    def fmt(row: dict, f: str) -> str:
        v = row[f]
        return f"{v:.4f}" if f == "dirty_ratio" else str(v)

    table_rows = [[fmt(r, f) for f in _FIELDS] for r in rows]
    lines.append(_ascii_table(TABLE_HEADERS, table_rows))
    lines.append(LEGEND)
    return "\n".join(lines)
