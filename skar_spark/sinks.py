"""Response sinks — the query-server output formats (S8/S9 in SURVEY §2.1).

The reference's HTTP server answers queries as JSON or Arrow IPC with
per-entity row limits and a truncation signal so clients page with
`next_block` (README.md:130-135; skar/src/config.rs:31-44,
http_server response assembly). Spark analog: take limit+1 rows through
the Arrow path, emit the payload plus {truncated, next_cursor} so a
caller can continue via scan_paged.
"""

from __future__ import annotations

import json

import pyarrow as pa
from pyspark.sql import DataFrame

DEFAULT_ROW_LIMIT = 50_000  # the reference's response_num_*_limit default


def _limited_arrow(df: DataFrame, limit_rows: int) -> tuple[pa.Table, bool]:
    """First `limit_rows` rows as an Arrow table + truncation flag.
    Fetches limit+1 so truncation is known without a count pass."""
    t = df.limit(limit_rows + 1).toArrow()
    truncated = t.num_rows > limit_rows
    return (t.slice(0, limit_rows) if truncated else t), truncated


def json_response(df: DataFrame, limit_rows: int = DEFAULT_ROW_LIMIT,
                  cursor_col: str | None = None) -> str:
    """JSON response payload: {"rows": [...], "truncated": bool,
    "next_cursor": <max cursor_col in page>|null} — the S8 sink."""
    t, truncated = _limited_arrow(df, limit_rows)
    next_cursor = None
    if truncated and cursor_col and cursor_col in t.column_names \
            and t.num_rows:
        import pyarrow.compute as pc
        next_cursor = pc.max(t[cursor_col]).as_py()
        if hasattr(next_cursor, "isoformat"):
            next_cursor = next_cursor.isoformat()
    return json.dumps({
        "rows": json.loads(
            pa.Table.to_pandas(t).to_json(orient="records",
                                          date_format="iso")),
        "num_rows": t.num_rows,
        "truncated": truncated,
        "next_cursor": next_cursor,
    })


def arrow_ipc_response(df: DataFrame,
                       limit_rows: int = DEFAULT_ROW_LIMIT
                       ) -> tuple[bytes, bool]:
    """Arrow IPC stream payload + truncation flag — the S9 sink.
    The payload round-trips with pyarrow.ipc.open_stream."""
    t, truncated = _limited_arrow(df, limit_rows)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes(), truncated
