"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A large-scale training pipeline treats image/audio/video as opaque
`binary` columns with schema'd metadata, processed by Arrow-batched
kernels. The actual media libraries (PIL/ffmpeg/torchaudio) are NOT in
this container, so the decode step is STUBBED two ways:

- ``decode_image_meta``: a deterministic fake decoder (parses a synthetic
  header derived from the payload bytes) — keeps the Spark-side plumbing
  (schema, batching, mapInArrow signature, partition behavior) fully real
  and testable;
- ``decode_image_real``: the real-library path, gated behind an
  import-try that raises ``NotImplementedError`` here.

Everything crosses the executor boundary as Arrow batches (mapInArrow);
the per-batch kernel is vectorized numpy over the binary buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

META_DDL = ("doc_id long, n_bytes long, fake_width int, fake_height int, "
            "fake_channels int, payload_crc long")


def _fake_dims(first8: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic fake 'header parse': dims derived from payload bytes.
    Stands in for a real image header decode (PIL not in container)."""
    w = 16 + (first8[:, 0].astype(np.int32) << 4 | first8[:, 1] >> 4) % 4080
    h = 16 + (first8[:, 2].astype(np.int32) << 4 | first8[:, 3] >> 4) % 4080
    c = 1 + first8[:, 4].astype(np.int32) % 4
    return w, h, c


def decode_image_meta(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """mapInArrow kernel extracting typed metadata from binary payloads."""
    import zlib

    def kernel(batches):
        for batch in batches:
            ids = batch.column(id_col)
            pay = batch.column(payload_col)
            n = len(pay)
            lens = np.empty(n, np.int64)
            first8 = np.zeros((n, 8), np.uint8)
            crcs = np.empty(n, np.int64)
            # buffer-level walk (no per-row python string materialization)
            buf = pay.combine_chunks() if isinstance(pay, pa.ChunkedArray) else pay
            offs = np.frombuffer(buf.buffers()[1], np.int32,
                                 count=n + 1, offset=buf.offset * 4)
            data = np.frombuffer(buf.buffers()[2], np.uint8)
            for i in range(n):  # header peek + crc are C-speed per row
                s, e = offs[i], offs[i + 1]
                lens[i] = e - s
                k = min(8, e - s)
                first8[i, :k] = data[s:s + k]
                crcs[i] = zlib.crc32(data[s:e])
            w, h, c = _fake_dims(first8)
            yield pa.record_batch({
                "doc_id": ids.cast(pa.int64()),
                "n_bytes": pa.array(lens, pa.int64()),
                "fake_width": pa.array(w, pa.int32()),
                "fake_height": pa.array(h, pa.int32()),
                "fake_channels": pa.array(c, pa.int32()),
                "payload_crc": pa.array(crcs, pa.int64()),
            })

    return df.mapInArrow(kernel, schema=META_DDL)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real media decode path — requires PIL/ffmpeg, absent in this image."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires PIL; this container ships without "
            "media libraries — use decode_image_meta (deterministic stub) "
            "for plumbing tests") from e
    raise NotImplementedError("wire PIL decode here when available")


def q_multimodal_decode(spark, sf_dir: str) -> DataFrame:
    """Driver query: html binary column treated as an opaque media payload
    run through the Arrow-batched metadata decoder. Rows-only check (the
    fake header parse is not SQL-expressible)."""
    from pyspark.sql import functions as F
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = d.select("doc_id",
                       F.encode(F.col("text"), "utf-8").alias("payload"))
    out = decode_image_meta(payload)
    return out.orderBy("doc_id")
