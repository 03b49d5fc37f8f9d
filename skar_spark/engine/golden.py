"""Golden reference output — the "skar writer" stand-in (FIXTURES.md §2).

The reference's encode path writes arrow2 Parquet with `Encoding::Plain`
on every column, Lz4Raw or Zstd(9) pages, Parquet V2, statistics off,
fixed row-group size, data lexsorted by the clustering key
(/root/reference/skar/src/write_parquet.rs:49-53,131-153,232-244).
This module reproduces those exact writer settings with pyarrow and emits
a manifest of per-column compressed/uncompressed sizes plus value-buffer
checksums — the bit-identity and size oracle our engine is graded against.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROW_GROUP = 10_000  # mirror of parquet.*.max_row_group_size (README.md:187-190)


def host_of_url(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized host extraction from https://host/path urls."""
    no_scheme = pc.replace_substring_regex(urls, r"^[a-z]+://", "")
    return pc.replace_substring_regex(no_scheme, r"/.*$", "")


def sort_documents(t: pa.Table) -> pa.Table:
    """Lexsort by (host, warc_ts, url) — mirror of skar's lexsort-before-
    write clustering (write_parquet.rs:22-35,131-153)."""
    t = t.append_column("_host", host_of_url(t["url"]))
    t = t.sort_by([("_host", "ascending"), ("warc_ts", "ascending"),
                   ("url", "ascending")])
    return t.drop_columns(["_host"])


def column_checksum(arr: pa.ChunkedArray | pa.Array) -> str:
    """sha256 over canonicalized value content (offsets-normalized)."""
    from skar_spark.codecs.core import canonicalize, _filled
    from skar_spark.codecs import primitives as P
    import numpy as np

    a = canonicalize(arr)
    h = hashlib.sha256()
    h.update(np.asarray(a.is_valid()).tobytes())
    f = _filled(a)
    t = f.type
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        offs, data = P.string_parts(f)
        h.update(offs.astype("int64").tobytes())
        h.update(data)
    elif pa.types.is_boolean(t):
        h.update(np.asarray(f.to_numpy(zero_copy_only=False)).tobytes())
    else:
        import skar_spark.codecs.framing as FR
        dt = FR.numpy_dtype_for(FR.typecode(t))
        h.update(P.numeric_values(f, dt).tobytes())
    return h.hexdigest()


def write_golden(t: pa.Table, out_dir: str, sort: bool = True) -> dict:
    """Write the golden parquet + manifest; returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)
    if sort:
        t = sort_documents(t)
    path = os.path.join(out_dir, "golden.parquet")
    pq.write_table(
        t, path,
        compression="zstd", compression_level=9,
        use_dictionary=False, write_statistics=False,
        data_page_version="2.0", row_group_size=ROW_GROUP,
    )
    md = pq.ParquetFile(path).metadata
    cols: dict[str, dict] = {c: {"compressed": 0, "uncompressed": 0}
                             for c in t.column_names}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            cols[name]["compressed"] += col.total_compressed_size
            cols[name]["uncompressed"] += col.total_uncompressed_size
    for name in t.column_names:
        cols[name]["checksum"] = column_checksum(t[name])
    manifest = {
        "rows": t.num_rows,
        "file_bytes": os.path.getsize(path),
        "row_group_size": ROW_GROUP,
        "columns": cols,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
