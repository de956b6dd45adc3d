#!/usr/bin/env python3
"""Regenerate fixtures/q281_deflate_golden.parquet — the independent
(CPython zlib) oracle for q281 compressionRatio. Keyed by
(doc_id, md5(text-bytes)) so the same fixture serves any SF whose
documents appear here; rows cover sf0.001/0.01/0.1. Java's Deflater
(level 6) and CPython's zlib.compress(·, 6) both wrap madler zlib and
emit identical streams (verified: sizes match byte-for-byte on all
sample classes), so a match here is a genuine cross-implementation
check, not self-agreement."""
import duckdb, zlib, hashlib, pyarrow as pa, pyarrow.parquet as pq

con = duckdb.connect()
rows = []
for sf in ["0.001", "0.01", "0.1"]:
    df = con.execute(
        f"SELECT doc_id, text FROM read_parquet('/root/testdata/sf{sf}/documents.parquet')"
    ).fetchall()
    for doc_id, text in df:
        b = text.encode("utf-8")
        rows.append((doc_id, hashlib.md5(b).hexdigest(), len(zlib.compress(b, 6))))
rows = sorted(set(rows))
t = pa.table({
    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
    "md5_text": pa.array([r[1] for r in rows], pa.string()),
    "n_deflated": pa.array([r[2] for r in rows], pa.int64()),
})
pq.write_table(t, "/root/repo/fixtures/q281_deflate_golden.parquet")
print("rows", len(rows))
