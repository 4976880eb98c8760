#!/usr/bin/env python3
"""Deterministic scale-up of the driver testdata (for the sf1 scale check).

Reads sf0.1 and writes an F-times-larger dataset with the same schema and
referential structure: dimension keys are replica-offset (dense 0-based in
the source, so replica r shifts every key space by r * N), fact FKs shift
with their dimension, and the fixed dimensions (region, nation) stay as-is.
Document text gets a per-replica suffix token (replicas are near-dups of
their source doc, not byte-equal — realistic for dedup at scale) and
embeddings get a tiny exact-float32 first-coordinate offset so distance
ties stay broken. Physical parquet types are preserved (events.ts stays
TIMESTAMP(NANOS) — the Spark side reads it via nanosAsLong).

The correctness check is self-consistent: Spark and the DuckDB oracle read
the SAME generated files, so this never substitutes for the driver's own
sf0.01/sf0.1 gate — it answers "does every plan still hash-match one decade
up" (VERDICT r5, task 6).

Usage: gen_scale.py [src_dir] [dst_dir] [factor]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
dst = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/testdata/sf1'
F = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(dst, exist_ok=True)


def read(name):
    t = pq.read_table(f'{src}/{name}.parquet')
    return t.replace_schema_metadata(None)


def write(name, t):
    # Small row groups keep Spark's scan parallel: a single maximal row
    # group would pin every scan-side stage to ONE task (first sf1 run:
    # 16 idle cores behind a 960s single-task stage).
    rg = max(t.num_rows // 32, 1024)
    pq.write_table(t, f'{dst}/{name}.parquet', row_group_size=rg)
    print(f'{name}: {t.num_rows} rows (rg={rg})')


def offset(t, col, n, r):
    i = t.schema.get_field_index(col)
    shifted = pc.add(t.column(col), pa.scalar(r * n, type=t.schema.field(col).type))
    return t.set_column(i, t.schema.field(col), shifted)


def renumber_name(t, col, prefix):
    """Rewrite Name#%09d tags from the (already offset) key in column 0."""
    keys = t.column(0).to_pylist()
    names = pa.array([f'{prefix}#{k:09d}' for k in keys], type=pa.string())
    i = t.schema.get_field_index(col)
    return t.set_column(i, t.schema.field(col), names)


def replicate(name, transform):
    # Stream replicas through one ParquetWriter instead of materializing all
    # F parts: at F=2000 (sf200) the concat form holds ~60 GB of lineitem
    # arrow buffers before the first byte is written. Flushing every ~8M
    # buffered rows keeps peak memory at one chunk while still emitting
    # row groups small enough for a parallel scan (the write() comment's
    # single-maximal-row-group trap).
    base = read(name)
    total = base.num_rows * F
    flush_rows = max(min(8_000_000, total // 32), 1024)
    writer = None
    buf, buf_rows, groups = [], 0, 0
    for r in range(F):
        part = transform(base, r)
        buf.append(part)
        buf_rows += part.num_rows
        if buf_rows >= flush_rows or r == F - 1:
            chunk = pa.concat_tables(buf)
            if writer is None:
                writer = pq.ParquetWriter(f'{dst}/{name}.parquet', chunk.schema)
            writer.write_table(chunk, row_group_size=flush_rows)
            groups += 1
            buf, buf_rows = [], 0
    writer.close()
    print(f'{name}: {total} rows (rg={flush_rows}, chunks={groups})')
    return base.num_rows


# fixed dimensions: copy untouched
for name in ('region', 'nation'):
    write(name, read(name))

n_cust = pc.max(read('customer').column('c_custkey')).as_py() + 1
n_supp = pc.max(read('supplier').column('s_suppkey')).as_py() + 1
n_part = pc.max(read('part').column('p_partkey')).as_py() + 1
n_ord = pc.max(read('orders').column('o_orderkey')).as_py() + 1
n_ev = pc.max(read('events').column('event_id')).as_py() + 1
n_user = pc.max(read('events').column('user_id')).as_py() + 1
n_doc = pc.max(read('documents').column('doc_id')).as_py() + 1
n_vec = pc.max(read('embeddings').column('vec_id')).as_py() + 1

replicate('customer', lambda t, r: renumber_name(
    offset(t, 'c_custkey', n_cust, r), 'c_name', 'Customer'))
replicate('supplier', lambda t, r: renumber_name(
    offset(t, 's_suppkey', n_supp, r), 's_name', 'Supplier'))
replicate('part', lambda t, r: offset(t, 'p_partkey', n_part, r))
replicate('orders', lambda t, r: offset(
    offset(t, 'o_orderkey', n_ord, r), 'o_custkey', n_cust, r))
replicate('lineitem', lambda t, r: offset(offset(offset(
    t, 'l_orderkey', n_ord, r), 'l_partkey', n_part, r), 'l_suppkey', n_supp, r))
replicate('events', lambda t, r: offset(
    offset(t, 'event_id', n_ev, r), 'user_id', n_user, r))


def doc_replica(t, r):
    t = offset(t, 'doc_id', n_doc, r)
    if r == 0:
        return t
    text = pc.binary_join_element_wise(t.column('text'), pa.scalar(f' rep{r}'), '')
    t = t.set_column(t.schema.get_field_index('text'), t.schema.field('text'), text)
    n = pc.cast(pc.utf8_length(text), t.schema.field('n_chars').type)
    return t.set_column(t.schema.get_field_index('n_chars'), t.schema.field('n_chars'), n)


replicate('documents', doc_replica)


def emb_replica(t, r):
    t = offset(t, 'vec_id', n_vec, r)
    if r == 0:
        return t
    typ = t.schema.field('embedding').type
    vecs = t.column('embedding').to_pylist()
    eps = np.float32(r) * np.float32(0.0078125)  # r * 2^-7, exact in float32
    out = []
    for v in vecs:
        v = list(v)
        v[0] = float(np.float32(v[0]) + eps)
        out.append(v)
    arr = pa.array(out, type=typ)
    return t.set_column(t.schema.get_field_index('embedding'), t.schema.field('embedding'), arr)


replicate('embeddings', emb_replica)
print('done:', dst)
