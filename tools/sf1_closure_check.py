#!/usr/bin/env python3
"""sf1 decade check for d06/s04: the recursive-CTE closure oracle is
correct but O(component^2) in DuckDB's reach table — at sf1 the giant
cos>=0.35 component makes it infeasible in one CTE. This re-derives the
SAME min-label fixpoint iteratively (label propagation + pointer jumping
over temp tables, the textbook equivalence) and compares against the
Spark outputs. The sf0.01 driver gate keeps the one-statement SQL oracle.
"""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/repo/testdata/sf1'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_sf1_r7'

con = duckdb.connect()
con.sql("PRAGMA threads=16")
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")

print("deriving exact cos>=0.35 pairs ...", flush=True)
con.sql("""
CREATE TABLE e AS
WITH nm AS (
  SELECT vec_id, embedding,
    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) AS n2
  FROM embeddings),
p AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
    list_sum(list_transform(list_zip(a.embedding, b.embedding), s -> CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE))) AS dot,
    a.n2 AS na, b.n2 AS nb
  FROM nm a JOIN nm b ON a.vec_id < b.vec_id)
SELECT a, b FROM p WHERE dot/(sqrt(na)*sqrt(nb)) >= 0.35""")
n_pairs = con.sql("SELECT count(*) FROM e").fetchone()[0]
print(f"pairs: {n_pairs}", flush=True)

con.sql("CREATE TABLE sym AS SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e")
# label0(u) = min(u, min neighbor) — the fused first step
con.sql("""CREATE TABLE lab AS
  SELECT u AS node, least(u, min(v)) AS label FROM sym GROUP BY u""")

it = 0
while True:
    it += 1
    con.sql("""CREATE OR REPLACE TABLE lab2 AS
      SELECT l.node, least(l.label, coalesce(min(nl.label), l.label)) AS label
      FROM lab l
      LEFT JOIN sym s ON s.u = l.node
      LEFT JOIN lab nl ON nl.node = s.v
      GROUP BY l.node, l.label""")
    # pointer jumping: label <- label(label)
    con.sql("""CREATE OR REPLACE TABLE lab3 AS
      SELECT a.node, coalesce(b.label, a.label) AS label
      FROM lab2 a LEFT JOIN lab2 b ON b.node = a.label""")
    changed = con.sql("""SELECT count(*) FROM lab3 a JOIN lab b USING (node)
                         WHERE a.label <> b.label""").fetchone()[0]
    con.sql("CREATE OR REPLACE TABLE lab AS SELECT * FROM lab3")
    print(f"iter {it}: {changed} changed", flush=True)
    if changed == 0 or it > 60:
        break

fails = 0

# d06 compare: (vec_id, cluster_id)
spark_d06 = f"{outdir}/d06_dedup_clusters/*.parquet"
diff = con.sql(f"""
  WITH s AS (SELECT vec_id, cluster_id FROM '{spark_d06}'),
       o AS (SELECT node AS vec_id, label AS cluster_id FROM lab)
  SELECT
    (SELECT count(*) FROM s) AS s_rows, (SELECT count(*) FROM o) AS o_rows,
    (SELECT count(*) FROM (SELECT * FROM s EXCEPT SELECT * FROM o)) AS s_only,
    (SELECT count(*) FROM (SELECT * FROM o EXCEPT SELECT * FROM s)) AS o_only
""").fetchone()
print(f"d06: spark={diff[0]} oracle={diff[1]} s_only={diff[2]} o_only={diff[3]}", flush=True)
ok = diff[0] == diff[1] and diff[2] == 0 and diff[3] == 0
print(f"d06_dedup_clusters: {'OK' if ok else 'MISMATCH'}", flush=True)
fails += 0 if ok else 1

# s04 compare: centroids over the same clusters (the oracle's exact
# 1e-6-scaled integer arithmetic, dims via a 64-wide range join)
spark_s04 = f"{outdir}/s04_cluster_centroids/*.parquet"
diff = con.sql(f"""
  WITH cl AS (SELECT node AS vec_id, label AS cluster_id FROM lab),
  cells AS (
    SELECT cl.cluster_id, i - 1 AS dim,
           CAST(round(CAST(emb.embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS v6
    FROM cl JOIN embeddings emb ON cl.vec_id = emb.vec_id
    CROSS JOIN range(1, 65) t(i)),
  o AS (
    SELECT cluster_id, CAST(dim AS BIGINT) AS dim, count(*) AS n_members,
           CAST(sum(v6) AS DOUBLE) / (count(*) * 1000000) AS centroid
    FROM cells GROUP BY cluster_id, dim),
  s AS (SELECT cluster_id, dim, n_members, centroid FROM '{spark_s04}')
  SELECT
    (SELECT count(*) FROM s) AS s_rows, (SELECT count(*) FROM o) AS o_rows,
    (SELECT count(*) FROM (SELECT * FROM s EXCEPT SELECT * FROM o)) AS s_only,
    (SELECT count(*) FROM (SELECT * FROM o EXCEPT SELECT * FROM s)) AS o_only
""").fetchone()
print(f"s04: spark={diff[0]} oracle={diff[1]} s_only={diff[2]} o_only={diff[3]}", flush=True)
ok = diff[0] == diff[1] and diff[2] == 0 and diff[3] == 0
print(f"s04_cluster_centroids: {'OK' if ok else 'MISMATCH'}", flush=True)
fails += 0 if ok else 1

print(f"\n{2 - fails} OK, {fails} FAIL")
sys.exit(1 if fails else 0)
