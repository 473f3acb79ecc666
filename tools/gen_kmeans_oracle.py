#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for ann_ivf_kmeans.

Replays graft's Similarity.trainCentroidsI8 + ivfTopK iteration by
iteration.  The trainer is engine-replayable BY CONSTRUCTION:

 - vectors are int8-quantized (the ann_int8 oracle's exact ROUND
   half-away-from-zero formula), so every component is a small integer;
 - a centroid is the elementwise INTEGER SUM of its members' quantized
   components -- cosine is scale-invariant, so the division by cluster
   size never happens and the reduction is exact and order-independent
   (Spark's partial-aggregation order stops mattering);
 - sums are cast long->float->double on both engines (bit-identical
   IEEE round-to-nearest; exact below 2^24), and every cosine runs over
   integer-valued doubles through kernels already validated bit-equal
   (`list_cosine_similarity` == CosineSimilarity, see gen_ivf_oracle.py);
 - init = the nlist=16 rows smallest by (xxh64(vec_id, 42), vec_id),
   replayed with the staged XXH64 compiler; cell_id = rank 0..15;
 - ITERS=2 Lloyd iterations are UNROLLED as temp-table stages
   (assignment argmax -> positional integer sums -> empty cells keep
   their previous centroid), then the standard ivfTopK replay
   (assign / nprobe probes / exact-cosine rank) runs on the original
   float vectors against the trained centroids.

The training stages (quantize / xxh64 init / unrolled Lloyd iterations)
are exposed as `train_stages(prefix)` so other oracles built on the same
trainer (gen_semdedup_oracle.py) replay identical centroids.
"""
from xxh64_sql import *  # noqa: F401,F403

NLIST, NPROBE, K, ITERS = 16, 4, 5, 2

def train_stages(p, nlist=NLIST, iters=ITERS):
    """Statements building {p}_q8 (vec_id, v DOUBLE[], q quantized) and
    {p}_cents_{iters} (cell_id, centroid) -- the trainCentroidsI8 replay."""
    out = []
    # quantized corpus (q, integer-valued DOUBLE[]) + original doubles (v)
    out.append(f"""CREATE OR REPLACE TEMP TABLE {p}_q8 AS
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM base)
SELECT vec_id, v,
  CASE WHEN ma > 0 THEN list_transform(v, x -> round(x / ma * 127))
       ELSE list_transform(v, x -> 0.0) END AS q
FROM qz""")
    # init: smallest (xxh64(vec_id, 42), vec_id); sign-bit flip keys
    # unsigned order to the signed-long order Spark sorts by
    src = (f"SELECT vec_id, (vec_id // {M32})::UBIGINT AS x_hi, "
           f"(vec_id % {M32})::UBIGINT AS x_lo FROM embeddings")
    ch = Chain(f"{p}_h", src, ["vec_id", "x_hi", "x_lo"])
    h = hash_long(ch, "a", t("x"), 42)
    out += ch.stmts
    out.append(f"""CREATE OR REPLACE TEMP TABLE {p}_cents_0 AS
SELECT rn - 1 AS cell_id, q AS centroid FROM (
  SELECT q.q, ROW_NUMBER() OVER (ORDER BY
    xor({h[0]}, 2147483648) * {M32} + {h[1]}, q.vec_id) AS rn
  FROM {p}_q8 q JOIN {ch.cur()} h ON q.vec_id = h.vec_id)
WHERE rn <= {nlist}""")
    for it in range(1, iters + 1):
        prev = f"{p}_cents_{it - 1}"
        # argmax-cosine assignment of the QUANTIZED vectors (ties: smaller cell)
        out.append(f"""CREATE OR REPLACE TEMP TABLE {p}_assign_{it} AS
SELECT vec_id, q, cell_id FROM (
  SELECT e.vec_id, e.q, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(e.q, c.centroid) DESC, c.cell_id ASC) AS rn
  FROM {p}_q8 e CROSS JOIN {prev} c)
WHERE rn = 1""")
        # exact positional integer sums; empty cells keep the old centroid
        out.append(f"""CREATE OR REPLACE TEMP TABLE {p}_cents_{it} AS
SELECT p.cell_id,
  COALESCE(s.centroid, p.centroid) AS centroid
FROM {prev} p LEFT JOIN (
  SELECT cell_id,
    list(CAST(CAST(s AS FLOAT) AS DOUBLE) ORDER BY pos) AS centroid
  FROM (
    SELECT cell_id, pos, SUM(CAST(x AS BIGINT)) AS s FROM (
      SELECT cell_id, unnest(q) AS x, unnest(range(len(q))) AS pos
      FROM {p}_assign_{it})
    GROUP BY cell_id, pos)
  GROUP BY cell_id) s ON p.cell_id = s.cell_id""")
    return out, f"{p}_cents_{iters}"

def build():
    out, cents = train_stages("gk")
    # ivfTopK replay on the ORIGINAL float vectors vs the trained centroids
    out.append(f"""CREATE OR REPLACE TEMP TABLE gk_assign AS
SELECT vec_id AS neighbor_id, v AS cv, cell_id FROM (
  SELECT e.vec_id, e.v, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id ASC) AS rn
  FROM gk_q8 e CROSS JOIN {cents} c)
WHERE rn = 1""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gk_probes AS
SELECT query_id, qv, cell_id FROM (
  SELECT e.vec_id AS query_id, e.v AS qv, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id ASC) AS rn
  FROM gk_q8 e CROSS JOIN {cents} c
  WHERE e.vec_id % 20 = 0)
WHERE rn <= {NPROBE}""")
    out.append(f"""SELECT query_id, rnk, neighbor_id, sim_i FROM (
  SELECT p.query_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
      list_cosine_similarity(p.qv, a.cv) DESC, a.neighbor_id ASC) AS INTEGER) AS rnk,
    a.neighbor_id,
    CAST(round(list_cosine_similarity(p.qv, a.cv) * 1000, 0) AS BIGINT) AS sim_i
  FROM gk_probes p JOIN gk_assign a USING (cell_id)
  WHERE p.query_id <> a.neighbor_id)
WHERE rnk <= {K} ORDER BY query_id, rnk""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
