#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for ann_ivf.

Replays graft's IVF top-k with deterministic sampled centroids: the
coarse sample is the nlist=16 vectors with smallest (xxh64(vec_id, 42),
vec_id) -- Spark's `orderBy(xxhash64(id), id).limit(nlist)` -- replayed
with the staged XXH64 compiler; assignment/probing/ranking are pure
double-accumulated cosine (`list_cosine_similarity` matches the
CosineSimilarity kernel bit-for-bit, as ann_topk/emb_neardup prove) with
the operator's exact tie-breaks (smaller cell_id, smaller neighbor_id).
"""
from xxh64_sql import *  # noqa: F401,F403

NLIST, NPROBE, K = 16, 4, 5

def build():
    out = []
    # xxh64(vec_id, 42) per embedding row (hashLong; ids are non-negative
    # so the signed->unsigned rep is the identity)
    src = f"""
SELECT vec_id, (vec_id // {M32})::UBIGINT AS x_hi, (vec_id % {M32})::UBIGINT AS x_lo
FROM embeddings"""
    ch = Chain("gm_ivf_h", src, ["vec_id", "x_hi", "x_lo"])
    h = hash_long(ch, "a", t("x"), 42)
    out += ch.stmts
    # sign-bit flip keys unsigned order to the signed-long order Spark sorts by
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ivf_cents AS
SELECT e.vec_id AS cell_id, CAST(e.embedding AS DOUBLE[]) AS centroid
FROM embeddings e JOIN {ch.cur()} h ON e.vec_id = h.vec_id
ORDER BY xor({h[0]}, 2147483648) * {M32} + {h[1]}, e.vec_id
LIMIT {NLIST}""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ivf_assign AS
SELECT vec_id AS neighbor_id, v AS cv, cell_id FROM (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC,
      c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN gm_ivf_cents c)
WHERE rn = 1""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ivf_probes AS
SELECT query_id, qv, cell_id FROM (
  SELECT e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qv, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC,
      c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN gm_ivf_cents c
  WHERE e.vec_id % 20 = 0)
WHERE rn <= {NPROBE}""")
    out.append(f"""SELECT query_id, rnk, neighbor_id, sim_i FROM (
  SELECT p.query_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
      list_cosine_similarity(p.qv, a.cv) DESC, a.neighbor_id ASC) AS INTEGER) AS rnk,
    a.neighbor_id,
    CAST(round(list_cosine_similarity(p.qv, a.cv) * 1000, 0) AS BIGINT) AS sim_i
  FROM gm_ivf_probes p JOIN gm_ivf_assign a USING (cell_id)
  WHERE p.query_id <> a.neighbor_id)
WHERE rnk <= {K} ORDER BY query_id, rnk""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
