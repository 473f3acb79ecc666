#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for ann_pq.

Replays graft's product-quantization top-k: the codebook rows are the
ksub=16 vectors with smallest (xxh64(vec_id, 42), vec_id) -- Spark's
`orderBy(xxhash64(id), id).limit(ksub)` -- replayed with the staged
XXH64 compiler, with the sample RANK as the code id; each sub-space's
codeword is the row's slice. Encoding is argmax inner product per
(vector, sub-space) with the operator's tie-break (smaller code), ADC
partials are `list_dot_product` over DOUBLE[] slices (matches the
dot_f32 kernel's left-to-right double accumulation, the
list_cosine_similarity precedent), and per-candidate scores combine in
FIXED sub-space order (s0 + s1 + s2 + s3) exactly like the operator's
conditional aggregates.
"""
from xxh64_sql import *  # noqa: F401,F403

M, KSUB, K, DSUB = 4, 16, 5, 16


def build():
    out = []
    src = f"""
SELECT vec_id, (vec_id // {M32})::UBIGINT AS x_hi, (vec_id % {M32})::UBIGINT AS x_lo
FROM embeddings"""
    ch = Chain("gm_pq_h", src, ["vec_id", "x_hi", "x_lo"])
    h = hash_long(ch, "a", t("x"), 42)
    out += ch.stmts
    # sign-bit flip keys unsigned order to the signed-long order Spark
    # sorts by; the sample RANK is the code id
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_pq_sample AS
SELECT ROW_NUMBER() OVER (ORDER BY
    xor({h[0]}, 2147483648) * {M32} + {h[1]}, e.vec_id) - 1 AS code,
  CAST(e.embedding AS DOUBLE[]) AS v
FROM embeddings e JOIN {ch.cur()} h ON e.vec_id = h.vec_id
ORDER BY 1 LIMIT {KSUB}""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_pq_cb AS
SELECT s.sub, smp.code,
       smp.v[s.sub*{DSUB}+1 : s.sub*{DSUB}+{DSUB}] AS cw
FROM gm_pq_sample smp
CROSS JOIN (SELECT unnest(range({M})) AS sub) s""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_pq_codes AS
SELECT vec_id, sub, code FROM (
  SELECT e.vec_id, cb.sub, cb.code,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.sub ORDER BY
      list_dot_product(e.v[cb.sub*{DSUB}+1 : cb.sub*{DSUB}+{DSUB}], cb.cw) DESC,
      cb.code ASC) AS rn
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
  CROSS JOIN gm_pq_cb cb)
WHERE rn = 1""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_pq_qt AS
SELECT q.vec_id AS query_id, cb.sub, cb.code,
       list_dot_product(q.v[cb.sub*{DSUB}+1 : cb.sub*{DSUB}+{DSUB}], cb.cw) AS p
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id % 20 = 0) q
CROSS JOIN gm_pq_cb cb""")
    subsum = " + ".join(
        f"COALESCE(SUM(CASE WHEN sub = {s} THEN p END), CAST(0 AS DOUBLE))"
        for s in range(M))
    out.append(f"""SELECT query_id, rnk, neighbor_id, sim_i FROM (
  SELECT query_id, neighbor_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rnk,
    CAST(round(sim * 1000, 0) AS BIGINT) AS sim_i
  FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id, {subsum} AS sim
    FROM gm_pq_codes c JOIN gm_pq_qt q USING (sub, code)
    WHERE q.query_id <> c.vec_id
    GROUP BY q.query_id, c.vec_id))
WHERE rnk <= {K} ORDER BY query_id, rnk""")
    return ";\n".join(out)


if __name__ == "__main__":
    print(build())
