#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for ann_ivfpq.

Replays graft's IVF-PQ composition: the IVF half (coarse sample,
nearest-cell assignment, nprobe probing) exactly as gen_ivf_oracle.py,
the PQ half (rank-coded codebook from the SAME xxh64 sample, argmax-dot
codes, ADC query tables) exactly as gen_pq_oracle.py, then candidates =
probed cells' members scored by the fixed-order ADC sum.
"""
from xxh64_sql import *  # noqa: F401,F403

NLIST, NPROBE, K = 16, 4, 5
M, KSUB, DSUB = 4, 16, 16


def build():
    out = []
    src = f"""
SELECT vec_id, (vec_id // {M32})::UBIGINT AS x_hi, (vec_id % {M32})::UBIGINT AS x_lo
FROM embeddings"""
    ch = Chain("gm_ipq_h", src, ["vec_id", "x_hi", "x_lo"])
    h = hash_long(ch, "a", t("x"), 42)
    out += ch.stmts
    order = f"xor({h[0]}, 2147483648) * {M32} + {h[1]}, e.vec_id"
    # ---- IVF half (cell_id = the sampled row's vec_id) ----
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ipq_cents AS
SELECT e.vec_id AS cell_id, CAST(e.embedding AS DOUBLE[]) AS centroid
FROM embeddings e JOIN {ch.cur()} h ON e.vec_id = h.vec_id
ORDER BY {order}
LIMIT {NLIST}""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ipq_assign AS
SELECT vec_id AS neighbor_id, cell_id FROM (
  SELECT e.vec_id, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC,
      c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN gm_ipq_cents c)
WHERE rn = 1""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ipq_probes AS
SELECT query_id, cell_id FROM (
  SELECT e.vec_id AS query_id, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC,
      c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN gm_ipq_cents c
  WHERE e.vec_id % 20 = 0)
WHERE rn <= {NPROBE}""")
    # ---- PQ half (code = the sampled row's RANK) ----
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ipq_sample AS
SELECT ROW_NUMBER() OVER (ORDER BY {order}) - 1 AS code,
  CAST(e.embedding AS DOUBLE[]) AS v
FROM embeddings e JOIN {ch.cur()} h ON e.vec_id = h.vec_id
ORDER BY 1 LIMIT {KSUB}""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ipq_cb AS
SELECT s.sub, smp.code,
       smp.v[s.sub*{DSUB}+1 : s.sub*{DSUB}+{DSUB}] AS cw
FROM gm_ipq_sample smp
CROSS JOIN (SELECT unnest(range({M})) AS sub) s""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ipq_codes AS
SELECT vec_id AS neighbor_id, sub, code FROM (
  SELECT e.vec_id, cb.sub, cb.code,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.sub ORDER BY
      list_dot_product(e.v[cb.sub*{DSUB}+1 : cb.sub*{DSUB}+{DSUB}], cb.cw) DESC,
      cb.code ASC) AS rn
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
  CROSS JOIN gm_ipq_cb cb)
WHERE rn = 1""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_ipq_qt AS
SELECT q.vec_id AS query_id, cb.sub, cb.code,
       list_dot_product(q.v[cb.sub*{DSUB}+1 : cb.sub*{DSUB}+{DSUB}], cb.cw) AS p
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id % 20 = 0) q
CROSS JOIN gm_ipq_cb cb""")
    # ---- composition: probed candidates scored by ADC ----
    subsum = " + ".join(
        f"COALESCE(SUM(CASE WHEN c.sub = {s} THEN q.p END), CAST(0 AS DOUBLE))"
        for s in range(M))
    out.append(f"""SELECT query_id, rnk, neighbor_id, sim_i FROM (
  SELECT query_id, neighbor_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rnk,
    CAST(round(sim * 1000, 0) AS BIGINT) AS sim_i
  FROM (
    SELECT cand.query_id, cand.neighbor_id, {subsum} AS sim
    FROM (SELECT p.query_id, a.neighbor_id
          FROM gm_ipq_probes p JOIN gm_ipq_assign a USING (cell_id)
          WHERE p.query_id <> a.neighbor_id) cand
    JOIN gm_ipq_codes c USING (neighbor_id)
    JOIN gm_ipq_qt q ON q.query_id = cand.query_id
                    AND q.sub = c.sub AND q.code = c.code
    GROUP BY cand.query_id, cand.neighbor_id))
WHERE rnk <= {K} ORDER BY query_id, rnk""")
    return ";\n".join(out)


if __name__ == "__main__":
    print(build())
