CREATE OR REPLACE TEMP TABLE gm_ipq_h_0 AS 
SELECT vec_id, (vec_id // 4294967296)::UBIGINT AS x_hi, (vec_id % 4294967296)::UBIGINT AS x_lo
FROM embeddings;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_1 AS SELECT vec_id, x_hi, x_lo, ((42::UBIGINT) + (374761421::UBIGINT)) % 4294967296 AS ah0_lo, ((0::UBIGINT) + (668265263::UBIGINT) + (((42::UBIGINT) + (374761421::UBIGINT)) // 4294967296)) % 4294967296 AS ah0_hi FROM gm_ipq_h_0;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_2 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ((x_lo) * (668265295::UBIGINT)) % 4294967296 AS ak1_lo, (((x_lo) * (3266489917::UBIGINT)) % 4294967296 + ((x_hi) * (668265295::UBIGINT)) % 4294967296 + (((x_lo) * (668265295::UBIGINT)) // 4294967296)) % 4294967296 AS ak1_hi FROM gm_ipq_h_1;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_3 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, (((ak1_hi) % 2) * 2147483648 + ((ak1_lo) // 2)) AS ak2_hi, (((ak1_lo) % 2) * 2147483648 + ((ak1_hi) // 2)) AS ak2_lo FROM gm_ipq_h_2;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_4 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ((ak2_lo) * (2246822535::UBIGINT)) % 4294967296 AS ak3_lo, (((ak2_lo) * (2654435761::UBIGINT)) % 4294967296 + ((ak2_hi) * (2246822535::UBIGINT)) % 4294967296 + (((ak2_lo) * (2246822535::UBIGINT)) // 4294967296)) % 4294967296 AS ak3_hi FROM gm_ipq_h_3;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_5 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, xor(ah0_hi, ak3_hi) AS ah1_hi, xor(ah0_lo, ak3_lo) AS ah1_lo FROM gm_ipq_h_4;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_6 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, (((ah1_hi) % 32) * 134217728 + ((ah1_lo) // 32)) AS ah2_hi, (((ah1_lo) % 32) * 134217728 + ((ah1_hi) // 32)) AS ah2_lo FROM gm_ipq_h_5;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_7 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ((ah2_lo) * (2246822535::UBIGINT)) % 4294967296 AS ah3_lo, (((ah2_lo) * (2654435761::UBIGINT)) % 4294967296 + ((ah2_hi) * (2246822535::UBIGINT)) % 4294967296 + (((ah2_lo) * (2246822535::UBIGINT)) // 4294967296)) % 4294967296 AS ah3_hi FROM gm_ipq_h_6;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_8 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ((ah3_lo) + (3266489955::UBIGINT)) % 4294967296 AS ah4_lo, ((ah3_hi) + (2246822519::UBIGINT) + (((ah3_lo) + (3266489955::UBIGINT)) // 4294967296)) % 4294967296 AS ah4_hi FROM gm_ipq_h_7;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_9 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, 0::UBIGINT AS afs1_hi, ((ah4_hi) // 2) AS afs1_lo FROM gm_ipq_h_8;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_10 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, xor(ah4_hi, afs1_hi) AS afx1_hi, xor(ah4_lo, afs1_lo) AS afx1_lo FROM gm_ipq_h_9;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_11 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, ((afx1_lo) * (668265295::UBIGINT)) % 4294967296 AS afm1_lo, (((afx1_lo) * (3266489917::UBIGINT)) % 4294967296 + ((afx1_hi) * (668265295::UBIGINT)) % 4294967296 + (((afx1_lo) * (668265295::UBIGINT)) // 4294967296)) % 4294967296 AS afm1_hi FROM gm_ipq_h_10;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_12 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, ((afm1_hi) // 536870912) AS afs2_hi, (((afm1_hi) % 536870912) * 8 + ((afm1_lo) // 536870912)) AS afs2_lo FROM gm_ipq_h_11;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_13 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, xor(afm1_hi, afs2_hi) AS afx2_hi, xor(afm1_lo, afs2_lo) AS afx2_lo FROM gm_ipq_h_12;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_14 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, ((afx2_lo) * (2654435833::UBIGINT)) % 4294967296 AS afm2_lo, (((afx2_lo) * (374761393::UBIGINT)) % 4294967296 + ((afx2_hi) * (2654435833::UBIGINT)) % 4294967296 + (((afx2_lo) * (2654435833::UBIGINT)) // 4294967296)) % 4294967296 AS afm2_hi FROM gm_ipq_h_13;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_15 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, afm2_hi, afm2_lo, 0::UBIGINT AS afs3_hi, ((afm2_hi) // 1) AS afs3_lo FROM gm_ipq_h_14;
CREATE OR REPLACE TEMP TABLE gm_ipq_h_16 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, afm2_hi, afm2_lo, afs3_hi, afs3_lo, xor(afm2_hi, afs3_hi) AS afx3_hi, xor(afm2_lo, afs3_lo) AS afx3_lo FROM gm_ipq_h_15;
CREATE OR REPLACE TEMP TABLE gm_ipq_cents AS
SELECT e.vec_id AS cell_id, CAST(e.embedding AS DOUBLE[]) AS centroid
FROM embeddings e JOIN gm_ipq_h_16 h ON e.vec_id = h.vec_id
ORDER BY xor(afx3_hi, 2147483648) * 4294967296 + afx3_lo, e.vec_id
LIMIT 16;
CREATE OR REPLACE TEMP TABLE gm_ipq_assign AS
SELECT vec_id AS neighbor_id, cell_id FROM (
  SELECT e.vec_id, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC,
      c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN gm_ipq_cents c)
WHERE rn = 1;
CREATE OR REPLACE TEMP TABLE gm_ipq_probes AS
SELECT query_id, cell_id FROM (
  SELECT e.vec_id AS query_id, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) DESC,
      c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN gm_ipq_cents c
  WHERE e.vec_id % 20 = 0)
WHERE rn <= 4;
CREATE OR REPLACE TEMP TABLE gm_ipq_sample AS
SELECT ROW_NUMBER() OVER (ORDER BY xor(afx3_hi, 2147483648) * 4294967296 + afx3_lo, e.vec_id) - 1 AS code,
  CAST(e.embedding AS DOUBLE[]) AS v
FROM embeddings e JOIN gm_ipq_h_16 h ON e.vec_id = h.vec_id
ORDER BY 1 LIMIT 16;
CREATE OR REPLACE TEMP TABLE gm_ipq_cb AS
SELECT s.sub, smp.code,
       smp.v[s.sub*16+1 : s.sub*16+16] AS cw
FROM gm_ipq_sample smp
CROSS JOIN (SELECT unnest(range(4)) AS sub) s;
CREATE OR REPLACE TEMP TABLE gm_ipq_codes AS
SELECT vec_id AS neighbor_id, sub, code FROM (
  SELECT e.vec_id, cb.sub, cb.code,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.sub ORDER BY
      list_dot_product(e.v[cb.sub*16+1 : cb.sub*16+16], cb.cw) DESC,
      cb.code ASC) AS rn
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
  CROSS JOIN gm_ipq_cb cb)
WHERE rn = 1;
CREATE OR REPLACE TEMP TABLE gm_ipq_qt AS
SELECT q.vec_id AS query_id, cb.sub, cb.code,
       list_dot_product(q.v[cb.sub*16+1 : cb.sub*16+16], cb.cw) AS p
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id % 20 = 0) q
CROSS JOIN gm_ipq_cb cb;
SELECT query_id, rnk, neighbor_id, sim_i FROM (
  SELECT query_id, neighbor_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rnk,
    CAST(round(sim * 1000, 0) AS BIGINT) AS sim_i
  FROM (
    SELECT cand.query_id, cand.neighbor_id, COALESCE(SUM(CASE WHEN c.sub = 0 THEN q.p END), CAST(0 AS DOUBLE)) + COALESCE(SUM(CASE WHEN c.sub = 1 THEN q.p END), CAST(0 AS DOUBLE)) + COALESCE(SUM(CASE WHEN c.sub = 2 THEN q.p END), CAST(0 AS DOUBLE)) + COALESCE(SUM(CASE WHEN c.sub = 3 THEN q.p END), CAST(0 AS DOUBLE)) AS sim
    FROM (SELECT p.query_id, a.neighbor_id
          FROM gm_ipq_probes p JOIN gm_ipq_assign a USING (cell_id)
          WHERE p.query_id <> a.neighbor_id) cand
    JOIN gm_ipq_codes c USING (neighbor_id)
    JOIN gm_ipq_qt q ON q.query_id = cand.query_id
                    AND q.sub = c.sub AND q.code = c.code
    GROUP BY cand.query_id, cand.neighbor_id))
WHERE rnk <= 5 ORDER BY query_id, rnk
