CREATE OR REPLACE TEMP TABLE cs_q8 AS
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM base)
SELECT vec_id, v,
  CASE WHEN ma > 0 THEN list_transform(v, x -> round(x / ma * 127))
       ELSE list_transform(v, x -> 0.0) END AS q
FROM qz;
CREATE OR REPLACE TEMP TABLE cs_h_0 AS SELECT vec_id, (vec_id // 4294967296)::UBIGINT AS x_hi, (vec_id % 4294967296)::UBIGINT AS x_lo FROM embeddings;
CREATE OR REPLACE TEMP TABLE cs_h_1 AS SELECT vec_id, x_hi, x_lo, ((42::UBIGINT) + (374761421::UBIGINT)) % 4294967296 AS ah0_lo, ((0::UBIGINT) + (668265263::UBIGINT) + (((42::UBIGINT) + (374761421::UBIGINT)) // 4294967296)) % 4294967296 AS ah0_hi FROM cs_h_0;
CREATE OR REPLACE TEMP TABLE cs_h_2 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ((x_lo) * (668265295::UBIGINT)) % 4294967296 AS ak1_lo, (((x_lo) * (3266489917::UBIGINT)) % 4294967296 + ((x_hi) * (668265295::UBIGINT)) % 4294967296 + (((x_lo) * (668265295::UBIGINT)) // 4294967296)) % 4294967296 AS ak1_hi FROM cs_h_1;
CREATE OR REPLACE TEMP TABLE cs_h_3 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, (((ak1_hi) % 2) * 2147483648 + ((ak1_lo) // 2)) AS ak2_hi, (((ak1_lo) % 2) * 2147483648 + ((ak1_hi) // 2)) AS ak2_lo FROM cs_h_2;
CREATE OR REPLACE TEMP TABLE cs_h_4 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ((ak2_lo) * (2246822535::UBIGINT)) % 4294967296 AS ak3_lo, (((ak2_lo) * (2654435761::UBIGINT)) % 4294967296 + ((ak2_hi) * (2246822535::UBIGINT)) % 4294967296 + (((ak2_lo) * (2246822535::UBIGINT)) // 4294967296)) % 4294967296 AS ak3_hi FROM cs_h_3;
CREATE OR REPLACE TEMP TABLE cs_h_5 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, xor(ah0_hi, ak3_hi) AS ah1_hi, xor(ah0_lo, ak3_lo) AS ah1_lo FROM cs_h_4;
CREATE OR REPLACE TEMP TABLE cs_h_6 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, (((ah1_hi) % 32) * 134217728 + ((ah1_lo) // 32)) AS ah2_hi, (((ah1_lo) % 32) * 134217728 + ((ah1_hi) // 32)) AS ah2_lo FROM cs_h_5;
CREATE OR REPLACE TEMP TABLE cs_h_7 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ((ah2_lo) * (2246822535::UBIGINT)) % 4294967296 AS ah3_lo, (((ah2_lo) * (2654435761::UBIGINT)) % 4294967296 + ((ah2_hi) * (2246822535::UBIGINT)) % 4294967296 + (((ah2_lo) * (2246822535::UBIGINT)) // 4294967296)) % 4294967296 AS ah3_hi FROM cs_h_6;
CREATE OR REPLACE TEMP TABLE cs_h_8 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ((ah3_lo) + (3266489955::UBIGINT)) % 4294967296 AS ah4_lo, ((ah3_hi) + (2246822519::UBIGINT) + (((ah3_lo) + (3266489955::UBIGINT)) // 4294967296)) % 4294967296 AS ah4_hi FROM cs_h_7;
CREATE OR REPLACE TEMP TABLE cs_h_9 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, 0::UBIGINT AS afs1_hi, ((ah4_hi) // 2) AS afs1_lo FROM cs_h_8;
CREATE OR REPLACE TEMP TABLE cs_h_10 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, xor(ah4_hi, afs1_hi) AS afx1_hi, xor(ah4_lo, afs1_lo) AS afx1_lo FROM cs_h_9;
CREATE OR REPLACE TEMP TABLE cs_h_11 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, ((afx1_lo) * (668265295::UBIGINT)) % 4294967296 AS afm1_lo, (((afx1_lo) * (3266489917::UBIGINT)) % 4294967296 + ((afx1_hi) * (668265295::UBIGINT)) % 4294967296 + (((afx1_lo) * (668265295::UBIGINT)) // 4294967296)) % 4294967296 AS afm1_hi FROM cs_h_10;
CREATE OR REPLACE TEMP TABLE cs_h_12 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, ((afm1_hi) // 536870912) AS afs2_hi, (((afm1_hi) % 536870912) * 8 + ((afm1_lo) // 536870912)) AS afs2_lo FROM cs_h_11;
CREATE OR REPLACE TEMP TABLE cs_h_13 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, xor(afm1_hi, afs2_hi) AS afx2_hi, xor(afm1_lo, afs2_lo) AS afx2_lo FROM cs_h_12;
CREATE OR REPLACE TEMP TABLE cs_h_14 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, ((afx2_lo) * (2654435833::UBIGINT)) % 4294967296 AS afm2_lo, (((afx2_lo) * (374761393::UBIGINT)) % 4294967296 + ((afx2_hi) * (2654435833::UBIGINT)) % 4294967296 + (((afx2_lo) * (2654435833::UBIGINT)) // 4294967296)) % 4294967296 AS afm2_hi FROM cs_h_13;
CREATE OR REPLACE TEMP TABLE cs_h_15 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, afm2_hi, afm2_lo, 0::UBIGINT AS afs3_hi, ((afm2_hi) // 1) AS afs3_lo FROM cs_h_14;
CREATE OR REPLACE TEMP TABLE cs_h_16 AS SELECT vec_id, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, afm2_hi, afm2_lo, afs3_hi, afs3_lo, xor(afm2_hi, afs3_hi) AS afx3_hi, xor(afm2_lo, afs3_lo) AS afx3_lo FROM cs_h_15;
CREATE OR REPLACE TEMP TABLE cs_cents_0 AS
SELECT rn - 1 AS cell_id, q AS centroid FROM (
  SELECT q.q, ROW_NUMBER() OVER (ORDER BY
    xor(afx3_hi, 2147483648) * 4294967296 + afx3_lo, q.vec_id) AS rn
  FROM cs_q8 q JOIN cs_h_16 h ON q.vec_id = h.vec_id)
WHERE rn <= 16;
CREATE OR REPLACE TEMP TABLE cs_assign_1 AS
SELECT vec_id, q, cell_id FROM (
  SELECT e.vec_id, e.q, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(e.q, c.centroid) DESC, c.cell_id ASC) AS rn
  FROM cs_q8 e CROSS JOIN cs_cents_0 c)
WHERE rn = 1;
CREATE OR REPLACE TEMP TABLE cs_cents_1 AS
SELECT p.cell_id,
  COALESCE(s.centroid, p.centroid) AS centroid
FROM cs_cents_0 p LEFT JOIN (
  SELECT cell_id,
    list(CAST(CAST(s AS FLOAT) AS DOUBLE) ORDER BY pos) AS centroid
  FROM (
    SELECT cell_id, pos, SUM(CAST(x AS BIGINT)) AS s FROM (
      SELECT cell_id, unnest(q) AS x, unnest(range(len(q))) AS pos
      FROM cs_assign_1)
    GROUP BY cell_id, pos)
  GROUP BY cell_id) s ON p.cell_id = s.cell_id;
CREATE OR REPLACE TEMP TABLE cs_assign_2 AS
SELECT vec_id, q, cell_id FROM (
  SELECT e.vec_id, e.q, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(e.q, c.centroid) DESC, c.cell_id ASC) AS rn
  FROM cs_q8 e CROSS JOIN cs_cents_1 c)
WHERE rn = 1;
CREATE OR REPLACE TEMP TABLE cs_cents_2 AS
SELECT p.cell_id,
  COALESCE(s.centroid, p.centroid) AS centroid
FROM cs_cents_1 p LEFT JOIN (
  SELECT cell_id,
    list(CAST(CAST(s AS FLOAT) AS DOUBLE) ORDER BY pos) AS centroid
  FROM (
    SELECT cell_id, pos, SUM(CAST(x AS BIGINT)) AS s FROM (
      SELECT cell_id, unnest(q) AS x, unnest(range(len(q))) AS pos
      FROM cs_assign_2)
    GROUP BY cell_id, pos)
  GROUP BY cell_id) s ON p.cell_id = s.cell_id;
CREATE OR REPLACE TEMP TABLE cs_assign AS
SELECT vec_id, cell_id FROM (
  SELECT e.vec_id, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id ASC) AS rn
  FROM cs_q8 e CROSS JOIN cs_cents_2 c)
WHERE rn = 1;
SELECT cell_id, vec_id FROM (
  SELECT cell_id, vec_id, ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY
    md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM cs_assign)
WHERE rn <= 4 ORDER BY cell_id, vec_id
