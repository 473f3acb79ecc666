CREATE OR REPLACE TEMP TABLE gm_srp_h_0 AS 
SELECT b.b AS pb, d.d AS pd, b.b::UBIGINT AS x_hi, d.d::UBIGINT AS x_lo
FROM range(64) b(b), range(64) d(d);
CREATE OR REPLACE TEMP TABLE gm_srp_h_1 AS SELECT pb, pd, x_hi, x_lo, ((7::UBIGINT) + (374761421::UBIGINT)) % 4294967296 AS ah0_lo, ((0::UBIGINT) + (668265263::UBIGINT) + (((7::UBIGINT) + (374761421::UBIGINT)) // 4294967296)) % 4294967296 AS ah0_hi FROM gm_srp_h_0;
CREATE OR REPLACE TEMP TABLE gm_srp_h_2 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ((x_lo) * (668265295::UBIGINT)) % 4294967296 AS ak1_lo, (((x_lo) * (3266489917::UBIGINT)) % 4294967296 + ((x_hi) * (668265295::UBIGINT)) % 4294967296 + (((x_lo) * (668265295::UBIGINT)) // 4294967296)) % 4294967296 AS ak1_hi FROM gm_srp_h_1;
CREATE OR REPLACE TEMP TABLE gm_srp_h_3 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, (((ak1_hi) % 2) * 2147483648 + ((ak1_lo) // 2)) AS ak2_hi, (((ak1_lo) % 2) * 2147483648 + ((ak1_hi) // 2)) AS ak2_lo FROM gm_srp_h_2;
CREATE OR REPLACE TEMP TABLE gm_srp_h_4 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ((ak2_lo) * (2246822535::UBIGINT)) % 4294967296 AS ak3_lo, (((ak2_lo) * (2654435761::UBIGINT)) % 4294967296 + ((ak2_hi) * (2246822535::UBIGINT)) % 4294967296 + (((ak2_lo) * (2246822535::UBIGINT)) // 4294967296)) % 4294967296 AS ak3_hi FROM gm_srp_h_3;
CREATE OR REPLACE TEMP TABLE gm_srp_h_5 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, xor(ah0_hi, ak3_hi) AS ah1_hi, xor(ah0_lo, ak3_lo) AS ah1_lo FROM gm_srp_h_4;
CREATE OR REPLACE TEMP TABLE gm_srp_h_6 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, (((ah1_hi) % 32) * 134217728 + ((ah1_lo) // 32)) AS ah2_hi, (((ah1_lo) % 32) * 134217728 + ((ah1_hi) // 32)) AS ah2_lo FROM gm_srp_h_5;
CREATE OR REPLACE TEMP TABLE gm_srp_h_7 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ((ah2_lo) * (2246822535::UBIGINT)) % 4294967296 AS ah3_lo, (((ah2_lo) * (2654435761::UBIGINT)) % 4294967296 + ((ah2_hi) * (2246822535::UBIGINT)) % 4294967296 + (((ah2_lo) * (2246822535::UBIGINT)) // 4294967296)) % 4294967296 AS ah3_hi FROM gm_srp_h_6;
CREATE OR REPLACE TEMP TABLE gm_srp_h_8 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ((ah3_lo) + (3266489955::UBIGINT)) % 4294967296 AS ah4_lo, ((ah3_hi) + (2246822519::UBIGINT) + (((ah3_lo) + (3266489955::UBIGINT)) // 4294967296)) % 4294967296 AS ah4_hi FROM gm_srp_h_7;
CREATE OR REPLACE TEMP TABLE gm_srp_h_9 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, 0::UBIGINT AS afs1_hi, ((ah4_hi) // 2) AS afs1_lo FROM gm_srp_h_8;
CREATE OR REPLACE TEMP TABLE gm_srp_h_10 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, xor(ah4_hi, afs1_hi) AS afx1_hi, xor(ah4_lo, afs1_lo) AS afx1_lo FROM gm_srp_h_9;
CREATE OR REPLACE TEMP TABLE gm_srp_h_11 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, ((afx1_lo) * (668265295::UBIGINT)) % 4294967296 AS afm1_lo, (((afx1_lo) * (3266489917::UBIGINT)) % 4294967296 + ((afx1_hi) * (668265295::UBIGINT)) % 4294967296 + (((afx1_lo) * (668265295::UBIGINT)) // 4294967296)) % 4294967296 AS afm1_hi FROM gm_srp_h_10;
CREATE OR REPLACE TEMP TABLE gm_srp_h_12 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, ((afm1_hi) // 536870912) AS afs2_hi, (((afm1_hi) % 536870912) * 8 + ((afm1_lo) // 536870912)) AS afs2_lo FROM gm_srp_h_11;
CREATE OR REPLACE TEMP TABLE gm_srp_h_13 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, xor(afm1_hi, afs2_hi) AS afx2_hi, xor(afm1_lo, afs2_lo) AS afx2_lo FROM gm_srp_h_12;
CREATE OR REPLACE TEMP TABLE gm_srp_h_14 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, ((afx2_lo) * (2654435833::UBIGINT)) % 4294967296 AS afm2_lo, (((afx2_lo) * (374761393::UBIGINT)) % 4294967296 + ((afx2_hi) * (2654435833::UBIGINT)) % 4294967296 + (((afx2_lo) * (2654435833::UBIGINT)) // 4294967296)) % 4294967296 AS afm2_hi FROM gm_srp_h_13;
CREATE OR REPLACE TEMP TABLE gm_srp_h_15 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, afm2_hi, afm2_lo, 0::UBIGINT AS afs3_hi, ((afm2_hi) // 1) AS afs3_lo FROM gm_srp_h_14;
CREATE OR REPLACE TEMP TABLE gm_srp_h_16 AS SELECT pb, pd, x_hi, x_lo, ah0_hi, ah0_lo, ak1_hi, ak1_lo, ak2_hi, ak2_lo, ak3_hi, ak3_lo, ah1_hi, ah1_lo, ah2_hi, ah2_lo, ah3_hi, ah3_lo, ah4_hi, ah4_lo, afs1_hi, afs1_lo, afx1_hi, afx1_lo, afm1_hi, afm1_lo, afs2_hi, afs2_lo, afx2_hi, afx2_lo, afm2_hi, afm2_lo, afs3_hi, afs3_lo, xor(afm2_hi, afs3_hi) AS afx3_hi, xor(afm2_lo, afs3_lo) AS afx3_lo FROM gm_srp_h_15;
CREATE OR REPLACE TEMP TABLE gm_srp_planes AS
SELECT pb, list(p ORDER BY pd) AS pl FROM (
  SELECT pb, pd,
    CAST((afx3_hi::HUGEINT * 4294967296 + afx3_lo::HUGEINT -
      CASE WHEN afx3_hi >= 2147483648 THEN 18446744073709551616::HUGEINT ELSE 0 END)
      AS DOUBLE) / 9223372036854775807.0 AS p
  FROM gm_srp_h_16)
GROUP BY pb;
CREATE OR REPLACE TEMP TABLE gm_srp_sig AS
SELECT vec_id, CAST(SUM(CASE WHEN a > 0 THEN (1::UBIGINT << pb) ELSE 0 END) AS UBIGINT) AS sig
FROM (
  SELECT e.vec_id, p.pb,
    list_inner_product(CAST(e.embedding AS DOUBLE[]), p.pl) AS a
  FROM embeddings e CROSS JOIN gm_srp_planes p)
GROUP BY vec_id;
CREATE OR REPLACE TEMP TABLE gm_srp_keys AS
SELECT vec_id, c.c AS chunk, (sig // (1::UBIGINT << (c.c * 4))) % 16 AS ckey
FROM gm_srp_sig, range(16) c(c);
CREATE OR REPLACE TEMP TABLE gm_srp_cand AS
SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
FROM gm_srp_keys l
JOIN (SELECT chunk, ckey FROM gm_srp_keys GROUP BY chunk, ckey
      HAVING count(*) <= 10000) ok USING (chunk, ckey)
JOIN gm_srp_keys r ON l.chunk = r.chunk AND l.ckey = r.ckey
  AND l.vec_id < r.vec_id;
SELECT vec_a, vec_b,
  CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
    CAST(b.embedding AS DOUBLE[])) * 1000, 0) AS BIGINT) AS sim_i
FROM gm_srp_cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings b ON b.vec_id = c.vec_b
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
  CAST(b.embedding AS DOUBLE[])) >= 0.5
ORDER BY vec_a, vec_b
