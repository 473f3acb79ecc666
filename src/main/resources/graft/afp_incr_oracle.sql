-- Incremental audio near-dup ground truth: fingerprints for the corpus
-- AND an arriving batch (every 10th doc re-minted at doc_id+1000000),
-- then ALL batch x corpus pairs with Hamming <= 6 by brute force.
WITH trig(j, cq, sq) AS (VALUES
  (0,32768,0),(1,32610,3212),(2,32138,6393),(3,31357,9512),(4,30274,12540),(5,28899,15447),(6,27246,18205),(7,25330,20788),
  (8,23170,23170),(9,20788,25330),(10,18205,27246),(11,15447,28899),(12,12540,30274),(13,9512,31357),(14,6393,32138),(15,3212,32610),
  (16,0,32768),(17,-3212,32610),(18,-6393,32138),(19,-9512,31357),(20,-12540,30274),(21,-15447,28899),(22,-18205,27246),(23,-20788,25330),
  (24,-23170,23170),(25,-25330,20788),(26,-27246,18205),(27,-28899,15447),(28,-30274,12540),(29,-31357,9512),(30,-32138,6393),(31,-32610,3212),
  (32,-32768,0),(33,-32610,-3212),(34,-32138,-6393),(35,-31357,-9512),(36,-30274,-12540),(37,-28899,-15447),(38,-27246,-18205),(39,-25330,-20788),
  (40,-23170,-23170),(41,-20788,-25330),(42,-18205,-27246),(43,-15447,-28899),(44,-12540,-30274),(45,-9512,-31357),(46,-6393,-32138),(47,-3212,-32610),
  (48,0,-32768),(49,3212,-32610),(50,6393,-32138),(51,9512,-31357),(52,12540,-30274),(53,15447,-28899),(54,18205,-27246),(55,20788,-25330),
  (56,23170,-23170),(57,25330,-20788),(58,27246,-18205),(59,28899,-15447),(60,30274,-12540),(61,31357,-9512),(62,32138,-6393),(63,32610,-3212)),
ids AS (
  SELECT doc_id FROM documents
  UNION ALL
  SELECT doc_id + 1000000 FROM documents WHERE doc_id % 10 = 0),
dims AS (
  SELECT doc_id, doc_id % 31 AS g, 200 + ((doc_id % 31) * 37) % 601 AS n
  FROM ids),
win AS (
  SELECT doc_id, g, n, unnest(range(9)) AS t FROM dims),
wj AS (
  SELECT doc_id, g, t, (t * (n - 64)) // 8 AS st, unnest(range(64)) AS j
  FROM win),
smp AS (
  SELECT doc_id, t, j,
    LEAST(32767,
      (g * 131 + (st + j) * (3001 + g * 577)
       + (st + j) * (st + j) * (g + 7)) % 65536 - 32768
      + CASE WHEN (st + j) % 13 = doc_id % 13 THEN 64 ELSE 0 END) AS s
  FROM wj),
band AS (
  SELECT doc_id, t, j, s, unnest(range(1, 9)) AS k FROM smp),
en AS (
  SELECT doc_id, t, k,
    ABS(SUM(CAST(s AS BIGINT) * tr.cq)) + ABS(SUM(CAST(s AS BIGINT) * tr.sq)) AS e
  FROM band b JOIN trig tr ON tr.j = (b.k * b.j) % 64
  GROUP BY doc_id, t, k),
fp AS (
  SELECT a.doc_id,
    CAST(SUM(CASE WHEN a.e > p.e AND (a.t - 1) * 8 + (a.k - 1) <= 62
                  THEN CAST(1 AS BIGINT)
                       << CAST((a.t - 1) * 8 + (a.k - 1) AS INTEGER)
                  ELSE 0 END) AS BIGINT) AS afp
  FROM en a JOIN en p ON a.doc_id = p.doc_id AND p.t = a.t - 1 AND p.k = a.k
  WHERE a.t >= 1
  GROUP BY a.doc_id)
SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
       CAST(bit_count(xor(b.afp, c.afp)) AS INTEGER) AS hamming
FROM fp b JOIN fp c
  ON b.doc_id >= 1000000 AND c.doc_id < 1000000
WHERE bit_count(xor(b.afp, c.afp)) <= 6
ORDER BY batch_id, corpus_id
