-- Orientation-CANONICAL perceptual hash: fractional-area 8x8 resample
-- (pixel overlap in 1/8-pixel integer units — commutes exactly with the
-- dihedral group), then the minimum DCT/median hash over all 8
-- mirror/rotation orientations. A flipped or rotated copy of an image
-- must land the BIT-IDENTICAL value.
WITH cosq(u, x, cq) AS (VALUES
  (0,0,32768),(0,1,32768),(0,2,32768),(0,3,32768),(0,4,32768),(0,5,32768),(0,6,32768),(0,7,32768),
  (1,0,32138),(1,1,27246),(1,2,18205),(1,3,6393),(1,4,-6393),(1,5,-18205),(1,6,-27246),(1,7,-32138),
  (2,0,30274),(2,1,12540),(2,2,-12540),(2,3,-30274),(2,4,-30274),(2,5,-12540),(2,6,12540),(2,7,30274),
  (3,0,27246),(3,1,-6393),(3,2,-32138),(3,3,-18205),(3,4,18205),(3,5,32138),(3,6,6393),(3,7,-27246),
  (4,0,23170),(4,1,-23170),(4,2,-23170),(4,3,23170),(4,4,23170),(4,5,-23170),(4,6,-23170),(4,7,23170),
  (5,0,18205),(5,1,-32138),(5,2,6393),(5,3,27246),(5,4,-27246),(5,5,-6393),(5,6,32138),(5,7,-18205),
  (6,0,12540),(6,1,-30274),(6,2,30274),(6,3,-12540),(6,4,-12540),(6,5,30274),(6,6,-30274),(6,7,12540),
  (7,0,6393),(7,1,-18205),(7,2,27246),(7,3,-32138),(7,4,32138),(7,5,-27246),(7,6,18205),(7,7,-6393)),
dims AS (
  SELECT doc_id, doc_id % 31 AS g,
         8 + (doc_id % 31) % 9 AS w, 8 + (doc_id % 31) % 7 AS h
  FROM documents),
pix AS (
  SELECT doc_id, g, w, h, unnest(range(w * h)) AS i FROM dims),
gray AS (
  SELECT doc_id, w, h, i % w AS x, i // w AS y,
      LEAST(255, (g * 31 + i * 7) % 256
                 + CASE WHEN i % 19 = doc_id % 19 THEN 7 ELSE 0 END)
    + LEAST(255, (g * 31 + i * 7 + 101) % 256
                 + CASE WHEN i % 19 = doc_id % 19 THEN 7 ELSE 0 END)
    + LEAST(255, (g * 31 + i * 7 + 202) % 256
                 + CASE WHEN i % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS gv
  FROM pix),
g8 AS (SELECT unnest(range(8)) AS gi),
cellv AS (
  SELECT doc_id, gy.gi AS gy, gx.gi AS gx,
    CAST(SUM(CAST(gv AS BIGINT)
      * GREATEST(0, LEAST((gy.gi + 1) * h, 8 * y + 8) - GREATEST(gy.gi * h, 8 * y))
      * GREATEST(0, LEAST((gx.gi + 1) * w, 8 * x + 8) - GREATEST(gx.gi * w, 8 * x))
    ) * 4096 // (MIN(h) * MIN(w)) AS BIGINT) AS p
  FROM gray CROSS JOIN g8 gy CROSS JOIN g8 gx
  GROUP BY doc_id, gy.gi, gx.gi),
ori AS (SELECT unnest(range(8)) AS o),
ocell AS (
  SELECT doc_id, o,
    CASE WHEN o >= 4 THEN cc0 ELSE rr0 END AS gy2,
    CASE WHEN o >= 4 THEN rr0 ELSE cc0 END AS gx2,
    p
  FROM (
    SELECT doc_id, o,
      CASE WHEN (o % 4) >= 2 THEN 7 - gy ELSE gy END AS rr0,
      CASE WHEN (o % 2) = 1 THEN 7 - gx ELSE gx END AS cc0,
      p
    FROM cellv CROSS JOIN ori)),
coef AS (
  SELECT c.doc_id, c.o, cu.u AS u, cv.u AS v,
         CAST(SUM(CAST(cu.cq AS BIGINT) * cv.cq * c.p) AS BIGINT) AS f
  FROM ocell c
  JOIN cosq cu ON cu.x = c.gy2
  JOIN cosq cv ON cv.x = c.gx2
  GROUP BY c.doc_id, c.o, cu.u, cv.u),
ac AS (
  SELECT doc_id, o, u * 8 + v AS k, f FROM coef WHERE u * 8 + v >= 1),
med AS (
  SELECT doc_id, o, f AS m FROM (
    SELECT doc_id, o, f,
           row_number() OVER (PARTITION BY doc_id, o ORDER BY f) AS rn
    FROM ac)
  WHERE rn = 32),
oh AS (
  SELECT ac.doc_id, ac.o,
         CAST(SUM(CASE WHEN ac.f > med.m
                       THEN CAST(1 AS BIGINT) << (CAST(ac.k AS INTEGER) - 1)
                       ELSE 0 END) AS BIGINT) AS ohash
  FROM ac JOIN med ON ac.doc_id = med.doc_id AND ac.o = med.o
  GROUP BY ac.doc_id, ac.o)
SELECT doc_id, MIN(ohash) AS phash_canon
FROM oh GROUP BY doc_id ORDER BY doc_id
