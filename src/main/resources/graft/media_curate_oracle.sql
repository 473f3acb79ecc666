-- Composed MEDIA curation funnel, replayed end to end: perceptual
-- keep-first dedup (pHash pairs -> reachability components -> canonical
-- member survives) -> decoded-raster quality gate (Sobel gradient
-- energy over the clamped R channel >= 30000) -> per-dimension corpus
-- summary. The Spark side must chain real decode, banded LSH,
-- connected components, and the conv bank to land the same integers.
WITH RECURSIVE cosq(u, x, cq) AS (VALUES
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
  SELECT doc_id, w, h, i,
      LEAST(255, (g * 31 + i * 7) % 256
                 + CASE WHEN i % 19 = doc_id % 19 THEN 7 ELSE 0 END)
    + LEAST(255, (g * 31 + i * 7 + 101) % 256
                 + CASE WHEN i % 19 = doc_id % 19 THEN 7 ELSE 0 END)
    + LEAST(255, (g * 31 + i * 7 + 202) % 256
                 + CASE WHEN i % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS gv
  FROM pix),
cellsum AS (
  SELECT doc_id, (8 * (i // w) + 7) // h AS gy, (8 * (i % w) + 7) // w AS gx,
         SUM(gv) AS s, COUNT(*) AS a
  FROM gray GROUP BY doc_id, (8 * (i // w) + 7) // h, (8 * (i % w) + 7) // w),
cellv AS (
  SELECT doc_id, gy, gx, CAST((s * 4096) // a AS BIGINT) AS p FROM cellsum),
coef AS (
  SELECT c.doc_id, cu.u AS u, cv.u AS v,
         CAST(SUM(CAST(cu.cq AS BIGINT) * cv.cq * c.p) AS BIGINT) AS f
  FROM cellv c
  JOIN cosq cu ON cu.x = c.gy
  JOIN cosq cv ON cv.x = c.gx
  GROUP BY c.doc_id, cu.u, cv.u),
ac AS (
  SELECT doc_id, u * 8 + v AS k, f FROM coef WHERE u * 8 + v >= 1),
med AS (
  SELECT doc_id, f AS m FROM (
    SELECT doc_id, f,
           row_number() OVER (PARTITION BY doc_id ORDER BY f) AS rn
    FROM ac)
  WHERE rn = 32),
ph AS (
  SELECT ac.doc_id,
         CAST(SUM(CASE WHEN ac.f > med.m
                       THEN CAST(1 AS BIGINT) << (CAST(ac.k AS INTEGER) - 1)
                       ELSE 0 END) AS BIGINT) AS phash
  FROM ac JOIN med ON ac.doc_id = med.doc_id
  GROUP BY ac.doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 8),
und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM und) s
  UNION
  SELECT e.v, reach.r FROM reach JOIN und e ON e.u = reach.node),
comp AS (SELECT node, MIN(r) AS group_id FROM reach GROUP BY node),
kept AS (
  SELECT d.doc_id, d.g, d.w, d.h FROM dims d
  LEFT JOIN comp ON comp.node = d.doc_id
  WHERE comp.node IS NULL OR comp.group_id = d.doc_id),
pos AS (
  SELECT doc_id, g, w, h, unnest(range((w - 2) * (h - 2))) AS p FROM kept),
xy AS (
  SELECT doc_id, g, w, 1 + p % (w - 2) AS x, 1 + p // (w - 2) AS y FROM pos),
nb AS (
  SELECT doc_id,
    LEAST(255, (g * 31 + ((y+(-1))*w + (x+(-1))) * 7 + 0) % 256 + CASE WHEN ((y+(-1))*w + (x+(-1))) % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS vmm, LEAST(255, (g * 31 + ((y+(-1))*w + (x+(0))) * 7 + 0) % 256 + CASE WHEN ((y+(-1))*w + (x+(0))) % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS vm0, LEAST(255, (g * 31 + ((y+(-1))*w + (x+(1))) * 7 + 0) % 256 + CASE WHEN ((y+(-1))*w + (x+(1))) % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS vmp,
    LEAST(255, (g * 31 + ((y+(0))*w + (x+(-1))) * 7 + 0) % 256 + CASE WHEN ((y+(0))*w + (x+(-1))) % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS v0m, LEAST(255, (g * 31 + ((y+(0))*w + (x+(1))) * 7 + 0) % 256 + CASE WHEN ((y+(0))*w + (x+(1))) % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS v0p,
    LEAST(255, (g * 31 + ((y+(1))*w + (x+(-1))) * 7 + 0) % 256 + CASE WHEN ((y+(1))*w + (x+(-1))) % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS vpm, LEAST(255, (g * 31 + ((y+(1))*w + (x+(0))) * 7 + 0) % 256 + CASE WHEN ((y+(1))*w + (x+(0))) % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS vp0, LEAST(255, (g * 31 + ((y+(1))*w + (x+(1))) * 7 + 0) % 256 + CASE WHEN ((y+(1))*w + (x+(1))) % 19 = doc_id % 19 THEN 7 ELSE 0 END) AS vpp
  FROM xy),
conv AS (
  SELECT doc_id,
    CAST(SUM(ABS((vmp + 2*v0p + vpp) - (vmm + 2*v0m + vpm))) AS BIGINT) AS gx,
    CAST(SUM(ABS((vpm + 2*vp0 + vpp) - (vmm + 2*vm0 + vmp))) AS BIGINT) AS gy
  FROM nb GROUP BY doc_id),
survivors AS (
  SELECT k.doc_id, k.w, k.h, c.gx, c.gy
  FROM kept k JOIN conv c ON k.doc_id = c.doc_id
  WHERE c.gx + c.gy >= 30000)
SELECT CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(gx) AS BIGINT) AS sum_gx, CAST(SUM(gy) AS BIGINT) AS sum_gy
FROM survivors GROUP BY w, h ORDER BY width, height
