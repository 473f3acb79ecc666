-- Per-frame perceptual hashes of the MJPEG/AVI fixture videos: replay
-- the flat-block JPEG pixel formula per (doc, frame), then the same
-- integer-exact pHash pipeline (gray = 3 x sample so a gray frame
-- hashes like its r=g=b rendering). The Spark side must walk the real
-- RIFF container and decode every frame through the from-scratch JPEG
-- codec to match.
WITH cosq(u, x, cq) AS (VALUES
  (0,0,32768),(0,1,32768),(0,2,32768),(0,3,32768),(0,4,32768),(0,5,32768),(0,6,32768),(0,7,32768),
  (1,0,32138),(1,1,27246),(1,2,18205),(1,3,6393),(1,4,-6393),(1,5,-18205),(1,6,-27246),(1,7,-32138),
  (2,0,30274),(2,1,12540),(2,2,-12540),(2,3,-30274),(2,4,-30274),(2,5,-12540),(2,6,12540),(2,7,30274),
  (3,0,27246),(3,1,-6393),(3,2,-32138),(3,3,-18205),(3,4,18205),(3,5,32138),(3,6,6393),(3,7,-27246),
  (4,0,23170),(4,1,-23170),(4,2,-23170),(4,3,23170),(4,4,23170),(4,5,-23170),(4,6,-23170),(4,7,23170),
  (5,0,18205),(5,1,-32138),(5,2,6393),(5,3,27246),(5,4,-27246),(5,5,-6393),(5,6,32138),(5,7,-18205),
  (6,0,12540),(6,1,-30274),(6,2,30274),(6,3,-12540),(6,4,-12540),(6,5,30274),(6,6,-30274),(6,7,12540),
  (7,0,6393),(7,1,-18205),(7,2,27246),(7,3,-32138),(7,4,32138),(7,5,-27246),(7,6,18205),(7,7,-6393)),
p AS (
  SELECT doc_id, 2 + doc_id % 3 AS nf,
         CAST(8 * (1 + doc_id % 4) AS INTEGER) AS w,
         CAST(8 * (1 + doc_id % 3) AS INTEGER) AS h
  FROM documents),
f AS (SELECT doc_id, w, h, unnest(range(nf)) AS fi FROM p),
px AS (SELECT doc_id, w, h, fi, unnest(range(w * h)) AS i FROM f),
gray AS (
  SELECT doc_id, fi, w, h, i,
    3 * (((doc_id % 100003) * 31 + fi * 11
          + ((i // w) // 8 * (w // 8) + (i % w) // 8) * 7) % 256) AS gv
  FROM px),
cellsum AS (
  SELECT doc_id, fi, (8 * (i // w) + 7) // h AS gy,
         (8 * (i % w) + 7) // w AS gx, SUM(gv) AS s, COUNT(*) AS a
  FROM gray
  GROUP BY doc_id, fi, (8 * (i // w) + 7) // h, (8 * (i % w) + 7) // w),
cellv AS (
  SELECT doc_id, fi, gy, gx, CAST((s * 4096) // a AS BIGINT) AS p
  FROM cellsum),
coef AS (
  SELECT c.doc_id, c.fi, cu.u AS u, cv.u AS v,
         CAST(SUM(CAST(cu.cq AS BIGINT) * cv.cq * c.p) AS BIGINT) AS fc
  FROM cellv c
  JOIN cosq cu ON cu.x = c.gy
  JOIN cosq cv ON cv.x = c.gx
  GROUP BY c.doc_id, c.fi, cu.u, cv.u),
ac AS (
  SELECT doc_id, fi, u * 8 + v AS k, fc FROM coef WHERE u * 8 + v >= 1),
med AS (
  SELECT doc_id, fi, fc AS m FROM (
    SELECT doc_id, fi, fc,
           row_number() OVER (PARTITION BY doc_id, fi ORDER BY fc) AS rn
    FROM ac)
  WHERE rn = 32)
SELECT ac.doc_id AS doc_id, CAST(ac.fi AS INTEGER) AS frame_idx,
       CAST(SUM(CASE WHEN ac.fc > med.m
                     THEN CAST(1 AS BIGINT) << (CAST(ac.k AS INTEGER) - 1)
                     ELSE 0 END) AS BIGINT) AS phash
FROM ac JOIN med ON ac.doc_id = med.doc_id AND ac.fi = med.fi
GROUP BY ac.doc_id, ac.fi
ORDER BY ac.doc_id, frame_idx
