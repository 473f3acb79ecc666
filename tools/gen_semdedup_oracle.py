#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for emb_semdedup.

Replays graft's Similarity.semDedup (the SemDeDup construction, Abbas et
al. 2023): the engine-replayable integer-sum k-means trainer (shared
stages imported from gen_kmeans_oracle.train_stages -- identical
centroids by construction), nearest-cell assignment of the ORIGINAL
float vectors (argmax cosine, ties to the smaller cell), then the
within-cluster pairwise pass: a vector is a duplicate when some
LOWER-id member of its cluster has cosine >= THRESHOLD.  Clusters larger
than MAXC are excluded from pairing (members kept, recall dropped) --
mirrored here even though the fixture never trips it, so the oracle
stays faithful if caps change.

All cosines run through list_cosine_similarity, validated bit-equal to
Spark's CosineSimilarity kernel (see gen_ivf_oracle.py), so the >=
threshold comparison agrees bit-for-bit across engines.
"""
from gen_kmeans_oracle import train_stages

THRESHOLD, MAXC = 0.4, 100000

def build():
    out, cents = train_stages("sd")
    # nearest-cell assignment of the ORIGINAL float vectors
    out.append(f"""CREATE OR REPLACE TEMP TABLE sd_assign AS
SELECT vec_id, v AS cv, cell_id FROM (
  SELECT e.vec_id, e.v, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id ASC) AS rn
  FROM sd_q8 e CROSS JOIN {cents} c)
WHERE rn = 1""")
    # the cap: clusters over MAXC never enter the pair stage
    out.append(f"""CREATE OR REPLACE TEMP TABLE sd_small AS
SELECT vec_id, cv, cell_id FROM sd_assign
WHERE cell_id IN (
  SELECT cell_id FROM sd_assign GROUP BY cell_id HAVING COUNT(*) <= {MAXC})""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE sd_dups AS
SELECT DISTINCT b.vec_id AS dup_id
FROM sd_small a JOIN sd_small b USING (cell_id)
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.cv, b.cv) >= {THRESHOLD}""")
    out.append("""SELECT a.vec_id, a.cell_id, (d.dup_id IS NOT NULL) AS is_dup
FROM sd_assign a LEFT JOIN sd_dups d ON a.vec_id = d.dup_id
ORDER BY a.vec_id""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
