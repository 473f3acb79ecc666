#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for emb_cluster_sample.

Replays graft's Similarity.clusterBalancedSample: the shared
engine-replayable integer-sum k-means trainer (stages imported from
gen_kmeans_oracle.train_stages -- identical centroids by construction),
nearest-cell assignment of the ORIGINAL float vectors (argmax cosine,
ties to the smaller cell -- the sd_assign stage verbatim), then the
deterministic per-cluster draw: the PER_CLUSTER smallest
(md5(vec_id), vec_id) members of each cell.  Spark's sequential min_by
rounds and the ROW_NUMBER here select the identical set because both
order by exactly (md5 hex, id).
"""
from gen_kmeans_oracle import train_stages

PER_CLUSTER = 4

def build():
    out, cents = train_stages("cs")
    out.append(f"""CREATE OR REPLACE TEMP TABLE cs_assign AS
SELECT vec_id, cell_id FROM (
  SELECT e.vec_id, c.cell_id,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id ASC) AS rn
  FROM cs_q8 e CROSS JOIN {cents} c)
WHERE rn = 1""")
    out.append(f"""SELECT cell_id, vec_id FROM (
  SELECT cell_id, vec_id, ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY
    md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM cs_assign)
WHERE rn <= {PER_CLUSTER} ORDER BY cell_id, vec_id""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
