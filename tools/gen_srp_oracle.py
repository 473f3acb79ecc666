#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for emb_neardup_lsh.

Replays graft's signed-random-projection LSH: hyperplane component
(b, d) = xxh64((b<<32)|d, seed=7) / Long.MaxValue (staged XXH64 over the
64x64 grid), per-bit accumulation via `list_inner_product` -- verified to
accumulate doubles in index order, bit-identical to the SrpSignature
kernel's sequential loop -- then 16 bands x 4 bits bucket join (cap
10000) and exact-cosine verify at threshold 0.5.
"""
from xxh64_sql import *  # noqa: F401,F403

BITS, BANDS, BITS_PER_BAND, SEED, CAP = 64, 16, 4, 7, 10000

def build():
    out = []
    src = f"""
SELECT b.b AS pb, d.d AS pd, b.b::UBIGINT AS x_hi, d.d::UBIGINT AS x_lo
FROM range({BITS}) b(b), range(64) d(d)"""
    ch = Chain("gm_srp_h", src, ["pb", "pd", "x_hi", "x_lo"])
    h = hash_long(ch, "a", t("x"), SEED)
    out += ch.stmts
    # signed long -> double, exactly h.toDouble / Long.MaxValue
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_srp_planes AS
SELECT pb, list(p ORDER BY pd) AS pl FROM (
  SELECT pb, pd,
    CAST(({h[0]}::HUGEINT * {M32} + {h[1]}::HUGEINT -
      CASE WHEN {h[0]} >= 2147483648 THEN 18446744073709551616::HUGEINT ELSE 0 END)
      AS DOUBLE) / 9223372036854775807.0 AS p
  FROM {ch.cur()})
GROUP BY pb""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_srp_sig AS
SELECT vec_id, CAST(SUM(CASE WHEN a > 0 THEN (1::UBIGINT << pb) ELSE 0 END) AS UBIGINT) AS sig
FROM (
  SELECT e.vec_id, p.pb,
    list_inner_product(CAST(e.embedding AS DOUBLE[]), p.pl) AS a
  FROM embeddings e CROSS JOIN gm_srp_planes p)
GROUP BY vec_id""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_srp_keys AS
SELECT vec_id, c.c AS chunk, (sig // (1::UBIGINT << (c.c * {BITS_PER_BAND}))) % {1 << BITS_PER_BAND} AS ckey
FROM gm_srp_sig, range({BANDS}) c(c)""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_srp_cand AS
SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
FROM gm_srp_keys l
JOIN (SELECT chunk, ckey FROM gm_srp_keys GROUP BY chunk, ckey
      HAVING count(*) <= {CAP}) ok USING (chunk, ckey)
JOIN gm_srp_keys r ON l.chunk = r.chunk AND l.ckey = r.ckey
  AND l.vec_id < r.vec_id""")
    out.append("""SELECT vec_a, vec_b,
  CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
    CAST(b.embedding AS DOUBLE[])) * 1000, 0) AS BIGINT) AS sim_i
FROM gm_srp_cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings b ON b.vec_id = c.vec_b
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
  CAST(b.embedding AS DOUBLE[])) >= 0.5
ORDER BY vec_a, vec_b""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
