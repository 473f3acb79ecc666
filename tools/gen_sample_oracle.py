#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for corpus_sample.

Replays graft's Curation.sampleStratified: rank documents within each
lang stratum by (xxh64(doc_id, seed 42), doc_id) -- Spark's xxhash64
default seed -- and keep rank <= 25.  The hash is the staged XXH64
compiler (xxh64_sql.py); the sign-bit xor flip keys DuckDB's unsigned
(hi, lo) order to the signed-long order Spark sorts by (same trick as
the k-means init replay).
"""
from xxh64_sql import *  # noqa: F401,F403

PER_STRATUM = 25

def build():
    src = (f"SELECT doc_id, lang, (doc_id // {M32})::UBIGINT AS x_hi, "
           f"(doc_id % {M32})::UBIGINT AS x_lo FROM documents")
    ch = Chain("gsm_h", src, ["doc_id", "lang", "x_hi", "x_lo"])
    h = hash_long(ch, "a", t("x"), 42)
    out = list(ch.stmts)
    out.append(f"""SELECT lang, rnk, doc_id FROM (
  SELECT lang, doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
    xor({h[0]}, 2147483648) * {M32} + {h[1]}, doc_id) AS BIGINT) AS rnk
  FROM {ch.cur()})
WHERE rnk <= {PER_STRATUM} ORDER BY lang, rnk""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
