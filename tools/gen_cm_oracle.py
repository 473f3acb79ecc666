#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for sketch_countmin.

Replays graft's count-min sketch end to end: token occurrences ->
xxh64(token || '|' || i, 42) bucket positions for i in 0..3 (width 64,
a power of two, so the bucket is the hash's low bits -- pmod of the
signed value and mod of the unsigned representation agree) -> cell
counts -> min-over-rows estimates for the top-50 exact tokens.  Shares
the staged XXH64 compiler with gen_minhash_oracle.py.

Tokens are guarded to <= 24 UTF-8 bytes IN THE QUERY (both engines), so
the variant strings stay under the staged hasher's 32-byte contract; a
sentinel row still surfaces any violation loudly.
"""
from xxh64_sql import *  # noqa: F401,F403

DEPTH, WIDTH = 4, 64

def build():
    out = []
    # ---- token occurrences + exact counts ------------------------------
    out.append(f"""CREATE OR REPLACE TEMP TABLE cm_tok AS
SELECT tok FROM (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
WHERE len(tok) > 0 AND octet_length(encode(tok)) <= 24""")
    out.append("""CREATE OR REPLACE TEMP TABLE cm_exact AS
SELECT tok, CAST(count(*) AS BIGINT) AS exact FROM cm_tok GROUP BY tok""")
    # ---- distinct (token, row) variant strings -> xxh64 -> bucket ------
    src = f"""
SELECT tok, v.i AS r,
  hex(encode(tok || '|' || v.i)) AS hx,
  octet_length(encode(tok || '|' || v.i)) AS len
FROM (SELECT DISTINCT tok FROM cm_tok), range({DEPTH}) v(i)"""
    ch, f = string_hash_stages("cm_h", src, ["tok", "r"], seed=42)
    out += ch.stmts
    # bucket = low bits (WIDTH divides 2^32); NULL-poison oversized strings
    out.append(f"""CREATE OR REPLACE TEMP TABLE cm_buckets AS
SELECT tok, r,
  CASE WHEN len >= 32 THEN NULL ELSE {f[1]} % {WIDTH} END AS bucket
FROM {ch.cur()}""")
    # ---- sketch cells: sum of landing tokens' occurrence counts --------
    out.append("""CREATE OR REPLACE TEMP TABLE cm_sketch AS
SELECT r, bucket, CAST(SUM(exact) AS BIGINT) AS c
FROM cm_exact JOIN cm_buckets USING (tok)
GROUP BY r, bucket""")
    # ---- estimates for the top-50 exact tokens + loud sentinel ---------
    out.append(f"""SELECT token, exact, est FROM (
  SELECT e.tok AS token, e.exact AS exact, MIN(s.c) AS est
  FROM cm_exact e
  JOIN cm_buckets b USING (tok)
  JOIN cm_sketch s ON s.r = b.r AND s.bucket = b.bucket
  GROUP BY e.tok, e.exact
  ORDER BY exact DESC, token
  LIMIT 50)
UNION ALL
SELECT 'OVERSIZED-TOKEN-SENTINEL', -1, count(*) FROM cm_buckets
WHERE bucket IS NULL HAVING count(*) > 0
ORDER BY exact DESC, token""")
    return ";\n".join(out)

if __name__ == "__main__":
    import sys
    sql = build()
    path = sys.argv[1] if len(sys.argv) > 1 else \
        __file__.rsplit("/", 2)[0] + "/src/main/resources/graft/cm_oracle.sql"
    with open(path, "w") as fh:
        fh.write(sql)
    print(f"wrote {path} ({len(sql)} bytes)")
