#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for sketch_bloom.

Replays graft's Bloom-filter decontamination: 4-gram md5 digests
truncated to 16 hex chars (within the staged hasher's byte contract;
truncation collisions are deterministic and replay identically) ->
eval-side set bits at xxh64(g || '|' || i, 42) % 65536 for i in 0..2 ->
per-(doc, gram) membership = ALL 3 positions set -> per-doc maybe/total
counts.  False positives are a function of the layout and reproduce
exactly.  Shares the staged XXH64 compiler with gen_minhash_oracle.py.
"""
from xxh64_sql import *  # noqa: F401,F403

HASHES, BITS = 3, 65536

def build():
    out = []
    # ---- 4-gram digests per side (same list ops as text_decontaminate) -
    out.append("""CREATE OR REPLACE TEMP TABLE bl_grams AS
SELECT doc_id, unnest(list_transform(range(len(t) - 3),
  i -> substr(md5(array_to_string(t[i+1:i+4], ' ')), 1, 16))) AS g
FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
WHERE len(t) >= 4""")
    # ---- distinct grams of BOTH sides -> bucket positions --------------
    src = f"""
SELECT g, v.i AS r,
  hex(encode(g || '|' || v.i)) AS hx,
  octet_length(encode(g || '|' || v.i)) AS len
FROM (SELECT DISTINCT g FROM bl_grams), range({HASHES}) v(i)"""
    ch, f = string_hash_stages("bl_h", src, ["g", "r"], seed=42)
    out += ch.stmts
    out.append(f"""CREATE OR REPLACE TEMP TABLE bl_pos AS
SELECT g, r, {f[1]} % {BITS} AS pos FROM {ch.cur()}""")
    # ---- eval-side set bits --------------------------------------------
    out.append("""CREATE OR REPLACE TEMP TABLE bl_bloom AS
SELECT DISTINCT pos FROM bl_pos
WHERE g IN (SELECT DISTINCT g FROM bl_grams WHERE doc_id % 97 = 0)""")
    # ---- corpus probe: all HASHES positions set -> might_contain -------
    out.append(f"""SELECT doc_id,
  CAST(SUM(CASE WHEN hits = {HASHES} THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
  CAST(count(*) AS BIGINT) AS n_grams
FROM (
  SELECT c.doc_id, c.g,
    SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS hits
  FROM (SELECT DISTINCT doc_id, g FROM bl_grams WHERE doc_id % 97 <> 0) c
  JOIN bl_pos p USING (g)
  LEFT JOIN bl_bloom b ON p.pos = b.pos
  GROUP BY c.doc_id, c.g)
GROUP BY doc_id ORDER BY doc_id""")
    return ";\n".join(out)

if __name__ == "__main__":
    import sys
    sql = build()
    path = sys.argv[1] if len(sys.argv) > 1 else \
        __file__.rsplit("/", 2)[0] + "/src/main/resources/graft/bloom_oracle.sql"
    with open(path, "w") as fh:
        fh.write(sql)
    print(f"wrote {path} ({len(sql)} bytes)")
