#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for dedup_incremental_near.\n\nIncremental variant of gen_minhash_oracle.py: the shingle source is the\ncorpus UNION an offset, suffix-mutated batch (doc_id %% 5 == 0), the\nbucket cap applies to CORPUS-side band rows only, and candidates are\nrestricted to corpus x batch pairs.

Replays graft's MinHash+LSH pipeline (xxh64 shingle hashes -> 32 seeded
min-hashes -> 8 band keys -> bucket join -> exact Jaccard verify) in pure
DuckDB SQL.  64-bit wrapping arithmetic is staged as (hi, lo) 32-bit
UBIGINT column pairs across temp tables -- DuckDB has no wrapping 64-bit
ops, and HUGEINT modulo chains measured ~100x slower.

xxh64 here matches org.apache.spark.sql.catalyst.expressions.XXH64
(validated against JVM test vectors).  Shingles >= 32 bytes hash to NULL:
the 4-lane stripe path is deliberately not replayed (corpus max shingle is
26 bytes; a NULL poisons candidates VISIBLY if that ever changes).
"""
from xxh64_sql import *  # noqa: F401,F403

def build():
    out = []
    # ---- stage A: shingle rows + xxh64(shingle, 0) --------------------
    src = """
SELECT DISTINCT doc_id, hex(encode(sh)) AS hx, octet_length(encode(sh)) AS len
FROM (
  SELECT doc_id, unnest(list_transform(range(len(toks)-2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
        FROM (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000,
                     text || ' incremental probe suffix tokens'
              FROM documents WHERE doc_id % 5 = 0)
        WHERE len(string_split(text, ' ')) >= 3))"""
    ch = Chain("gm_mi_a", src, ["doc_id", "hx", "len"])
    # h = P5 + len  (seed 0, len < 32; >=32 -> NULL via the final guard)
    ch.stage([("h_lo", f"({hl(P5)[1]}::UBIGINT + len::UBIGINT) % {M32}"),
              ("h_hi", f"({hl(P5)[0]}::UBIGINT + ({hl(P5)[1]}::UBIGINT + len::UBIGINT) // {M32}) % {M32}")])
    ch.keep += ["h_hi", "h_lo"]
    # up to 3 8-byte word steps, each guarded by word count
    for w in range(3):
        wh, wl = word_exprs(f"8*{w}")
        ch.stage([(f"w{w}_hi", f"CASE WHEN len // 8 >= {w + 1} THEN {wh} ELSE 0 END"),
                  (f"w{w}_lo", f"CASE WHEN len // 8 >= {w + 1} THEN {wl} ELSE 0 END")])
        ch.keep += [f"w{w}_hi", f"w{w}_lo"]
        # step: h = rotl(h ^ round0(w), 27) * P1 + P4, only when word exists
        mul64(ch, f"r{w}a", t(f"w{w}"), P2)
        rotl64(ch, f"r{w}b", t(f"r{w}a"), 31)
        mul64(ch, f"r{w}c", t(f"r{w}b"), P1)
        xor64(ch, f"r{w}d", t("h"), t(f"r{w}c"))
        rotl64(ch, f"r{w}e", t(f"r{w}d"), 27)
        mul64(ch, f"r{w}f", t(f"r{w}e"), P1)
        add64(ch, f"r{w}g", t(f"r{w}f"), P4)
        ch.stage([("h_hi2", f"CASE WHEN len // 8 >= {w + 1} THEN r{w}g_hi ELSE h_hi END"),
                  ("h_lo2", f"CASE WHEN len // 8 >= {w + 1} THEN r{w}g_lo ELSE h_lo END")])
        ch.keep = ["doc_id", "hx", "len", "h_hi2 AS h_hi", "h_lo2 AS h_lo"]
        ch.stage([])
        ch.keep = ["doc_id", "hx", "len", "h_hi", "h_lo"]
    # optional 4-byte word: h = rotl(h ^ (w32 * P1), 23) * P2 + P3
    b4 = lambda i: f"(('0x' || substr(hx, 1 + 2*(8*(len//8) + {i}), 2))::UBIGINT)"
    w32 = " + ".join(f"{b4(i)} * {1 << (8 * i)}" for i in range(4))
    ch.stage([("w4_hi", "0::UBIGINT"), ("w4_lo", f"CASE WHEN len % 8 >= 4 THEN ({w32}) ELSE 0 END")])
    ch.keep += ["w4_hi", "w4_lo"]
    mul64(ch, "q1", t("w4"), P1)
    xor64(ch, "q2", t("h"), t("q1"))
    rotl64(ch, "q3", t("q2"), 23)
    mul64(ch, "q4", t("q3"), P2)
    add64(ch, "q5", t("q4"), P3)
    ch.stage([("h_hi2", "CASE WHEN len % 8 >= 4 THEN q5_hi ELSE h_hi END"),
              ("h_lo2", "CASE WHEN len % 8 >= 4 THEN q5_lo ELSE h_lo END")])
    ch.keep = ["doc_id", "hx", "len", "h_hi2 AS h_hi", "h_lo2 AS h_lo"]
    ch.stage([])
    ch.keep = ["doc_id", "hx", "len", "h_hi", "h_lo"]
    # up to 3 tail bytes: h = rotl(h ^ (byte * P5), 11) * P1
    for b in range(3):
        bb = f"(('0x' || substr(hx, 1 + 2*(4*(len//4) + {b}), 2))::UBIGINT)"
        ch.stage([(f"tb{b}_hi", "0::UBIGINT"),
                  (f"tb{b}_lo", f"CASE WHEN len % 4 >= {b + 1} THEN {bb} ELSE 0 END")])
        ch.keep += [f"tb{b}_hi", f"tb{b}_lo"]
        mul64(ch, f"u{b}a", t(f"tb{b}"), P5)
        xor64(ch, f"u{b}b", t("h"), t(f"u{b}a"))
        rotl64(ch, f"u{b}c", t(f"u{b}b"), 11)
        mul64(ch, f"u{b}d", t(f"u{b}c"), P1)
        ch.stage([("h_hi2", f"CASE WHEN len % 4 >= {b + 1} THEN u{b}d_hi ELSE h_hi END"),
                  ("h_lo2", f"CASE WHEN len % 4 >= {b + 1} THEN u{b}d_lo ELSE h_lo END")])
        ch.keep = ["doc_id", "hx", "len", "h_hi2 AS h_hi", "h_lo2 AS h_lo"]
        ch.stage([])
        ch.keep = ["doc_id", "hx", "len", "h_hi", "h_lo"]
    f = fmix(ch, "g", t("h"))
    out += ch.stmts
    # distinct shingle hashes, single UBIGINT; len >= 32 poisons to NULL (see doc)
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_mi_sh AS
SELECT DISTINCT doc_id, CASE WHEN len >= 32 THEN NULL ELSE {f[0]} * {M32} + {f[1]} END AS h
FROM {ch.cur()}""")
    # ---- stage B: 32 seeded min-hashes -------------------------------
    src = f"""
SELECT doc_id, h, s.s AS s, h // {M32} AS x_hi, h % {M32} AS x_lo
FROM gm_mi_sh, range(32) s(s)"""
    ch = Chain("gm_mi_b", src, ["doc_id", "s"])
    # seed = s (hi 0, lo s)
    ch.stage([("sd_hi", "0::UBIGINT"), ("sd_lo", "s::UBIGINT"),
              ("x_hi", "x_hi"), ("x_lo", "x_lo")])
    ch.keep += ["sd_hi", "sd_lo", "x_hi", "x_lo"]
    hf = hash_long(ch, "b", t("x"), t("sd"))
    out += ch.stmts
    # signed-long min via sign-bit flip; keep the achieving value
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_mi_mins AS
SELECT doc_id, s, min(xor({hf[0]}, 2147483648) * {M32} + {hf[1]}) AS skey
FROM {ch.cur()} GROUP BY doc_id, s""")
    # ---- stage C: band keys (8 bands of 4, sequential hashLong fold) --
    src = f"""
SELECT doc_id, s // 4 AS band,
  max(CASE WHEN s % 4 = 0 THEN skey END) AS k0,
  max(CASE WHEN s % 4 = 1 THEN skey END) AS k1,
  max(CASE WHEN s % 4 = 2 THEN skey END) AS k2,
  max(CASE WHEN s % 4 = 3 THEN skey END) AS k3
FROM gm_mi_mins GROUP BY doc_id, s // 4"""
    ch = Chain("gm_mi_c", src, ["doc_id", "band"])
    ch.stage([("acc_hi", "0::UBIGINT"), ("acc_lo", "band::UBIGINT")] +
             [(f"m{r}_hi", f"xor(k{r} // {M32}, 2147483648)") for r in range(4)] +
             [(f"m{r}_lo", f"k{r} % {M32}") for r in range(4)])
    ch.keep += ["acc_hi", "acc_lo"] + [f"m{r}_{p}" for r in range(4) for p in ("hi", "lo")]
    acc = t("acc")
    for r in range(4):
        acc = hash_long(ch, f"c{r}", t(f"m{r}"), acc)
    out += ch.stmts
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_mi_bands AS
SELECT doc_id, band, {acc[0]} * {M32} + {acc[1]} AS bucket FROM {ch.cur()}""")
    # ---- candidates + exact-Jaccard verify ----------------------------
    out.append("""CREATE OR REPLACE TEMP TABLE gm_mi_cand AS
SELECT DISTINCT r.doc_id AS batch_id, l.doc_id AS corpus_id
FROM gm_mi_bands l
JOIN (SELECT band, bucket FROM gm_mi_bands WHERE doc_id < 1000000
      GROUP BY band, bucket HAVING count(*) <= 1000) ok USING (band, bucket)
JOIN gm_mi_bands r ON l.band = r.band AND l.bucket = r.bucket
WHERE l.doc_id < 1000000 AND r.doc_id >= 1000000""")
    out.append("""CREATE OR REPLACE TEMP TABLE gm_mi_sets AS
SELECT doc_id, list(h) AS hs, count(*) AS n FROM gm_mi_sh GROUP BY doc_id""")
    out.append("""SELECT batch_id, corpus_id,
  len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS i,
  a.n + b.n - len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS u
FROM gm_mi_cand c
JOIN gm_mi_sets a ON a.doc_id = c.batch_id
JOIN gm_mi_sets b ON b.doc_id = c.corpus_id
WHERE len(list_filter(a.hs, x -> list_contains(b.hs, x))) * 10 >=
      (a.n + b.n - len(list_filter(a.hs, x -> list_contains(b.hs, x)))) * 8
  AND (a.n + b.n - len(list_filter(a.hs, x -> list_contains(b.hs, x)))) > 0
ORDER BY batch_id, corpus_id""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
