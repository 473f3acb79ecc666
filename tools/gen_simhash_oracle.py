#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for dedup_simhash.

Replays graft's SimHash chunk-pair LSH pipeline: xxh64(token, 42) per
distinct lowercase token -> 64-bit sign-accumulated signature -> C(5,2)
chunk-PAIR keys (maxHamming=3 -> 5 chunks, widths [13,13,13,13,12]) ->
bucket join (cap 1000) -> exact Hamming verify via bit_count(xor).
Shares the staged XXH64 compiler with gen_minhash_oracle.py; validated
bit-exact against the Spark dump.
"""
from xxh64_sql import *  # noqa: F401,F403

N_CHUNKS = 5
WIDTHS = [64 // N_CHUNKS + (1 if i < 64 % N_CHUNKS else 0) for i in range(N_CHUNKS)]
OFFSETS = [sum(WIDTHS[:i]) for i in range(N_CHUNKS)]
PAIRS = [(a, b) for a in range(N_CHUNKS) for b in range(a + 1, N_CHUNKS)]

def build():
    out = []
    # ---- distinct lowercase tokens per doc (split keeps empties) -------
    src = """
SELECT DISTINCT doc_id, hex(encode(tok)) AS hx, octet_length(encode(tok)) AS len
FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)"""
    ch, f = string_hash_stages("gm_sh_a", src, ["doc_id"], seed=42)
    out += ch.stmts
    # len >= 32 exceeds the staged-XXH64 contract: NULL-poison the hash and
    # surface it via the sentinel row below (never a silent wrong signature)
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_sh_tok AS
SELECT DISTINCT doc_id,
  CASE WHEN len >= 32 THEN NULL ELSE {f[0]} * {M32} + {f[1]} END AS h
FROM {ch.cur()}""")
    # ---- 64-bit sign accumulation -> signature -------------------------
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_sh_sig AS
SELECT doc_id, CAST(SUM(CASE WHEN cnt > 0 THEN pw ELSE 0 END) AS UBIGINT) AS sig
FROM (
  SELECT doc_id, bits.i AS i, (1::UBIGINT << bits.i) AS pw,
    SUM(CASE WHEN (h // (1::UBIGINT << bits.i)) % 2 = 1 THEN 1 ELSE -1 END) AS cnt
  FROM gm_sh_tok, range(64) bits(i)
  GROUP BY doc_id, bits.i)
GROUP BY doc_id""")
    # ---- chunk-pair LSH keys ------------------------------------------
    keys = []
    for idx, (a, b) in enumerate(PAIRS):
        ca = f"((sig // {1 << OFFSETS[a]}::UBIGINT) % {1 << WIDTHS[a]})"
        cb = f"((sig // {1 << OFFSETS[b]}::UBIGINT) % {1 << WIDTHS[b]})"
        keys.append(f"WHEN p.ci = {idx} THEN {ca} * {1 << WIDTHS[b]} + {cb}")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_sh_keys AS
SELECT doc_id, sig, p.ci AS chunk,
  CASE {' '.join(keys)} END AS ckey
FROM gm_sh_sig, range({len(PAIRS)}) p(ci)""")
    # ---- capped bucket join + exact Hamming verify ---------------------
    out.append("""CREATE OR REPLACE TEMP TABLE gm_sh_cand AS
SELECT DISTINCT l.doc_id AS doc_a, l.sig AS sig_a, r.doc_id AS doc_b, r.sig AS sig_b
FROM gm_sh_keys l
JOIN (SELECT chunk, ckey FROM gm_sh_keys GROUP BY chunk, ckey
      HAVING count(*) <= 1000) ok USING (chunk, ckey)
JOIN gm_sh_keys r ON l.chunk = r.chunk AND l.ckey = r.ckey
  AND l.doc_id < r.doc_id""")
    # sentinel row: if ANY token blew the 32-byte staged-hash bound, emit an
    # impossible (-1, -1) pair so the driver's rows/hash compare fails LOUDLY
    # instead of matching against silently-wrong signatures
    out.append("""SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b)) AS hamming
  FROM (SELECT DISTINCT doc_a, doc_b, sig_a, sig_b FROM gm_sh_cand)
  WHERE bit_count(xor(sig_a, sig_b)) <= 3
  UNION ALL
  SELECT -1, -1, count(*) FROM gm_sh_tok WHERE h IS NULL HAVING count(*) > 0)
ORDER BY doc_a, doc_b""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
