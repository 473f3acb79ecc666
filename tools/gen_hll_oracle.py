#!/usr/bin/env python3
"""Generate the DuckDB oracle SQL for q_approx_distinct.

Replays Spark's HyperLogLogPlusPlus aggregate (rsd 0.05 -> p=9, m=512)
bit-for-bit: xxh64(value, 42) via the staged compiler; idx = x >>> 55;
rank = nlz((x << 9) | 256) + 1; registers = max rank; zInverse summed in
ascending register order (list_reduce -- double addition order matters);
then the exact linear-counting / threshold / bias-correction selection
decompiled from HyperLogLogPlusPlusHelper (K=6 nearest-neighbor bias
window with its shift loop, Math.round via floor(x + 0.5)).  The
RAW_ESTIMATE_DATA / BIAS_DATA rows for p=9 are dumped from the Spark jar
(201 entries, shortest-round-trip doubles).
"""
from xxh64_sql import *  # noqa: F401,F403

P, M, K, THRESHOLD = 9, 512, 6, 400.0

def load_tables(path=__file__.rsplit("/", 1)[0] + "/hll_tables_p9.tsv"):
    raw, bias = [], []
    for line in open(path):
        f = line.rstrip("\n").split("\t")
        if f[0] == "ROW":
            raw.append(f[2]); bias.append(f[3])
    assert len(raw) == 201, len(raw)
    return raw, bias

def build():
    raw, bias = load_tables()
    out = []
    # xxh64(l_partkey, 42) per distinct (flag, partkey) -- duplicates
    # cannot change a max-of-rank register
    src = f"""
SELECT l_returnflag AS flag, l_partkey AS pk,
  (l_partkey // {M32})::UBIGINT AS x_hi, (l_partkey % {M32})::UBIGINT AS x_lo
FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)"""
    ch = Chain("gm_hll_h", src, ["flag", "pk", "x_hi", "x_lo"])
    h = hash_long(ch, "a", t("x"), 42)
    out += ch.stmts
    # idx = x >>> 55 = hi >> 23; w = ((x << 9) mod 2^64) | 256 -- the OR
    # only touches bit 8, which the << 9 left as 0, so + works; nlz via
    # the binary-string length of w (w >= 256 > 0 always)
    # rank = nlz(w) + 1 = 64 - msb(w); msb via a powers-table max (exact
    # integer comparisons -- float log2 is off-by-one at power boundaries)
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_hll_w AS
SELECT flag, ({h[0]} // {1 << 23}) AS idx,
  ((({h[0]} % {1 << 23}) * {M32} + {h[1]}) * {1 << 9} + 256)::UBIGINT AS wv
FROM {ch.cur()}""")
    out.append("""CREATE OR REPLACE TEMP TABLE gm_hll_reg AS
SELECT flag, idx, max(64 - (SELECT max(bb.b) FROM range(64) bb(b)
  WHERE wv >= (1::UBIGINT << bb.b))) AS rank
FROM gm_hll_w GROUP BY flag, idx""")
    # dense 512 registers (missing -> 0), zInverse in ascending idx order
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_hll_z AS
SELECT flag,
  list_reduce(list_prepend(0.0::DOUBLE, list(1.0 / (1::UBIGINT << mm)::DOUBLE ORDER BY idx)),
              (acc, x) -> acc + x) AS z_inverse,
  SUM(CASE WHEN mm = 0 THEN 1 ELSE 0 END)::DOUBLE AS v
FROM (
  SELECT f.flag, r.i AS idx, coalesce(g.rank, 0) AS mm
  FROM (SELECT DISTINCT flag FROM gm_hll_reg) f
  CROSS JOIN range({M}) r(i)
  LEFT JOIN gm_hll_reg g ON g.flag = f.flag AND g.idx = r.i)
GROUP BY flag""")
    # raw-estimate / bias tables for p=9
    rows = ",\n".join(f"({i}, {r}::DOUBLE, {b}::DOUBLE)"
                      for i, (r, b) in enumerate(zip(raw, bias)))
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_hll_tbl(i INTEGER, raw DOUBLE, bias DOUBLE);
INSERT INTO gm_hll_tbl VALUES {rows}""")
    # e, the K-nearest bias window (binary-search insertion point, then the
    # decompiled shift-while-closer loop), and the final selection
    alpha = f"((0.7213 / (1.0 + 1.079 / {M}.0)) * {M}.0) * {M}.0"
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_hll_e AS
SELECT flag, {alpha} / z_inverse AS e, v FROM gm_hll_z""")
    out.append(f"""CREATE OR REPLACE TEMP TABLE gm_hll_win AS
SELECT flag, e, v, low0 + shift AS low, high0 + shift AS high FROM (
  SELECT flag, e, v, low0, high0,
    coalesce((SELECT min(s.s) FROM range(201) s(s)
      WHERE high0 + s.s >= 201
         OR NOT (SELECT (t1.raw - e) * (t1.raw - e) < (t2.raw - e) * (t2.raw - e)
                 FROM gm_hll_tbl t1, gm_hll_tbl t2
                 WHERE t1.i = high0 + s.s AND t2.i = low0 + s.s)), 0) AS shift
  FROM (
    SELECT flag, e, v,
      greatest((SELECT count(*) FROM gm_hll_tbl WHERE raw < e)::BIGINT - {K} + 1, 0) AS low0,
      least(greatest((SELECT count(*) FROM gm_hll_tbl WHERE raw < e)::BIGINT - {K} + 1, 0) + {K}, 201) AS high0
    FROM gm_hll_e))""")
    out.append(f"""SELECT l_returnflag, approx_parts, exact_parts FROM (
  SELECT w.flag AS l_returnflag,
    CAST(floor(
      CASE WHEN w.v > 0 AND ({M}.0 * ln({M}.0 / w.v) <= {THRESHOLD} OR w.e <= 2.5 * {M}.0)
           THEN {M}.0 * ln({M}.0 / w.v)
           WHEN w.e < 5.0 * {M}.0 THEN w.e - (
             SELECT list_reduce(list_prepend(0.0::DOUBLE, list(bias ORDER BY i)),
                                (acc, x) -> acc + x) / (w.high - w.low)
             FROM gm_hll_tbl WHERE i >= w.low AND i < w.high)
           ELSE w.e END + 0.5) AS BIGINT) AS approx_parts
  FROM gm_hll_win w) a
JOIN (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
      FROM lineitem GROUP BY l_returnflag) b USING (l_returnflag)
ORDER BY l_returnflag""")
    return ";\n".join(out)

if __name__ == "__main__":
    print(build())
