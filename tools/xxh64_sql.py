#!/usr/bin/env python3
"""Shared mini-compiler: XXH64 (Spark's hash kernel) as staged DuckDB SQL.

64-bit wrapping arithmetic is expressed over (hi, lo) 32-bit UBIGINT
column pairs, one temp-table stage per op -- DuckDB has no wrapping 64-bit
ops, HUGEINT modulo chains measured ~10x slower, and macro composition
explodes the binder.  Validated bit-exact against JVM
org.apache.spark.sql.catalyst.expressions.XXH64 vectors.

Used by gen_minhash_oracle.py / gen_simhash_oracle.py to replay graft's
LSH pipelines for the driver's DuckDB correctness gate.
"""
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
M32 = 4294967296

def hl(c): return ((c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF)

class Chain:
    """Emits one temp-table stage per 64-bit op over (hi, lo) columns."""
    def __init__(self, prefix, src_sql, keep):
        self.prefix, self.keep, self.i = prefix, keep, 0
        self.stmts = [f"CREATE OR REPLACE TEMP TABLE {prefix}_0 AS {src_sql}"]
    def cur(self): return f"{self.prefix}_{self.i}"
    def stage(self, defs):
        """defs: list of (name, expr) added to the kept columns."""
        new = f"{self.prefix}_{self.i + 1}"
        cols = ", ".join(self.keep + [f"{e} AS {n}" for n, e in defs])
        self.stmts.append(f"CREATE OR REPLACE TEMP TABLE {new} AS SELECT {cols} FROM {self.cur()}")
        self.i += 1
        return new

# -- op expression builders; a/b are ("hi_col","lo_col") or int constants --
def c_(v):  # constant -> (hi_sql, lo_sql)
    h, l = hl(v); return (f"{h}::UBIGINT", f"{l}::UBIGINT")
def cols(v): return v if isinstance(v, tuple) else c_(v)

def add64(ch, out, a, b):
    (ah, al), (bh, bl) = cols(a), cols(b)
    ch.stage([(f"{out}_lo", f"(({al}) + ({bl})) % {M32}"),
              (f"{out}_hi", f"(({ah}) + ({bh}) + ((({al}) + ({bl})) // {M32})) % {M32}")])
    ch.keep += [f"{out}_hi", f"{out}_lo"]
def xor64(ch, out, a, b):
    (ah, al), (bh, bl) = cols(a), cols(b)
    ch.stage([(f"{out}_hi", f"xor({ah}, {bh})"), (f"{out}_lo", f"xor({al}, {bl})")])
    ch.keep += [f"{out}_hi", f"{out}_lo"]
def mul64(ch, out, a, b):
    (ah, al), (bh, bl) = cols(a), cols(b)
    p0 = f"(({al}) * ({bl}))"
    mid = f"((({al}) * ({bh})) % {M32} + (({ah}) * ({bl})) % {M32} + ({p0} // {M32}))"
    ch.stage([(f"{out}_lo", f"{p0} % {M32}"), (f"{out}_hi", f"{mid} % {M32}")])
    ch.keep += [f"{out}_hi", f"{out}_lo"]
def rotl64(ch, out, a, n):
    ah, al = cols(a)
    n = n % 64
    if n == 0: hi_e, lo_e = ah, al
    elif n < 32:
        hi_e = f"((({ah}) % {1 << (32 - n)}) * {1 << n} + (({al}) // {1 << (32 - n)}))"
        lo_e = f"((({al}) % {1 << (32 - n)}) * {1 << n} + (({ah}) // {1 << (32 - n)}))"
    elif n == 32: hi_e, lo_e = al, ah
    else:
        m = n - 32
        hi_e = f"((({al}) % {1 << (32 - m)}) * {1 << m} + (({ah}) // {1 << (32 - m)}))"
        lo_e = f"((({ah}) % {1 << (32 - m)}) * {1 << m} + (({al}) // {1 << (32 - m)}))"
    ch.stage([(f"{out}_hi", hi_e), (f"{out}_lo", lo_e)])
    ch.keep += [f"{out}_hi", f"{out}_lo"]
def shr64(ch, out, a, n):
    ah, al = cols(a)
    if n < 32:
        hi_e = f"(({ah}) // {1 << n})"
        lo_e = f"((({ah}) % {1 << n}) * {1 << (32 - n)} + (({al}) // {1 << n}))"
    else:
        hi_e, lo_e = "0::UBIGINT", f"(({ah}) // {1 << (n - 32)})"
    ch.stage([(f"{out}_hi", hi_e), (f"{out}_lo", lo_e)])
    ch.keep += [f"{out}_hi", f"{out}_lo"]

def t(name): return (f"{name}_hi", f"{name}_lo")

def fmix(ch, pre, h):
    shr64(ch, f"{pre}s1", h, 33); xor64(ch, f"{pre}x1", h, t(f"{pre}s1"))
    mul64(ch, f"{pre}m1", t(f"{pre}x1"), P2)
    shr64(ch, f"{pre}s2", t(f"{pre}m1"), 29); xor64(ch, f"{pre}x2", t(f"{pre}m1"), t(f"{pre}s2"))
    mul64(ch, f"{pre}m2", t(f"{pre}x2"), P3)
    shr64(ch, f"{pre}s3", t(f"{pre}m2"), 32); xor64(ch, f"{pre}x3", t(f"{pre}m2"), t(f"{pre}s3"))
    return t(f"{pre}x3")

def hash_long(ch, pre, x, seed):
    """XXH64.hashLong(x, seed): seed may be a col pair or const."""
    add64(ch, f"{pre}h0", seed, P5 + 8)
    mul64(ch, f"{pre}k1", x, P2)
    rotl64(ch, f"{pre}k2", t(f"{pre}k1"), 31)
    mul64(ch, f"{pre}k3", t(f"{pre}k2"), P1)
    xor64(ch, f"{pre}h1", t(f"{pre}h0"), t(f"{pre}k3"))
    rotl64(ch, f"{pre}h2", t(f"{pre}h1"), 27)
    mul64(ch, f"{pre}h3", t(f"{pre}h2"), P1)
    add64(ch, f"{pre}h4", t(f"{pre}h3"), P4)
    return fmix(ch, f"{pre}f", t(f"{pre}h4"))

def word_exprs(off_expr):
    """(hi, lo) little-endian 8-byte word at byte offset expr, from hex col hx."""
    def byte(i): return f"(('0x' || substr(hx, 1 + 2*({off_expr} + {i}), 2))::UBIGINT)"
    lo = " + ".join(f"{byte(i)} * {1 << (8 * i)}" for i in range(4))
    hi = " + ".join(f"{byte(i + 4)} * {1 << (8 * i)}" for i in range(4))
    return f"({hi})", f"({lo})"


def string_hash_stages(prefix, src_sql, keep, seed):
    """Stages computing xxh64(string, seed) for rows produced by `src_sql`,
    which must expose `keep` pass-through columns plus `hx` (hex of the
    UTF-8 bytes) and `len` (byte length).  Returns (chain, (hi, lo)) with
    the final stage holding the hash halves.  ONLY VALID FOR len < 32:
    the 4-lane stripe loop of full XXH64 is not staged, so callers MUST
    guard long strings (minhash/simhash NULL-poison them and surface the
    condition loudly rather than emit a wrong hash)."""
    ch = Chain(prefix, src_sql, list(keep) + ["hx", "len"])
    p5h, p5l = hl((P5 + seed) % (1 << 64))
    ch.stage([("h_lo", f"({p5l}::UBIGINT + len::UBIGINT) % {M32}"),
              ("h_hi", f"({p5h}::UBIGINT + ({p5l}::UBIGINT + len::UBIGINT) // {M32}) % {M32}")])
    ch.keep += ["h_hi", "h_lo"]
    for w in range(3):
        wh, wl = word_exprs(f"(len//32)*32 + 8*{w}")
        ch.stage([(f"w{w}_hi", f"CASE WHEN (len % 32) // 8 >= {w + 1} THEN {wh} ELSE 0 END"),
                  (f"w{w}_lo", f"CASE WHEN (len % 32) // 8 >= {w + 1} THEN {wl} ELSE 0 END")])
        ch.keep += [f"w{w}_hi", f"w{w}_lo"]
        mul64(ch, f"r{w}a", t(f"w{w}"), P2)
        rotl64(ch, f"r{w}b", t(f"r{w}a"), 31)
        mul64(ch, f"r{w}c", t(f"r{w}b"), P1)
        xor64(ch, f"r{w}d", t("h"), t(f"r{w}c"))
        rotl64(ch, f"r{w}e", t(f"r{w}d"), 27)
        mul64(ch, f"r{w}f", t(f"r{w}e"), P1)
        add64(ch, f"r{w}g", t(f"r{w}f"), P4)
        ch.stage([("h_hi2", f"CASE WHEN (len % 32) // 8 >= {w + 1} THEN r{w}g_hi ELSE h_hi END"),
                  ("h_lo2", f"CASE WHEN (len % 32) // 8 >= {w + 1} THEN r{w}g_lo ELSE h_lo END")])
        ch.keep = list(keep) + ["hx", "len", "h_hi2 AS h_hi", "h_lo2 AS h_lo"]
        ch.stage([])
        ch.keep = list(keep) + ["hx", "len", "h_hi", "h_lo"]
    b4 = lambda i: f"(('0x' || substr(hx, 1 + 2*(8*(len//8) + {i}), 2))::UBIGINT)"
    w32 = " + ".join(f"{b4(i)} * {1 << (8 * i)}" for i in range(4))
    ch.stage([("w4_hi", "0::UBIGINT"),
              ("w4_lo", f"CASE WHEN len % 8 >= 4 THEN ({w32}) ELSE 0 END")])
    ch.keep += ["w4_hi", "w4_lo"]
    mul64(ch, "q1", t("w4"), P1)
    xor64(ch, "q2", t("h"), t("q1"))
    rotl64(ch, "q3", t("q2"), 23)
    mul64(ch, "q4", t("q3"), P2)
    add64(ch, "q5", t("q4"), P3)
    ch.stage([("h_hi2", "CASE WHEN len % 8 >= 4 THEN q5_hi ELSE h_hi END"),
              ("h_lo2", "CASE WHEN len % 8 >= 4 THEN q5_lo ELSE h_lo END")])
    ch.keep = list(keep) + ["hx", "len", "h_hi2 AS h_hi", "h_lo2 AS h_lo"]
    ch.stage([])
    ch.keep = list(keep) + ["hx", "len", "h_hi", "h_lo"]
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
        ch.keep = list(keep) + ["hx", "len", "h_hi2 AS h_hi", "h_lo2 AS h_lo"]
        ch.stage([])
        ch.keep = list(keep) + ["hx", "len", "h_hi", "h_lo"]
    f = fmix(ch, "g", t("h"))
    return ch, f
