#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
parquet, run each oracle SQL in DuckDB over the testdata tables, and
compare (columns sorted by name, rows sorted, exact value equality with
a tiny float report). Usage: check.py <sfdir> <verify_outdir>
"""
import sys, os, json, math, re
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [cols[i] for i in idx]

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        # GATE-FIDELITY RULE (round-8, after the round-7 12-query miss):
        # the SPARK side must be read the way the DRIVER reads it —
        # pyarrow → pandas — NOT through DuckDB. Reading both sides
        # through DuckDB collapses e.g. a Spark DECIMAL output column to
        # float64 on both sides, hiding exactly the representation
        # divergence the driver hashes on (pyarrow gives dtype `object`
        # holding decimal.Decimal; the DuckDB oracle's .df() gives
        # float64 → hash_match=false despite equal values). The ORACLE
        # side stays on DuckDB .df(), which is also the driver's path.
        def rows_of(df):
            return [tuple(None if v is None else v
                          for v in r) for r in df.itertuples(index=False, name=None)]
        def norm_types(df):
            # datetime64 RESOLUTION (ms/us/ns) is EMPIRICALLY hash-neutral
            # on the driver: 11 round-8 queries (q3_topk, q18_big_orders,
            # q_interpolate, q_islands, q_moving_avg, q_resample,
            # q_resample_by_key, q_retention, q_window_distinct,
            # q_zone_map_date, q_zone_map_multi) ship datetime64[ms] on
            # the pyarrow side vs [us] on the DuckDB side and ALL have
            # hash_match=true in CORRECTNESS_r08.json — so collapsing the
            # resolution token is faithful, not masking. TIMEZONE is NOT
            # collapsed (round-8 advisory): a tz-aware vs naive divergence
            # has no such evidence of neutrality and stays a local FAIL.
            def n(t):
                m = re.match(r"datetime64\[(?:ms|us|ns)(?:, (.+))?\]$", str(t))
                if m:
                    return "datetime64" + (f"[{m.group(1)}]" if m.group(1) else "")
                return str(t)
            return {c: n(t) for c, t in df.dtypes.items()}
        def frame(sql):
            df = con.execute(sql).df()
            return rows_of(df), list(df.columns), norm_types(df)
        try:
            gdf = pq.read_table(f"{outdir}/{name}").to_pandas(date_as_object=False)
            grows, gcols, gtypes = rows_of(gdf), list(gdf.columns), norm_types(gdf)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        if name not in oracle:
            print(f"rows-only {name}: {len(grows)} rows"); continue
        try:
            wrows, wcols, wtypes = frame(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, gc = canon(grows, gcols)
        w, wc = canon(wrows, wcols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}"); n_fail += 1; continue
        # dtype check mirrors the driver's pandas-hash: a value-equal but
        # dtype-different column (e.g. DuckDB HUGEINT -> float64 vs Spark
        # int64) hash-mismatches even when every value compares equal
        if gtypes != wtypes:
            diff = {c: (gtypes.get(c), wtypes.get(c))
                    for c in set(gtypes) | set(wtypes) if gtypes.get(c) != wtypes.get(c)}
            print(f"FAIL {name}: dtype mismatch {diff}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: {len(g)} rows vs {len(w)}"); n_fail += 1; continue
        bad = None
        maxdiff = 0.0
        for i, (gr, wr) in enumerate(zip(g, w)):
            for j, (a, b) in enumerate(zip(gr, wr)):
                if not eq(a, b):
                    if isinstance(a, float) and isinstance(b, float):
                        maxdiff = max(maxdiff, abs(a - b))
                    if bad is None:
                        bad = (i, gc[j], a, b)
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]} col {bad[1]}: {bad[2]!r} vs {bad[3]!r} (max float diff {maxdiff:g})")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names) - n_pass - n_fail} rows-only")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
