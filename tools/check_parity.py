"""Local oracle-parity gate, mimicking the driver's t2 check.

For every query in ``__spark_entry__.queries()`` with an oracle: run the
Spark query and the DuckDB oracle at a given sf dir, then compare
row count, column-name set, and order-insensitive values (exact — the
driver hashes values, so bit-identical is the bar; we report max float
deviation on mismatch to make drift debuggable).

Usage: python tools/check_parity.py [sf_dir] [query ...] [--json out.json]
                                    [--rotate ROUND[/SLICES]]

With ``--json`` a per-query machine-readable record is also written
(the committed PARITY_r<N>.json artifact — makes the full-registry
green claim auditable beyond the driver's 50-query sample).

``--rotate ROUND[/SLICES]`` (round 12, VERDICT r11 #3): run the
deterministic residue-class slice for that round — queries whose NAME
hash satisfies ``crc32(name) % SLICES == ROUND % SLICES`` (SLICES
defaults to 5, ≈50 queries per slice). Name-hash membership is stable
under registry GROWTH (a sorted-index scheme would shift every
query's slice whenever one is added — round-12 review), so successive
rounds rotate through slices that stay disjoint and jointly exhaustive
over whatever registry existed when each ran; a third-party verifier
re-running a few rounds' slices covers the whole registry without
trusting any single full sweep. The JSON record carries ``mode:
rotate`` plus the slice parameters so rotated-slice evidence is
distinguishable from a full sweep (``mode: full``) at a glance.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            # dates / decimals / strings → canonical string
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        # Representation drift the driver's value-hash WOULD catch but a
        # value-level compare coerces away: e.g. DuckDB HUGEINT (int128,
        # fetchdf → float64) vs Spark BIGINT (int64). If one side is
        # integer and the other float with no NaN explaining it, the
        # engines disagree on the column's type — fail loudly.
        sk, dk = sv.dtype.kind, dv.dtype.kind
        if {sk, dk} == {"i", "f"} and not sv.isna().any() and not dv.isna().any():
            problems.append(
                f"col {c}: dtype drift spark={sv.dtype} duck={dv.dtype} "
                "(engine type mismatch, e.g. HUGEINT vs BIGINT — cast the oracle)"
            )
            continue
        if sk == "i" and dk == "i" and sv.dtype != dv.dtype:
            problems.append(
                f"col {c}: integer width drift spark={sv.dtype} duck={dv.dtype} "
                "(e.g. TINYINT vs BIGINT — cast both sides to BIGINT)"
            )
            continue
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(dv):
            both_nan = sv.isna() & dv.isna()
            eq = (sv == dv) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                diff = (sv - dv).abs().max()
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, max|diff|={diff:.3e}, "
                    f"first at row {bad}: spark={sv[bad]!r} duck={dv[bad]!r}"
                )
        else:
            sv2 = sv.map(lambda v: None if (isinstance(v, float) and math.isnan(v)) else v)
            dv2 = dv.map(lambda v: None if (isinstance(v, float) and math.isnan(v)) else v)
            eq = (sv2.isna() & dv2.isna()) | (sv2 == dv2)
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(
                    f"col {c} ({sv.dtype} vs {dv.dtype}): {int((~eq).sum())} mismatches, "
                    f"first at row {bad}: spark={sv2[bad]!r} duck={dv2[bad]!r}"
                )
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    rotate = None  # (round, n_slices)
    if "--rotate" in argv:
        i = argv.index("--rotate")
        spec = argv[i + 1]
        del argv[i : i + 2]
        rnd, _, slices = spec.partition("/")
        rotate = (int(rnd), int(slices) if slices else 5)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from osmart_etl_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if rotate is not None:
        import zlib

        rnd, n_slices = rotate
        # NAME-hash membership: stable when queries are added (a
        # sorted-index scheme re-homes every query on growth)
        slice_names = {
            n for n in qs
            if zlib.crc32(n.encode()) % n_slices == rnd % n_slices
        }
        if only:
            slice_names &= only
        only = slice_names
        print(
            f"rotate: round {rnd} slice {rnd % n_slices}/{n_slices} -> "
            f"{len(only)} of {len(qs)} queries"
        )
        if not only:
            # an empty selection must select NOTHING — falling through
            # with an empty (falsy) set would run the FULL registry
            # under a mode=rotate label (round-12 review)
            print("0 pass, 0 fail, 0 rows-only (empty rotate selection)")
            return 0

    n_pass = n_fail = n_noracle = 0
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            record[name] = {"status": "fail", "problems": [f"spark error: {e}"[:300]]}
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            rows = len(spark_pdf)
            print(f"OK*   {name}: rows-only ({rows} rows, no oracle) [{time.time()-t0:.1f}s]")
            record[name] = {"status": "rows_only", "rows": rows, "sec": round(time.time() - t0, 2)}
            n_noracle += 1
            continue
        try:
            duck_pdf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            record[name] = {"status": "fail", "problems": [f"duckdb error: {e}"[:300]]}
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            record[name] = {"status": "fail", "problems": [p[:300] for p in problems]}
        else:
            n_pass += 1
            print(f"OK    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
            record[name] = {
                "status": "pass",
                "rows": len(spark_pdf),
                "sec": round(time.time() - t0, 2),
            }

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    if json_out is not None:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "mode": (
                        "rotate"
                        if rotate is not None
                        else ("subset" if only else "full")
                    ),
                    **(
                        {
                            "rotate": {
                                "round": rotate[0],
                                "slice": rotate[0] % rotate[1],
                                "n_slices": rotate[1],
                            }
                        }
                        if rotate is not None
                        else {}
                    ),
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_noracle,
                    "queries": record,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
