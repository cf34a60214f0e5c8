"""Local harness mirroring the driver's correctness gate: run every
queries() entry on Spark and its oracle on DuckDB, compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def scan_dtypes(sf_dir: str) -> int:
    """Static oracle-dtype gate (no Spark, no query execution): bind every
    oracle against the sf_dir views and flag final columns whose DuckDB type
    would render differently from Spark's under the driver's format-sensitive
    hasher. HUGEINT (what an uncast SUM(BIGINT) returns) becomes float64 in
    pandas — `1234.0` vs Spark's `1234` — which is exactly the class that
    cost q92/q95 their round-3 driver rows (VERDICT r3 §wrong.1). DECIMAL
    with scale 0 is the same landmine; scaled DECIMALs (e.g. the q79/q194
    quantile columns) render identically on both sides and are allowed."""
    from opentelemetry_collector_spark.plans.queries import ORACLES

    con = duckdb.connect()
    con.sql("SET memory_limit='8GB'")
    con.sql("SET threads=4")
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass
    flagged = 0
    for name, sql in ORACLES.items():
        try:
            rel = con.sql(sql)
            cols, types = rel.columns, [str(t) for t in rel.types]
        except Exception as e:
            print(f"SKIP {name}: cannot bind ({str(e)[:120]})")
            continue
        bad = [
            f"{c}:{t}"
            for c, t in zip(cols, types)
            if t in ("HUGEINT", "UHUGEINT")
            or (t.startswith("DECIMAL") and t.rstrip(")").rsplit(",", 1)[-1] == "0")
        ]
        if bad:
            print(f"FLAG {name}: uncast integer aggregate -> {bad} "
                  f"(add CAST(... AS BIGINT))")
            flagged += 1
    print(f"dtype scan: {len(ORACLES)} oracles, {flagged} flagged")
    return flagged


def main(sf_dir: str, only: list[str] | None = None) -> int:
    from opentelemetry_collector_spark.plans.queries import ORACLES, QUERIES
    from opentelemetry_collector_spark.session import build_session

    spark = build_session(master="local[8]")
    con = duckdb.connect()
    # our oracles are small; an unbounded duckdb (default 80% of RAM, 32
    # threads) occasionally hits transient host-level memory squeezes on
    # this VM (observed: 32KB bad_alloc with >100GB nominally free).
    # Bounding it keeps the gate stable under neighbor pressure.
    con.sql("SET memory_limit='8GB'")
    con.sql("SET threads=4")
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            spk = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(spk)} rows)")
            continue
        try:
            dk = con.sql(ORACLES[name]).df()
        except Exception as e:
            # transient host-level EAGAIN (thread spawn / tiny malloc fails
            # with >100GB nominally free on this VM): pause and retry once
            # on a FRESH connection before declaring a failure
            import time

            time.sleep(3)
            try:
                con2 = duckdb.connect()
                con2.sql("SET memory_limit='8GB'")
                con2.sql("SET threads=4")
                for t in TABLES:
                    try:
                        con2.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
                    except Exception:
                        pass
                dk = con2.sql(ORACLES[name]).df()
                con = con2
            except Exception:
                print(f"FAIL {name}: duckdb error {e}")
                failures += 1
                continue
        try:
            a, b = normalize(spk), normalize(dk)
            if list(a.columns) != list(b.columns):
                raise AssertionError(f"columns {list(a.columns)} vs {list(b.columns)}")
            if len(a) != len(b):
                raise AssertionError(f"rows {len(a)} vs {len(b)}")
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            # the driver's value hash is FORMAT-sensitive (int64 1234 vs
            # float64 1234.0 hash differently even when values match), so an
            # int/float dtype split between the two sides is a failure here
            # even though assert_frame_equal(check_dtype=False) accepts it.
            mixed = [
                c
                for c in a.columns
                if pd.api.types.is_integer_dtype(a[c])
                != pd.api.types.is_integer_dtype(b[c])
            ]
            if mixed:
                raise AssertionError(
                    f"int/float dtype split (driver hash would differ): "
                    f"{[(c, str(a[c].dtype), str(b[c].dtype)) for c in mixed]}"
                )
            print(f"ok   {name}: {len(a)} rows match")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:400]}")
            failures += 1
    spark.stop()
    return failures


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--dtypes"]
    sf = argv[0] if argv else "/root/testdata/sf0.001"
    if "--dtypes" in sys.argv:
        sys.exit(scan_dtypes(sf))
    sys.exit(main(sf, argv[1:] or None))
