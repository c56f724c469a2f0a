"""Simulate the round driver: entry() smoke + every oracle compare at sf0.01.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
       python scripts/driver_sim.py --window [sf_dir] [query ...]

``--window`` rehearses the REAL driver's conditions: the named queries run
in the GIVEN order (not sorted) in one session with NO release_pins()
between them — exactly how the round driver sweeps its 50-slot budget —
so leaf/session-memo interactions between adjacent window queries are
exercised before the window is committed.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as e  # noqa: E402

from bigdataanalytics_textsummarization_spark.functions import release_pins  # noqa: E402
from bigdataanalytics_textsummarization_spark.io import TABLES  # noqa: E402
from bigdataanalytics_textsummarization_spark.session import get_session  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    window_mode = "--window" in args
    if window_mode:
        args.remove("--window")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:]
    only = set(names)
    spark = get_session(app="driver-sim", cpus=4, shuffle_partitions=8)
    print("entry rows:", len(e.entry(spark).collect()))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = e.queries(), e.oracle_sql()
    failed = []
    times: dict[str, float] = {}
    order = names if window_mode else sorted(qs)
    for name in order:
        if only and name not in only:
            continue
        t0 = time.monotonic()
        # golden-snapshot oracles are pinned to the driver's gate scale
        golden_off_scale = (
            name in osql
            and "tests/golden/sf0.01" in osql[name]
            and not sf_dir.rstrip("/").endswith("sf0.01")
        )
        if name not in osql or golden_off_scale:
            n = qs[name](spark, sf_dir).count()
            if not window_mode:  # the REAL driver never releases mid-window
                release_pins()
            times[name] = time.monotonic() - t0
            kind = "golden@sf0.01, rows-only here" if golden_off_scale else "rows-only"
            print(f"{name}: {kind}, {n} rows  [{times[name]:.2f}s]")
            continue
        g = qs[name](spark, sf_dir).toPandas()
        if not window_mode:  # the REAL driver never releases mid-window
            release_pins()
        w = con.sql(osql[name]).df()
        g = g.reindex(sorted(g.columns), axis=1)
        w = w.reindex(sorted(w.columns), axis=1)
        if list(g.columns) != list(w.columns) or g.shape != w.shape:
            print(f"{name}: MISMATCH shape/cols {g.shape}{list(g.columns)} vs {w.shape}{list(w.columns)}")
            failed.append(name)
            continue
        g = g.sort_values(by=list(g.columns), kind="mergesort").reset_index(drop=True)
        w = w.sort_values(by=list(w.columns), kind="mergesort").reset_index(drop=True)
        ok = True
        dtype_bad = []
        for c in g.columns:
            # The real driver hashes TYPED values: a DuckDB HUGEINT column red-flags
            # against Spark BIGINT even when every value is equal (cost a red row in
            # rounds 1 AND 2). Mirror that: dtypes must agree exactly — except
            # datetime64 resolution (Spark toPandas gives ns, DuckDB us; the real
            # driver normalizes: these queries were green in r1/r2).
            if g[c].dtype != w[c].dtype and not (
                g[c].dtype.kind == "M" and w[c].dtype.kind == "M"
            ):
                dtype_bad.append(f"{c}: spark={g[c].dtype} oracle={w[c].dtype}")
                ok = False
            if g[c].dtype.kind == "f" or w[c].dtype.kind == "f":
                # The real driver hashes TYPED values, so floats must be
                # BIT-identical — a tolerance compare structurally cannot
                # catch the -0.0/+0.0 class (embedding_cov shipped red in
                # r5 AND r6 while this sim said 165/165 green).  Compare
                # the raw float64 bit patterns; NaNs must be bit-equal too.
                import numpy as np

                gb = g[c].astype("float64").to_numpy().view("int64")
                wb = w[c].astype("float64").to_numpy().view("int64")
                if not (gb == wb).all():
                    ok = False
                    bad = int((gb != wb).argmax())
                    dtype_bad.append(
                        f"{c}: first bit-mismatch row {bad}: "
                        f"spark={g[c].iloc[bad]!r} oracle={w[c].iloc[bad]!r}"
                    )
                # convention #4 guard: neither engine may emit -0.0
                NEG_ZERO = np.array([-0.0]).view("int64")[0]
                for side, bits in (("spark", gb), ("oracle", wb)):
                    if (bits == NEG_ZERO).any():
                        ok = False
                        dtype_bad.append(f"{c}: {side} emits -0.0")
            elif not (g[c].astype(str).values == w[c].astype(str).values).all():
                ok = False
        times[name] = time.monotonic() - t0
        verdict = "MATCH" if ok else ("MISMATCH " + "; ".join(dtype_bad) if dtype_bad else "VALUE MISMATCH")
        print(f"{name}: {verdict} {len(g)} rows  [{times[name]:.2f}s]")
        if not ok:
            failed.append(name)
    spark.stop()
    print("slowest:", sorted(times.items(), key=lambda kv: -kv[1])[:15])
    print(f"total query time: {sum(times.values()):.1f}s over {len(times)} queries")
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
