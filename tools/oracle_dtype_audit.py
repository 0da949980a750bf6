#!/usr/bin/env python
"""Audit oracle SQL for DuckDB dtype hazards under a pandas fetch path.

The round-6 driver exposed a divergence class: DuckDB's SUM(BIGINT)
returns HUGEINT, which `fetchall()` yields as Python int (matches Spark's
bigint) but `.df()` yields as float64 ("3.0" vs "3" -> hash mismatch).
Whether the comparator sees int or float therefore depends on the fetch
path / DuckDB version, not the data. This tool runs every oracle via
`.df()` at sf0.001 and flags any column whose pandas dtype is floating
while the corresponding Spark result column is integral (or vice versa).
Any hit is a latent driver-side hash failure; fix by pinning the oracle
column with an outer CAST (AS BIGINT / AS DOUBLE).

Usage: python tools/oracle_dtype_audit.py [sf_dir]
"""
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

INT_SPARK = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
FLOAT_SPARK = {"float", "double"}


def main():
    import __spark_entry__ as ent
    from oanda_stream_processor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    queries = ent.queries()
    oracles = ent.oracle_sql()
    hazards = []
    infos = []
    for name, sql in sorted(oracles.items()):
        try:
            df = con.execute(sql).df()
            sdf = queries[name](spark, sf_dir)
            stypes = {f.name: f.dataType.simpleString()
                      for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            hazards.append((name, "<error>", f"{type(e).__name__}: {e}"))
            continue
        try:
            atypes = {f.name: str(f.type)
                      for f in con.execute(sql).arrow().schema}
        except Exception:  # noqa: BLE001
            atypes = {}
        for col in df.columns:
            pk = str(df[col].dtype)
            sk = stypes.get(col)
            at = atypes.get(col, "")
            if sk is None:
                hazards.append((name, col, f"oracle-only column (pandas {pk})"))
                continue
            p_float = pk.startswith("float")
            if p_float and sk in INT_SPARK:
                # the REAL hazard is an integral Spark column whose
                # DuckDB DECLARED type is non-integral (HUGEINT/DECIMAL
                # -> fetch-path-dependent rendering, the q149 class);
                # a NULL-containing int64 merely prints as float64 in
                # pandas and every fetch path agrees on its values
                if "decimal" in at or "hugeint" in at.lower() or not at:
                    hazards.append(
                        (name, col, f"duckdb {at or '?'} vs spark {sk} "
                                    "(HUGEINT/float fetch hazard)"))
                else:
                    infos.append(
                        (name, col, f"nullable {at} renders float64 in "
                                    "pandas (values agree on all paths)"))
            elif pk.startswith(("int", "uint")) and sk in FLOAT_SPARK:
                hazards.append(
                    (name, col, f"pandas {pk} vs spark {sk}"))
    for name, col, why in infos:
        print(f"info   {name} :: {col} :: {why}")
    for name, col, why in hazards:
        print(f"HAZARD {name} :: {col} :: {why}")
    print(f"{len(hazards)} hazards ({len(infos)} nullable-int notes) "
          f"across {len(oracles)} oracles")
    return 1 if hazards else 0


if __name__ == "__main__":
    raise SystemExit(main())
