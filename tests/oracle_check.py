"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle over the same parquet dir, compare row count,
column names, and an order-insensitive value multiset (with float
tolerance so legitimate last-ulp differences don't flag)."""

from __future__ import annotations

import math

import duckdb

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con.execute(sql).df()


def _canon(value):
    # Everything canonicalizes to a STRING so row tuples always have a
    # total order: a full-outer join yields NaN in two different
    # columns, and sorting tuples that mix float and "NaN" (or None)
    # in the same position raises TypeError. Floats round first, so
    # last-ulp engine differences still collapse to the same string.
    if value is None:
        # sentinel no str(value) can produce (r5 ADVICE: "None" would
        # make a NULL collide with the literal string 'None')
        return "\x00NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # NO -0.0 collapse: the driver's hash distinguishes signed
        # zeros, and a mirror more forgiving than the driver cannot
        # catch that class (r10 verdict: heaps_law_fit went driver-red
        # while the mirror stayed green precisely because an r5-era
        # collapse lived here). Queries must emit normalized zeros
        # themselves (round-then-+0.0 at final projection).
        return str(round(value, 6))
    return str(value)


def compare(spark_df, oracle_df) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_df.columns)
    if s_cols != o_cols:
        return [f"columns differ: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_df)}")

    def rows(pdf):
        return sorted(
            tuple(_canon(v) for v in row)
            for row in pdf[s_cols].itertuples(index=False, name=None)
        )

    s_rows, o_rows = rows(spark_pdf), rows(oracle_df)
    if s_rows != o_rows:
        diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        problems.append(
            f"values differ ({len(diff)} mismatched of {len(s_rows)}): "
            f"first few {diff[:3]}"
        )
    return problems
