"""Relational DAL: the reference Connector's query semantics
(ingestion/connector/pg_connect.py) re-expressed over DataFrames.

The reference builds SQL strings and ships them to Postgres; here the
same compositional surface (cols / where / order / limit / offset)
builds a Catalyst plan.  Parameterized predicates use Spark's
parameterized ``spark.sql`` (named params) — fixing the reference's
f-string injection hazard (SURVEY.md §4.3).

Bug-for-bug fidelity is deliberately NOT provided for the reference's
always-true conditionals and last-k retrieve quirk (pg_connect.py:224,
:318, :286) — see SURVEY.md §4.3; the sane semantics are implemented
and the quirks documented here.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class DataAccess:
    """select/insert/update/delete over named DataFrames (catalog
    tables or registered views) with the reference Connector's
    signature shapes (pg_connect.py:269-395)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- query composition (R1-R7, pg_connect.py:164-183) ---------------
    def select(
        self,
        df: DataFrame,
        cols: str | Sequence[str] = "all",
        where: tuple[str, dict[str, Any]] | Column | None = None,
        order: tuple[str, str] | Sequence[tuple[str, str]] | None = None,
        limit: int | None = None,
        offset: int | None = None,
    ) -> DataFrame:
        out = df
        # R2: parameterized predicate (`where=("id = :id", {"id": 1})`)
        if isinstance(where, Column):
            out = out.filter(where)
        elif where is not None:
            template, params = where
            view = f"_dal_{abs(hash(template)) % 10**8}"
            out.createOrReplaceTempView(view)
            # Spark binds the values server-side — they never enter the
            # query text (fixes the reference's f-string injection, §4.3)
            out = self.spark.sql(
                f"SELECT * FROM {view} WHERE {template}",  # noqa: S608
                args=params,
            )
        # R1: projection — "all"/"*" → everything (pg_connect.py:274-279)
        if cols not in ("all", "*"):
            out = out.select(*([cols] if isinstance(cols, str) else list(cols)))
        # R3: ORDER BY field dir (single or multi key)
        if order is not None:
            keys = [order] if isinstance(order[0], str) else list(order)
            out = out.orderBy(
                *[
                    F.col(f).desc() if d.upper() == "DESC" else F.col(f).asc()
                    for f, d in keys
                ]
            )
        # R5 then R4: OFFSET before LIMIT (SQL pagination semantics)
        if offset:
            out = out.offset(offset)
        if limit is not None:
            out = out.limit(limit)
        return out

    def query(
        self,
        df: DataFrame,
        template: str,
        params: dict[str, Any] | None = None,
        view_name: str = "t",
    ) -> DataFrame:
        """R8 raw-SQL execution with named parameters:
        ``query(df, "SELECT * FROM t WHERE id = :id", {"id": 1})``."""
        df.createOrReplaceTempView(view_name)
        return self.spark.sql(template, args=params or {})

    # -- row-shape accessors (reference retrieve/retrieve_dict) ---------
    def rows(self, df: DataFrame) -> list[tuple]:
        """Tuple rows (pg_connect.py:269-286 — without the last-k
        quirk at :286)."""
        return [tuple(r) for r in df.collect()]

    def dict_rows(self, df: DataFrame) -> list[dict]:
        """Dict rows (pg_connect.py:288-305)."""
        return [r.asDict() for r in df.collect()]

    def to_csv(self, df: DataFrame, path: str) -> None:
        """CSV export (reference COPY-based retrieve_csv,
        pg_connect.py:307-328) as a distributed write."""
        df.write.mode("overwrite").csv(path, header=True)
