"""SQL-string front-end for the reference's literal DML / time-travel
statements.

The workshop's user-facing language is SQL text:

- ``MERGE INTO ... WHEN MATCHED THEN UPDATE SET ... WHEN NOT MATCHED
  THEN INSERT VALUES (...)`` (/root/reference/sql/update_iceberg_v2_examples.sql:14-18)
- ``DELETE FROM <tbl> WHERE <cond>`` (/root/reference/pyspark-iceberg/interoperability.md:128)
- ``INSERT INTO <tbl> VALUES (...)`` (/root/reference/README.md:100-103)
- ``SELECT * FROM <tbl> FOR SYSTEM_TIME AS OF "<ts>"`` (/root/reference/README.md:110-117)
- ``ALTER TABLE <tbl> EXECUTE rollback("<snapshot-id>")`` (/root/reference/README.md:120-123)

``IceSqlSession`` accepts those statements verbatim and routes them to
the icetbl API (``merge_into``/``delete_where``/``insert_values``/
``read(as_of...)``/``rollback``); any other statement falls through to
``spark.sql`` with registered table names rewritten to temp views of
the table's current snapshot. A workshop user can paste the exercises
unchanged.

Scale notes: the front-end only *dispatches* — every statement lands
on the same CoW/MoR DataFrame plans the Python API uses (file-granular
rewrites, broadcast-where-small), so the 100 TB posture is inherited,
not reimplemented. The MERGE reduction computes the matched (inner
join) and unmatched (left-anti) source projections once each — two
joins against the target keyed on the ON columns, exactly what a
native MERGE plans.
"""

from __future__ import annotations

import re
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from iceberg_workshop_spark.icetbl import IceTable
from iceberg_workshop_spark.registry import register

_MERGE_RE = re.compile(
    r"MERGE\s+INTO\s+(?P<target>[\w.]+)(?:\s+AS\s+(?P<talias>\w+))?\s+"
    r"USING\s+\((?P<src>.+?)\)\s+(?:AS\s+)?(?P<salias>\w+)\s+"
    r"ON\s+(?P<on>.+?)\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(?P<set>.+?)\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+VALUES\s*\((?P<vals>.+)\)$",
    re.I | re.S,
)
_DELETE_RE = re.compile(
    r"DELETE\s+FROM\s+(?P<target>[\w.]+)\s+WHERE\s+(?P<cond>.+)$", re.I | re.S
)
_INSERT_VALUES_RE = re.compile(
    r"INSERT\s+INTO\s+(?P<target>[\w.]+)\s+VALUES\s+(?P<vals>.+)$", re.I | re.S
)
_ROLLBACK_RE = re.compile(
    r"ALTER\s+TABLE\s+(?P<target>[\w.]+)\s+EXECUTE\s+rollback\s*\(\s*"
    r"(?P<q>[\"']?)(?P<arg>.+?)(?P=q)\s*\)$",
    re.I | re.S,
)
_TRUNCATE_RE = re.compile(r"TRUNCATE\s+TABLE\s+(?P<target>[\w.]+)$", re.I)
_TT_RE = re.compile(
    r"(?P<name>[\w.]+)\s+FOR\s+(?P<kind>SYSTEM_TIME|SYSTEM_VERSION)\s+AS\s+OF\s+"
    r"(?P<q>[\"'])(?P<lit>.+?)(?P=q)",
    re.I,
)


def _split_top_commas(text: str) -> list[str]:
    """Split on commas not nested in parens/quotes."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _iso_to_ms(lit: str) -> int:
    dt = datetime.fromisoformat(lit)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def _view_name(name: str) -> str:
    return name.replace(".", "__")


class IceSqlSession:
    """Accepts the workshop's SQL text against registered IceTables."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.tables: dict[str, IceTable] = {}
        self.views: dict[str, DataFrame] = {}

    def register_table(self, name: str, tbl: IceTable) -> None:
        self.tables[name] = tbl

    def register_view(self, name: str, df: DataFrame) -> None:
        self.views[name] = df

    # -- dispatch ------------------------------------------------------
    def sql(self, text: str) -> DataFrame | None:
        s = text.strip().rstrip(";").strip()
        if m := _MERGE_RE.match(s):
            return self._merge(m)
        if m := _DELETE_RE.match(s):
            tbl = self._table(m["target"])
            tbl.delete_where(self._rewrite(m["cond"]))
            return None
        if m := _INSERT_VALUES_RE.match(s):
            return self._insert_values(m)
        if m := _ROLLBACK_RE.match(s):
            return self._rollback(m)
        if m := _TRUNCATE_RE.match(s):
            self._table(m["target"]).truncate()
            return None
        return self._select(s)

    def _table(self, name: str) -> IceTable:
        if name not in self.tables:
            raise KeyError(f"not a registered ice table: {name}")
        return self.tables[name]

    def _rewrite(self, fragment: str) -> str:
        """Swap registered table/view names for temp views (tables get
        a view over their current snapshot)."""
        for name in sorted({**self.views, **dict.fromkeys(self.tables)}, key=len, reverse=True):
            pat = r"(?<![\w.])" + re.escape(name) + r"(?![\w.])"
            if not re.search(pat, fragment):
                continue
            vname = _view_name(name)
            df = self.views[name] if name in self.views else self.tables[name].read()
            df.createOrReplaceTempView(vname)
            fragment = re.sub(pat, vname, fragment)
        return fragment

    # -- statement handlers -------------------------------------------
    def _merge(self, m: re.Match) -> None:
        tbl = self._table(m["target"])
        talias = m["talias"] or _view_name(m["target"])
        salias = m["salias"]
        tbl.read().createOrReplaceTempView(talias)
        self.spark.sql(self._rewrite(m["src"])).createOrReplaceTempView(salias)

        on_pairs: list[tuple[str, str]] = []  # (target_col, source_col)
        for conj in re.split(r"\s+AND\s+", m["on"], flags=re.I):
            left, right = (x.strip() for x in conj.split("="))

            def split_side(x: str) -> tuple[str | None, str]:
                return tuple(x.rsplit(".", 1)) if "." in x else (None, x)  # type: ignore[return-value]

            lq, lc = split_side(left)
            rq, rc = split_side(right)
            if lq == salias:
                on_pairs.append((rc, lc))
            elif rq == salias:
                on_pairs.append((lc, rc))
            else:  # unqualified side defaults to target (MERGE scoping)
                on_pairs.append((lc, rc))
        sets: dict[str, str] = {}
        for assign in _split_top_commas(m["set"]):
            k, v = assign.split("=", 1)
            sets[k.strip().rsplit(".", 1)[-1]] = v.strip()

        cols = tbl._column_names()
        on_sql = " AND ".join(f"{talias}.{t} = {salias}.{s}" for t, s in on_pairs)
        upd_proj = ", ".join(f"{sets.get(c, f'{talias}.{c}')} AS {c}" for c in cols)
        upd = self.spark.sql(
            f"SELECT {upd_proj} FROM {talias} JOIN {salias} ON {on_sql}"
        )
        vals = _split_top_commas(m["vals"])
        ins_proj = ", ".join(f"{v} AS {c}" for c, v in zip(cols, vals))
        ins = self.spark.sql(
            f"SELECT {ins_proj} FROM {salias} LEFT ANTI JOIN {talias} ON {on_sql}"
        )
        tbl.merge_into(upd.unionByName(ins), on=[t for t, _ in on_pairs])
        return None

    def _insert_values(self, m: re.Match) -> None:
        tbl = self._table(m["target"])
        rows_df = self.spark.sql(f"SELECT * FROM VALUES {m['vals']}")
        cols = tbl._column_names()
        tbl.append(rows_df.toDF(*cols))
        return None

    def _rollback(self, m: re.Match) -> None:
        tbl = self._table(m["target"])
        arg = m["arg"].strip()
        if re.fullmatch(r"\d+", arg):
            tbl.rollback(int(arg))
        else:  # timestamp form: roll back to the snapshot current then
            snap = tbl._resolve_snapshot(as_of_timestamp_ms=_iso_to_ms(arg))
            if snap is None:
                raise ValueError(f"no snapshot at or before {arg}")
            tbl.rollback(snap["snapshot_id"])
        return None

    def _select(self, s: str) -> DataFrame:
        def tt_repl(m: re.Match) -> str:
            tbl = self._table(m["name"])
            if m["kind"].upper() == "SYSTEM_TIME":
                df = tbl.read(as_of_timestamp_ms=_iso_to_ms(m["lit"]))
            else:
                df = tbl.read(snapshot_id=int(m["lit"]))
            vname = _view_name(m["name"]) + "__tt"
            df.createOrReplaceTempView(vname)
            return vname

        s = _TT_RE.sub(tt_repl, s)
        return self.spark.sql(self._rewrite(s))


# ---------------------------------------------------------------- queries

_AIRLINES = [
    ("02Q", "Titan Airways"),
    ("04Q", "Tradewind Aviation"),
    ("AA", "American Airlines"),
    ("DL", "Delta Air Lines"),
]


def _airlines_session(
    spark: SparkSession, sf_dir: str, name: str, table_name: str
) -> tuple[IceSqlSession, IceTable]:
    """A fresh airlines IceTable + staging view, per the workshop's
    CREATE ... AS SELECT * FROM staging.airlines_parquet."""
    from iceberg_workshop_spark.plans.lifecycle import _fresh

    staging = spark.createDataFrame(_AIRLINES, "code string, description string")
    tbl = IceTable.create_as(spark, _fresh(sf_dir, name), staging)
    sess = IceSqlSession(spark)
    sess.register_table(table_name, tbl)
    sess.register_view("staging.airlines_parquet", staging)
    return sess, tbl


@register(
    "q_sql_merge_stmt",
    oracle="""
    SELECT * FROM (VALUES
      ('02Q', 'Titanic Trauma'),
      ('04Q', 'Tradewind Aviation'),
      ('AA', 'American Airlines'),
      ('DL', 'Delta Air Lines')
    ) AS t(code, description)
    ORDER BY code
    """,
)
def q_sql_merge_stmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The workshop's MERGE statement, text taken verbatim from
    /root/reference/sql/update_iceberg_v2_examples.sql:14-18, routed
    through IceSqlSession to merge_into's CoW upsert."""
    sess, tbl = _airlines_session(spark, sf_dir, "sql_merge", "updates_ice.airlines")
    sess.sql(
        """
        MERGE INTO updates_ice.airlines AS target
        USING (SELECT code, description FROM staging.airlines_parquet WHERE code = "02Q") AS source
        ON code = source.code
        WHEN MATCHED THEN UPDATE SET code=source.code, description="Titanic Trauma"
        WHEN NOT MATCHED THEN INSERT VALUES (source.code, "Titanic Trauma");
        """
    )
    return tbl.read().orderBy("code")


@register(
    "q_sql_delete_stmt",
    oracle="""
    SELECT n_nationkey AS c1, n_name AS c2 FROM nation
    WHERE n_nationkey <> 1 ORDER BY c1
    """,
)
def q_sql_delete_stmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM ... WHERE as SQL text — the statement of
    /root/reference/pyspark-iceberg/interoperability.md:128 verbatim,
    on a table with the same column name (c1)."""
    from iceberg_workshop_spark.plans.lifecycle import _fresh
    from iceberg_workshop_spark.sources.tables import load

    from pyspark.sql import functions as F

    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c1"), F.col("n_name").alias("c2")
    )
    tbl = IceTable.create_as(spark, _fresh(sf_dir, "sql_delete"), nation)
    sess = IceSqlSession(spark)
    sess.register_table("hive_cdp.mengel.ice", tbl)
    sess.sql("DELETE FROM hive_cdp.mengel.ice WHERE c1 = 1")
    return tbl.read().orderBy("c1")


@register(
    "q_sql_insert_time_travel_stmt",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), 'ABC', 'Real Fake Airlines')
    ) AS t(n_at_s1, code, description)
    """,
)
def q_sql_insert_time_travel_stmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README.md:100-117 exercise verbatim: INSERT INTO ... VALUES,
    then SELECT ... FOR SYSTEM_TIME AS OF the pre-insert snapshot (must
    see nothing) and a current-time SELECT (must see the row)."""
    from pyspark.sql import functions as F

    sess, tbl = _airlines_session(spark, sf_dir, "sql_tt", "iws_ice.airlines")
    s1_ms = tbl.meta.snapshot(tbl.meta.current_snapshot_id)["timestamp_ms"]
    time.sleep(0.01)  # snapshot timestamps are ms-granular
    sess.sql(
        """
        INSERT INTO iws_ice.airlines
        VALUES ("ABC", "Real Fake Airlines");
        """
    )
    ts = datetime.fromtimestamp(s1_ms / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    before = sess.sql(
        f"""
        SELECT * FROM iws_ice.airlines
        FOR SYSTEM_TIME AS OF "{ts}"
        WHERE code = "ABC";
        """
    )
    current = sess.sql(
        """
        SELECT * FROM iws_ice.airlines
        WHERE code = "ABC";
        """
    )
    n_before = before.agg(F.count(F.lit(1)).alias("n_at_s1"))
    return n_before.crossJoin(current)


@register(
    "q_sql_rollback_stmt",
    oracle="""
    SELECT * FROM (VALUES
      ('02Q', 'Titan Airways'),
      ('04Q', 'Tradewind Aviation'),
      ('AA', 'American Airlines'),
      ('DL', 'Delta Air Lines')
    ) AS t(code, description)
    ORDER BY code
    """,
)
def q_sql_rollback_stmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:120-127 verbatim: ALTER TABLE ... EXECUTE rollback to
    the pre-insert snapshot id; the fake airline must be gone."""
    sess, tbl = _airlines_session(spark, sf_dir, "sql_rollback", "iws_ice.airlines")
    s1 = tbl.meta.current_snapshot_id
    sess.sql('INSERT INTO iws_ice.airlines VALUES ("ABC", "Real Fake Airlines")')
    assert sess.sql('SELECT * FROM iws_ice.airlines WHERE code = "ABC"').count() == 1
    sess.sql(f'ALTER TABLE iws_ice.airlines EXECUTE rollback("{s1}")')
    return tbl.read().orderBy("code")
