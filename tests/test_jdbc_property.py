"""Property tests for the JDBC upsert sink's SQL-text rendering — the
renderer's whole correctness claim is "a real ANSI parser reconstructs
exactly the Python value", so that is what is checked: every rendered
literal (and whole multi-row INSERT statements) round-trips through
DuckDB, an ANSI-conforming engine with Postgres-style
standard_conforming_strings semantics (backslashes literal, quotes
doubled) — the exact dialect contract the module documents."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis3_spark.sinks.jdbc import (
    _delete_statements,
    _insert_statements,
    _sql_literal,
)

_TEXT = st.text(
    # printable-ish unicode INCLUDING quotes and backslashes (the ANSI
    # contract says backslashes are literal — prove it on a real parser)
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=60,
)
_SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    _TEXT,
    st.dates(min_value=dt.date(1, 1, 1)),
    st.datetimes(min_value=dt.datetime(1, 1, 1)),
    st.decimals(allow_nan=False, allow_infinity=False, places=4,
                min_value=Decimal("-1e18"), max_value=Decimal("1e18")),
)


@settings(max_examples=300, deadline=None)
@given(v=_SCALARS)
def test_literal_round_trips_through_an_ansi_parser(v):
    got = duckdb.sql(f"SELECT {_sql_literal(v)} AS v").fetchone()[0]
    if v is None:
        assert got is None
    elif isinstance(v, bool):
        assert got is v
    elif isinstance(v, float):
        # DuckDB types a bare decimal-form literal as DECIMAL; the value
        # must still be float-exact (shortest-repr guarantees
        # float(repr(v)) == v; the typed-column INSERT test below is the
        # real-world float path)
        assert float(got) == v
    elif isinstance(v, Decimal):
        assert Decimal(str(got)) == v
    elif isinstance(v, dt.datetime):
        assert got == v
    elif isinstance(v, dt.date):
        assert got == v
    else:  # str — quotes doubled, backslashes LITERAL (ANSI)
        assert got == v


@settings(max_examples=50, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), _TEXT, st.floats(
            allow_nan=False, allow_infinity=False, width=64
        )),
        min_size=1,
        max_size=12,
    ),
    chunk=st.integers(1, 5),
)
def test_insert_statements_reconstruct_every_row(rows, chunk):
    """Executing the rendered INSERTs against a real table yields exactly
    the input rows — chunk boundaries lose and duplicate nothing."""
    con = duckdb.connect()
    con.sql("CREATE TABLE t (id BIGINT, s VARCHAR, x DOUBLE)")
    for sql in _insert_statements("t", ["id", "s", "x"], rows, chunk=chunk):
        con.sql(sql)
    got = sorted(map(tuple, con.sql("SELECT * FROM t").fetchall()))
    assert got == sorted(rows)


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(
        st.one_of(st.integers(0, 100), st.sampled_from(["a", "b'c", "d"])),
        min_size=1, max_size=15, unique=True,
    ),
    chunk=st.integers(1, 4),
)
def test_delete_statements_remove_exactly_the_key_set(keys, chunk):
    con = duckdb.connect()
    con.sql("CREATE TABLE t (id VARCHAR)")
    universe = [str(k) for k in keys] + ["survivor-1", "survivor-2"]
    for u in universe:
        con.sql(f"INSERT INTO t VALUES ({_sql_literal(u)})")
    for sql in _delete_statements("t", "id", [str(k) for k in keys],
                                  chunk=chunk):
        con.sql(sql)
    left = sorted(r[0] for r in con.sql("SELECT id FROM t").fetchall())
    assert left == ["survivor-1", "survivor-2"]


def test_nonfinite_floats_coerce_in_float_context():
    """The quoted 'NaN'/'Infinity' literals the renderer emits for
    non-finite floats coerce correctly in a float column context (the
    documented Postgres behavior, reproduced by DuckDB)."""
    con = duckdb.connect()
    con.sql("CREATE TABLE t (x DOUBLE)")
    for v in (float("nan"), float("inf"), float("-inf")):
        con.sql(f"INSERT INTO t VALUES ({_sql_literal(v)})")
    got = [r[0] for r in con.sql("SELECT x FROM t").fetchall()]
    assert math.isnan(got[0]) and got[1] == float("inf")
    assert got[2] == float("-inf")


def test_renderer_edge_forms():
    """Review r11-4th: (a) scientific-form Decimals render PLAIN (an
    exponent literal is typed approximate-numeric and silently rounds
    exact decimals past 17 digits); (b) sub-1000 years render 4-digit
    (strftime %Y does not zero-pad on Linux and Postgres reinterprets
    short leading fields via DateStyle)."""
    v = Decimal("1.2345678901234567890123E+25")
    lit = _sql_literal(v)
    assert "e" not in lit.lower()
    got = duckdb.sql(f"SELECT CAST({lit} AS DECIMAL(38, 4)) AS v").fetchone()[0]
    assert Decimal(str(got)) == v
    assert _sql_literal(dt.datetime(1, 2, 3, 4, 5, 6, 7)) == (
        "TIMESTAMP '0001-02-03 04:05:06.000007'"
    )
    assert _sql_literal(dt.date(9, 9, 9)) == "DATE '0009-09-09'"


def test_renderer_refusals_are_closed_set():
    with pytest.raises(TypeError):
        _sql_literal(b"bytes")
    with pytest.raises(TypeError):
        _sql_literal(["list"])
    with pytest.raises(TypeError, match="timezone-aware"):
        _sql_literal(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc))


# --------------------------------------------------------------------------
# Per-partition ON CONFLICT tier (round 12)
# --------------------------------------------------------------------------


def test_upsert_statements_render_and_roundtrip_duckdb():
    """The ON CONFLICT statement applies insert-then-update semantics on a
    real ANSI engine with a primary key — and re-applying the SAME
    statements is a no-op (the row-level idempotence the task-retry
    contract rests on)."""
    from kinesis3_spark.sinks.jdbc import _upsert_statements

    con = duckdb.connect()
    con.sql("CREATE TABLE t (id BIGINT PRIMARY KEY, v VARCHAR, o BIGINT)")
    first = [(1, "a", 1), (2, "b", 1)]
    for sql in _upsert_statements("t", ["id", "v", "o"], "id", first):
        con.sql(sql)
    second = [(2, "B", 2), (3, "c", 2)]
    stmts = _upsert_statements("t", ["id", "v", "o"], "id", second, chunk=1)
    assert len(stmts) == 2 and all("ON CONFLICT (id) DO UPDATE" in s for s in stmts)
    for sql in stmts:
        con.sql(sql)
    for sql in stmts:  # the retry
        con.sql(sql)
    got = sorted(map(tuple, con.sql("SELECT * FROM t").fetchall()))
    assert got == [(1, "a", 1), (2, "B", 2), (3, "c", 2)]


def test_upsert_statements_key_only_degrades_to_do_nothing():
    from kinesis3_spark.sinks.jdbc import _upsert_statements

    (sql,) = _upsert_statements("t", ["id"], "id", [(1,), (2,)])
    assert sql.endswith("ON CONFLICT (id) DO NOTHING")


def _mk_rows(spark, data):
    return spark.createDataFrame(data, "id long, v string, o long").collect()


def test_partition_writer_null_and_duplicate_key_contracts(spark, tmp_path):
    from kinesis3_spark.sinks.jdbc import partition_upsert_writer

    def factory():
        raise AssertionError("no connection may open on refused input")

    w = partition_upsert_writer(factory, "t", key="id")
    with pytest.raises(ValueError, match="NULL in key column"):
        w(iter(_mk_rows(spark, [(None, "x", 1)])))
    with pytest.raises(ValueError, match="duplicate key"):
        w(iter(_mk_rows(spark, [(1, "x", 1), (1, "y", 2)])))
    # with order_col the duplicate resolves: max(o) wins deterministically
    import sqlite3

    db = str(tmp_path / "p.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT, o INTEGER)")
    con.commit()
    con.close()

    def sqlite_factory():
        import sqlite3 as _s

        return _s.connect(db, timeout=60)

    w2 = partition_upsert_writer(sqlite_factory, "t", key="id", order_col="o")
    rows = _mk_rows(spark, [(1, "old", 1), (1, "new", 5), (2, "b", 1)])
    w2(iter(rows))
    w2(iter(rows))  # task retry: identical row-level state
    con = sqlite3.connect(db)
    got = sorted(con.execute("SELECT id, v, o FROM t").fetchall())
    con.close()
    assert got == [(1, "new", 5), (2, "b", 1)]


def test_partition_upsert_batch_writer_e2e_distributed(spark, tmp_path):
    """The foreachBatch wrapper end-to-end on real executors: repartition
    by key, per-task connections against one database file, replayed
    batch converges (row-level idempotence, no global transaction)."""
    import sqlite3

    from kinesis3_spark.sinks.jdbc import jdbc_partition_upsert_batch_writer

    db = str(tmp_path / "e2e.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT, o INTEGER)")
    con.commit()
    con.close()

    def factory():
        import sqlite3 as _s

        return _s.connect(db, timeout=120)

    wb = jdbc_partition_upsert_batch_writer(factory, "t", key="id", order_col="o")
    df1 = spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(50)], "id long, v string, o long"
    )
    wb(df1, 0)
    wb(df1, 0)  # replayed micro-batch
    df2 = spark.createDataFrame(
        [(i, f"w{i}", 2) for i in range(25, 75)], "id long, v string, o long"
    )
    wb(df2, 1)
    con = sqlite3.connect(db)
    got = dict(con.execute("SELECT id, v FROM t").fetchall())
    con.close()
    assert len(got) == 75
    assert got[0] == "v0" and got[30] == "w30" and got[74] == "w74"


def test_partition_writer_order_tie_contracts(spark, tmp_path):
    """Equal (key, order_col) with IDENTICAL payloads is a benign replay
    (winner irrelevant — deduped silently); DIFFERING payloads under one
    (key, order) have no deterministic winner and are refused, because a
    shuffle-order-dependent pick would let a task retry apply different
    state than the original attempt."""
    import sqlite3

    from kinesis3_spark.sinks.jdbc import partition_upsert_writer

    db = str(tmp_path / "tie.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT, o INTEGER)")
    con.commit()
    con.close()

    def factory():
        import sqlite3 as _s

        return _s.connect(db, timeout=60)

    w = partition_upsert_writer(factory, "t", key="id", order_col="o")
    # identical duplicate rows: benign replay, applies once
    w(iter(_mk_rows(spark, [(1, "same", 5), (1, "same", 5)])))
    con = sqlite3.connect(db)
    assert con.execute("SELECT v FROM t WHERE id = 1").fetchone() == ("same",)
    con.close()
    # differing payloads at the same order value: refused loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="deterministic winner"):
        w(iter(_mk_rows(spark, [(2, "a", 5), (2, "b", 5)])))


def test_partition_writer_null_order_ties(spark, tmp_path):
    """NULL order loses to any real order; both-NULL duplicates follow
    the tie rule (identical deduped, differing refused)."""
    import sqlite3

    import pytest as _pytest

    from kinesis3_spark.sinks.jdbc import partition_upsert_writer

    db = str(tmp_path / "nulltie.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT, o INTEGER)")
    con.commit()
    con.close()

    def factory():
        import sqlite3 as _s

        return _s.connect(db, timeout=60)

    w = partition_upsert_writer(factory, "t", key="id", order_col="o")
    w(iter(_mk_rows(spark, [(1, "nullfirst", None), (1, "real", 3)])))
    w(iter(_mk_rows(spark, [(2, "real", 3), (2, "nullsecond", None)])))
    w(iter(_mk_rows(spark, [(3, "bothnull", None), (3, "bothnull", None)])))
    con = sqlite3.connect(db)
    got = dict(con.execute("SELECT id, v FROM t").fetchall())
    con.close()
    assert got == {1: "real", 2: "real", 3: "bothnull"}
    with _pytest.raises(ValueError, match="deterministic winner"):
        w(iter(_mk_rows(spark, [(4, "x", None), (4, "y", None)])))
