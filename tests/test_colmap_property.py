"""Property test for column mapping: a random interleaving of renames,
drops, and appends must leave the table exactly where an in-memory
name-model says — logical columns, per-row values, and write-translation
all agree after arbitrary chains (including swap-shaped mappings and
name reuse after rename). The hand-planted cases in tests/test_txn_colmap.py
pin single steps; composition bugs live in the chains."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # excluded by the -m 'not slow' quick path

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kinesis3_spark.sinks import txn as T

NAMES = ["c1", "c2", "c3", "c4"]

step = st.one_of(
    st.tuples(st.just("rename"), st.sampled_from(NAMES), st.sampled_from(NAMES)),
    st.tuples(st.just("drop"), st.sampled_from(NAMES)),
    st.tuples(st.just("append"), st.integers(100, 105), st.integers(0, 9)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(step, min_size=1, max_size=6))
def test_random_alter_chains_match_name_model(spark, steps):
    path = tempfile.mkdtemp(prefix="k3s_cmprop_") + "/t"
    # model: {logical_name: {row_id: value}}; table starts with c1, c2
    model = {
        "c1": {i: i * 2 for i in range(3)},
        "c2": {i: i * 3 for i in range(3)},
    }
    # row ids live on the KEY column, independent of value columns: a
    # chain that drops every value column leaves the rows (id-only), it
    # never deletes them (hypothesis found the old ids-from-model
    # derivation collapsing to the empty set on [drop c1, drop c2])
    ids = {0, 1, 2}
    T.append_snapshot(
        spark.createDataFrame(
            [(i, i * 2, i * 3) for i in range(3)],
            "id bigint, c1 bigint, c2 bigint",
        ),
        path, key="id", n_buckets=1,
    )
    for s in steps:
        if s[0] == "rename":
            _, old, new = s
            try:
                ep = T.rename_column(path, old, new)
            except ValueError:
                assert old not in model or new in model or old == new
                continue
            assert old in model and new not in model and old != new, ep
            model[new] = model.pop(old)
        elif s[0] == "drop":
            _, col = s
            try:
                T.drop_column(path, col)
            except ValueError:
                assert col not in model
                continue
            assert col in model
            del model[col]
        else:
            _, rid, v = s
            if rid in ids:
                # blind append keeps BOTH rows on a duplicate key (legal
                # by design — dedup is the upsert path's job), so a
                # per-id value model cannot represent it; this property
                # models COLUMN MAPPING, so duplicate-rid draws are
                # skipped (hypothesis found the model divergence on
                # [('append', 100, 9), ('append', 100, 0)] in r13)
                continue
            # append one row supplying every CURRENT logical column
            cols = sorted(model)
            row = tuple([rid] + [v + k for k in range(len(cols))])
            # cols may be EMPTY (every value column dropped): the append
            # is then a key-only row — build the DDL without a trailing
            # comma (review r9-2nd #4)
            schema = ", ".join(
                ["id bigint"] + [f"{c} bigint" for c in cols]
            )
            try:
                T.append_snapshot(
                    spark.createDataFrame([row], schema), path, key="id"
                )
            except ValueError:
                # the only legal refusal: a logical name that collides
                # with a renamed-away or dropped physical name
                man = T.read_manifest(path)
                phys_taken = set(T._mapping(man).values()) | set(
                    T._dropped(man)
                )
                assert any(
                    c in phys_taken and c not in T._mapping(man)
                    for c in cols
                )
                continue
            ids.add(rid)
            for k, c in enumerate(cols):
                model[c][rid] = v + k
    t = T.read_snapshot(spark, path)
    assert set(t.columns) == set(model) | {"id"}
    rows = {r["id"]: r.asDict() for r in t.collect()}
    assert set(rows) == ids
    for c, vals in model.items():
        for rid in ids:
            assert rows[rid][c] == vals.get(rid), (c, rid, steps)
