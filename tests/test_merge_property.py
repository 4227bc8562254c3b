"""Property test for merge_into's clause engine: on random targets,
sources, and clause matrices, the committed table must equal an
independent Python evaluation of MERGE semantics — first satisfied
clause wins per row, matched/not-matched/not-matched-by-source routed by
key presence, unclaimed rows kept (target) or ignored (source). Random
composition reaches clause interactions the hand-planted fixtures in
tests/test_txn_merge.py can't enumerate."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # excluded by the -m 'not slow' quick path

import tempfile

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from kinesis3_spark.sinks import txn as T

# each pool entry: (SQL fragment for the engine, python twin for the model)
MATCHED_CONDS = [
    (None, lambda e: True),
    ("val % 2 = 0", lambda e: e["val"] % 2 == 0),
    ("src_amt > 5", lambda e: e["src_amt"] > 5),
    ("val < src_amt", lambda e: e["val"] < e["src_amt"]),
]
MATCHED_ACTS = [
    ("delete", None),
    ("update", ("val + src_amt", lambda e: e["val"] + e["src_amt"])),
    ("update", ("src_amt * 2", lambda e: e["src_amt"] * 2)),
]
NM_CONDS = [
    (None, lambda e: True),
    ("src_amt > 5", lambda e: e["src_amt"] > 5),
]
NMBS_CONDS = [
    (None, lambda e: True),
    ("val % 2 = 0", lambda e: e["val"] % 2 == 0),
]
NMBS_ACTS = [
    ("delete", None),
    ("update", ("val + 1", lambda e: e["val"] + 1)),
]

matched_clause = st.tuples(
    st.sampled_from(MATCHED_CONDS), st.sampled_from(MATCHED_ACTS)
)
nmbs_clause = st.tuples(
    st.sampled_from(NMBS_CONDS), st.sampled_from(NMBS_ACTS)
)

case = st.fixed_dictionaries(
    {
        "target": st.dictionaries(
            st.integers(0, 6), st.integers(0, 10), max_size=7
        ),
        "source": st.dictionaries(
            st.integers(0, 9), st.integers(0, 10), min_size=1, max_size=8
        ),
        "matched": st.lists(matched_clause, max_size=2),
        "not_matched": st.lists(st.sampled_from(NM_CONDS), max_size=1),
        "nmbs": st.lists(nmbs_clause, max_size=1),
    }
)


def _ref(target, source, matched, not_matched, nmbs):
    out = {}
    for tid, tval in target.items():
        if tid in source:
            env = {"val": tval, "src_amt": source[tid]}
            clauses = [(c[1], a) for c, a in matched]
        else:
            env = {"val": tval}
            clauses = [(c[1], a) for c, a in nmbs]
        keep, val = True, tval
        for cond, (kind, upd) in clauses:
            if cond(env):
                if kind == "delete":
                    keep = False
                else:
                    val = upd[1](env)
                break  # first satisfied clause wins
        if keep:
            out[tid] = val
    for sid, sval in source.items():
        if sid in target:
            continue
        env = {"src_amt": sval}
        for cond in [c[1] for c in not_matched]:
            if cond(env):
                out[sid] = sval
                break
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(case)
def test_merge_matches_python_model(spark, c):
    assume(c["matched"] or c["not_matched"] or c["nmbs"])
    path = tempfile.mkdtemp(prefix="k3s_mergeprop_") + "/t"
    T.append_snapshot(
        spark.createDataFrame(
            [(k, v) for k, v in c["target"].items()] or [(None, None)],
            "id bigint, val bigint",
        ).where("id IS NOT NULL"),
        path, key="id", n_buckets=2,
    )
    src = spark.createDataFrame(
        [(k, v) for k, v in c["source"].items()], "id bigint, amt bigint"
    )
    T.merge_into(
        spark, path, src, key="id",
        matched=[
            {**({"condition": cond[0]} if cond[0] else {}),
             **({"delete": True} if kind == "delete"
                else {"update": {"val": upd[0]}})}
            for cond, (kind, upd) in c["matched"]
        ],
        not_matched=[
            {**({"condition": cond[0]} if cond[0] else {}),
             "insert": {"id": "src_id", "val": "src_amt"}}
            for cond in c["not_matched"]
        ],
        not_matched_by_source=[
            {**({"condition": cond[0]} if cond[0] else {}),
             **({"delete": True} if kind == "delete"
                else {"update": {"val": upd[0]}})}
            for cond, (kind, upd) in c["nmbs"]
        ],
    )
    t = T.read_snapshot(spark, path)
    got = {} if t is None else {r["id"]: r["val"] for r in t.collect()}
    assert got == _ref(
        c["target"], c["source"], c["matched"], c["not_matched"], c["nmbs"]
    )
