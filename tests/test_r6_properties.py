"""Property sweeps for the r6 operators whose semantics have the most
edge-case surface: burst debounce (chaining, tie-breaks) and
span-coverage contamination (overlapping matches, short docs). Each is
checked against an independent plain-Python reference over randomized
inputs — the fixed-case tests pin known cases; these hunt the unknown
ones (the r5 chunking tail bug was found exactly this way)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime(2024, 1, 1, 0, 0, 0)

VOCAB = ["aa", "bb", "cc", "dd", "ee"]


def _ref_debounce(rows, gap_s):
    """rows: (event_id, user_id, offset_seconds). Keep-first of chained
    bursts per user, ordered by (ts, event_id)."""
    kept = []
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r[1], []).append(r)
    for _, evs in by_user.items():
        evs.sort(key=lambda r: (r[2], r[0]))
        prev = None
        for r in evs:
            if prev is None or r[2] - prev > gap_s:
                kept.append(r[0])
            prev = r[2]
    return sorted(kept)


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 900),  # offset seconds (clusters force bursts)
        ),
        min_size=1,
        max_size=25,
    ),
    gap_s=st.sampled_from([60, 300]),
)
def test_debounce_matches_reference(spark, rows, gap_s):
    from etlutil_spark.operators.sessions import debounce

    data = [
        (i, u, BASE + timedelta(seconds=off)) for i, (u, off) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, user_id bigint, ts timestamp"
    )
    got = sorted(
        r["event_id"]
        for r in debounce(
            df, ["user_id"], "ts", gap_seconds=gap_s, order_cols=["event_id"]
        ).collect()
    )
    ref = _ref_debounce(
        [(i, u, off) for i, (u, off) in enumerate(rows)], gap_s
    )
    assert got == ref


def _ref_coverage(train, eval_texts, n=3):
    esh = set()
    for t in eval_texts:
        tk = t.split()
        for i in range(len(tk) - n + 1):
            esh.add(" ".join(tk[i : i + n]))
    out = {}
    for doc_id, t in train:
        tk = t.split()
        if not tk:
            continue
        covered = set()
        for i in range(len(tk) - n + 1):
            if " ".join(tk[i : i + n]) in esh:
                covered.update(range(i, i + n))
        if covered:
            out[doc_id] = (len(tk), len(covered))
    return out


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    train=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=10),
        min_size=1,
        max_size=8,
    ),
    evals=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8),
        min_size=1,
        max_size=4,
    ),
)
def test_coverage_matches_reference(spark, train, evals):
    from etlutil_spark.operators.decontaminate import contamination_coverage

    tr_rows = [(i, " ".join(ws)) for i, ws in enumerate(train)]
    ev_rows = [(100 + i, " ".join(ws)) for i, ws in enumerate(evals)]
    tr = spark.createDataFrame(tr_rows, "doc_id bigint, text string")
    ev = spark.createDataFrame(ev_rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_covered"])
        for r in contamination_coverage(tr, ev, n=3).collect()
    }
    ref = _ref_coverage(tr_rows, [t for _, t in ev_rows])
    assert got == ref
