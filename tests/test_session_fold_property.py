"""Property test: the streaming stateful gap fold, fed any batching of an
event stream IN EVENT-TIME ORDER ACROSS BATCHES (late data only within the
running session, i.e. what survives the watermark), produces exactly the
sessions of the batch sessionizer on the full event set."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hypertrace_ingester_spark.streaming.jobs import _capped_session_fn

from helpers import FakeGroupState

GAP = 100


def batch_sessions(ts):
    """Reference semantics: sorted events, gap > GAP splits (group.sessionize)."""
    ts = sorted(ts)
    out, cur = [], [ts[0]]
    for t in ts[1:]:
        if t - cur[-1] > GAP:
            out.append(cur)
            cur = [t]
        else:
            cur.append(t)
    out.append(cur)
    return [(len(c), c[0], c[-1]) for c in out]


@given(
    ts=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=60),
    splits=st.lists(st.integers(min_value=1, max_value=59), max_size=6),
    jitter=st.integers(min_value=0, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_fold_matches_batch_sessionize(ts, splits, jitter):
    ordered = sorted(ts)
    cuts = sorted({s for s in splits if s < len(ordered)})
    batches = np.split(np.array(ordered), cuts)
    # jitter: move one event of each batch earlier (late-but-within-session
    # arrival) without violating the watermark assumption
    state = FakeGroupState()
    fn = _capped_session_fn(max_events=10**9, gap_ms=GAP)
    closed = []
    for b in batches:
        if len(b) == 0:
            continue
        arr = list(b)
        if len(arr) > 1 and jitter:
            arr = arr[1:] + [arr[0]]  # out-of-order within the batch
        out = pd.concat(list(fn((1,), iter([pd.DataFrame({"ts_ms": arr})]), state)))
        for _, r in out[out["n_events"] > 0].iterrows():
            closed.append(
                (int(r["n_events"]), int(r["session_start_ms"]), int(r["session_end_ms"]))
            )
    if state.get is not None and state.get[0] > 0:
        closed.append(state.get)
    assert closed == batch_sessions(ts)


@given(
    ts=st.lists(st.integers(0, 10**6), min_size=1, max_size=60),
    cap=st.integers(1, 6),
)
@settings(max_examples=25, deadline=None)
def test_session_emit_capped_matches_naive(ts, cap):
    """group.session_emit_capped == a straight-line python reference:
    gap-split sorted timestamps, keep the first `cap` per session, emit
    count/start/end(kept)/truncated."""
    from hypertrace_ingester_spark.operators import group as grp
    from hypertrace_ingester_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    gap = 1000
    rows = [(1, int(t), i) for i, t in enumerate(sorted(ts))]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_id long")
    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["session_start_ms"], r["session_end_ms"], r["truncated"]
        )
        for r in grp.session_emit_capped(df, cap=cap, gap_ms=gap).collect()
    }

    # naive reference
    ordered = sorted(zip(sorted(ts), range(len(ts))))
    sessions, cur = [], [ordered[0]]
    for prev, nxt in zip(ordered, ordered[1:]):
        if nxt[0] - prev[0] > gap:
            sessions.append(cur)
            cur = []
        cur.append(nxt)
    sessions.append(cur)
    expect = {}
    for idx, sess in enumerate(sessions, start=1):
        kept = sess[:cap]
        expect[(1, idx)] = (
            len(kept), sess[0][0], kept[-1][0], len(sess) > cap
        )
    assert got == expect
