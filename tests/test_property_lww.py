"""Property-based replay correctness: for ANY random event sequence and ANY
batch split, the engine's final state equals the naive LWW oracle.

This is the strongest form of the reference's final-state validation
(SURVEY.md §5): hypothesis generates adversarial event interleavings —
duplicate lsns, ties on ts, deletes of nonexistent keys, late events,
re-inserts — and arbitrary batch boundaries."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from trde703_openfoodfacts_etl_spark.operators.merge import apply_batch
from trde703_openfoodfacts_etl_spark.schema import TRANSCRIPT_SCHEMA
from trde703_openfoodfacts_etl_spark.sources.lake import LakeTable

from helpers import lake_state_pdf, make_events, ts


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),           # op
        st.integers(min_value=0, max_value=3),      # conv (small → collisions)
        st.integers(min_value=0, max_value=2),      # turn (small → collisions)
        st.integers(min_value=0, max_value=50),     # ts seconds (ties likely)
        st.text(alphabet="abcé ", min_size=0, max_size=8),  # text
    ),
    min_size=1,
    max_size=25,
)


def oracle(rows) -> pd.DataFrame:
    """Naive single-pass LWW in pandas (independent implementation)."""
    state = {}
    for op, lsn, conv, turn, tsec, text in rows:
        key = (conv, turn)
        cur = state.get(key)
        if cur is None or (tsec, lsn) > (cur[0], cur[1]):
            state[key] = (tsec, lsn, op, text)
    out = [
        {"conv_id": k[0], "turn_idx": k[1], "text": v[3], "ts": ts(v[0])}
        for k, v in state.items()
        if v[2] != "D"
    ]
    return (
        pd.DataFrame(out, columns=["conv_id", "turn_idx", "text", "ts"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(raw=events_strategy, n_batches=st.integers(min_value=1, max_value=3), data=st.data())
def test_any_split_matches_oracle(spark, tmp_path_factory, raw, n_batches, data):
    rows = [
        (op, i + 1, f"c{conv}", turn, "user", text, None, tsec)
        for i, (op, conv, turn, tsec, text) in enumerate(raw)
    ]
    # arbitrary batch assignment per event (order within feed preserved)
    assign = [data.draw(st.integers(min_value=0, max_value=n_batches - 1)) for _ in rows]

    lake = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("plake")), TRANSCRIPT_SCHEMA, num_buckets=4
    )
    for b in range(n_batches):
        batch = [r for r, a in zip(rows, assign) if a == b]
        if batch:
            apply_batch(lake, make_events(spark, batch), b)
        else:
            apply_batch(lake, make_events(spark, []), b)

    got = lake_state_pdf(lake, cols=["conv_id", "turn_idx", "text", "ts"]).reset_index(drop=True)
    want = oracle([(op, i + 1, f"c{conv}", turn, tsec, text)
                   for i, (op, conv, turn, tsec, text) in enumerate(raw)])
    got["ts"] = got["ts"].astype("datetime64[us]")
    want["ts"] = want["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
