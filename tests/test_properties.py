"""Property-based differential tests (SURVEY.md §5 strategy, hypothesis
edition): core pure operators vs executable Python models on randomized
inputs. Spark-touching properties keep max_examples small (a Spark job
per example) and disable hypothesis deadlines (JVM warmup skews the
first example); the PNG codec property is pure numpy and runs wide.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SPARK_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# upsert_keep_latest == dict-replay model


rows_st = st.lists(
    st.tuples(
        st.integers(0, 4),        # key
        st.integers(0, 9),        # order
        st.integers(-100, 100),   # payload
    ),
    max_size=12,
)


@given(old=rows_st, new=rows_st)
@SPARK_SETTINGS
@pytest.mark.slow
def test_upsert_keep_latest_matches_model(spark, old, new):
    """For every key: max-order row wins; on order ties new beats old,
    and within a generation the winner among tied rows is any one of
    them ONLY if payloads tie too — the operator must be deterministic,
    so we dedupe ties in the generated data instead of allowing
    ambiguity."""
    from osmart_etl_spark.io.sinks import upsert_keep_latest

    # one row per (generation, key, order): drop ambiguous ties
    old = list({(k, o): (k, o, v) for k, o, v in old}.values())
    new = list({(k, o): (k, o, v) for k, o, v in new}.values())
    cols = ["k", "ord", "v"]
    old_df = spark.createDataFrame(old, cols) if old else None
    if not new and old_df is None:
        return
    new_df = spark.createDataFrame(new or [(0, 0, 0)], cols)
    if not new:
        new = [(0, 0, 0)]

    model: dict = {}
    for k, o, v in old:
        if k not in model or o > model[k][0]:
            model[k] = (o, v, 0)
    for k, o, v in new:
        if k not in model or o > model[k][0] or (o == model[k][0] and model[k][2] == 0):
            model[k] = (o, v, 1)

    got = {
        r["k"]: (r["ord"], r["v"])
        for r in upsert_keep_latest(old_df, new_df, ["k"], "ord").collect()
    }
    assert got == {k: (o, v) for k, (o, v, _) in model.items()}


# ---------------------------------------------------------------------------
# W2 replay == python fold model


events_st = st.lists(
    st.tuples(
        st.integers(0, 2),                    # user
        st.integers(0, 20),                   # seq (order, unique-ified below)
        st.sampled_from(["delta", "abs"]),    # kind
        st.integers(-50, 50),                 # value
        st.booleans(),                        # abs payload NULL?
    ),
    min_size=1,
    max_size=15,
)


@given(events=events_st)
@SPARK_SETTINGS
@pytest.mark.slow
def test_replay_running_balance_matches_model(spark, events):
    from osmart_etl_spark.ops.windows import replay_running_balance

    # unique (user, seq) so the total order is unambiguous (W6 rule)
    events = list({(u, s): (u, s, kind, val, nul) for u, s, kind, val, nul in events}.values())
    rows = [
        (
            u,
            s,
            float(val) if kind == "delta" else 0.0,
            kind == "abs",
            None if (kind == "abs" and nul) else (float(val) if kind == "abs" else None),
        )
        for u, s, kind, val, nul in events
    ]
    df = spark.createDataFrame(
        rows,
        "user long, seq long, delta double, is_absolute boolean, abs_value double",
    )
    out = replay_running_balance(df, "user", ["seq"])
    got = {(r["user"], r["seq"]): r["running"] for r in out.collect()}

    model = {}
    for u in {u for u, *_ in rows}:
        running = 0.0
        for row in sorted((r for r in rows if r[0] == u), key=lambda r: r[1]):
            _, s, delta, is_abs, abs_v = row
            if is_abs:
                running = abs_v if abs_v is not None else 0.0
            else:
                running += delta
            model[(u, s)] = running
    assert got == pytest.approx(model)


# ---------------------------------------------------------------------------
# PNG codec: encode -> decode identity on arbitrary images/filters


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(h, w, c, ft, seed):
    import numpy as np

    from osmart_etl_spark.ops.multimodal import decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)
    got = decode_png(encode_png(img, filter_type=ft))
    assert got.shape == img.shape
    assert np.array_equal(got, img)
