"""asof_join unit semantics: backward inclusive match, NULL when nothing
precedes, per-key isolation, equal-timestamp inclusivity."""

from __future__ import annotations

from k_means_clustering_via_map_reduce_spark.operators.asof import asof_join


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # after r10 → r10
            (2, "u1", _ts("2024-01-01 11:00:00")),  # at r11 exactly → r11
            (3, "u1", _ts("2024-01-01 09:00:00")),  # before all → NULL
            (4, "u2", _ts("2024-01-01 12:00:00")),  # u2's own r20 only
        ],
        "event_id BIGINT, user_id STRING, ts TIMESTAMP_NTZ",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01 09:30:00"), 1.5),
            (11, "u1", _ts("2024-01-01 11:00:00"), 2.5),
            (20, "u2", _ts("2024-01-01 00:00:00"), 9.0),
        ],
        "rid BIGINT, user_id STRING, ts TIMESTAMP_NTZ, v DOUBLE",
    )
    out = {
        r["event_id"]: (r["rid"], r["v"])
        for r in asof_join(
            left, right, on=["user_id"], right_cols=["rid", "v"]
        ).collect()
    }
    assert out == {
        1: (10, 1.5),
        2: (11, 2.5),  # equal timestamps match (inclusive)
        3: (None, None),  # nothing precedes
        4: (20, 9.0),  # keys do not leak across users
    }


def test_asof_carries_latest_not_any(spark):
    """Multiple right rows before a left row → the LATEST one wins."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-02 00:00:00"))],
        "event_id BIGINT, key STRING, ts TIMESTAMP_NTZ",
    )
    right = spark.createDataFrame(
        [
            (100, "k", _ts("2024-01-01 01:00:00")),
            (200, "k", _ts("2024-01-01 02:00:00")),
            (300, "k", _ts("2024-01-01 03:00:00")),
            (999, "k", _ts("2024-01-03 00:00:00")),  # in the future: ignored
        ],
        "rid BIGINT, key STRING, ts TIMESTAMP_NTZ",
    )
    rows = asof_join(left, right, on=["key"], right_cols=["rid"]).collect()
    assert [(r["event_id"], r["rid"]) for r in rows] == [(1, 300)]


def test_asof_single_shuffle(spark, sf_dir):
    """The union-window formulation must cost exactly one hash shuffle
    (plus the presentation sort in the registered query)."""
    import k_means_clustering_via_map_reduce_spark.queries as Q
    from k_means_clustering_via_map_reduce_spark.plans import count_shuffles

    Q.load_all()
    df = Q.QUERIES["q20_asof_join"](spark, sf_dir)
    # union-window shuffle + groupBy(user,ts) pre-agg + final orderBy
    assert count_shuffles(df) <= 3


def test_asof_matches_pandas_merge_asof(spark):
    """Property check against an independent reference implementation:
    pandas merge_asof (backward, allow_exact_matches) on pseudo-random
    data with unique (key, ts) pairs on the right side."""
    import random

    import pandas as pd

    rng = random.Random(7)
    left_rows = [
        (
            i,
            f"k{rng.randrange(5)}",
            _ts("2024-01-01 00:00:00"),
        )
        for i in range(200)
    ]
    # Re-randomize timestamps (seconds offsets) for both sides.
    import datetime

    left_rows = [
        (i, k, t + datetime.timedelta(seconds=rng.randrange(100_000)))
        for (i, k, t) in left_rows
    ]
    right_seen = set()
    right_rows = []
    for j in range(300):
        k = f"k{rng.randrange(5)}"
        ts = _ts("2024-01-01 00:00:00") + datetime.timedelta(
            seconds=rng.randrange(100_000)
        )
        if (k, ts) in right_seen:
            continue
        right_seen.add((k, ts))
        right_rows.append((1000 + j, k, ts))

    left = spark.createDataFrame(
        left_rows, "event_id BIGINT, key STRING, ts TIMESTAMP_NTZ"
    )
    right = spark.createDataFrame(
        right_rows, "rid BIGINT, key STRING, ts TIMESTAMP_NTZ"
    )
    got = {
        r["event_id"]: r["rid"]
        for r in asof_join(left, right, on=["key"], right_cols=["rid"]).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["event_id", "key", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["rid", "key", "ts"]).sort_values("ts")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="key", direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(r.event_id): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == want
