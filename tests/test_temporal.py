"""As-of join operator vs a brute-force per-row oracle."""

from datetime import datetime, timedelta

from kgce.operators.temporal import asof_join

T0 = datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(5), "b"), (2, _ts(7), "c"), (3, _ts(9), "d")],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 100), (1, _ts(5), 200), (1, _ts(8), 300), (2, _ts(30), 400)],
        "k long, t timestamp, v long",
    )
    out = {
        r.tag: r.v
        for r in asof_join(left, right, "k", "k", "t", "t", payload_cols=["v"]).collect()
    }
    assert out["a"] == 300   # latest <= t10 is t8
    assert out["b"] == 200   # ties match (<= semantics)
    assert out["c"] is None  # only future right rows for key 2
    assert out["d"] is None  # key 3 has no right rows at all


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(60), "x")], "k long, t timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(10), 7)], "k long, t timestamp, v long")
    hit = asof_join(left, right, "k", "k", "t", "t", payload_cols=["v"],
                    tolerance_seconds=3600).collect()[0]
    assert hit.v == 7
    miss = asof_join(left, right, "k", "k", "t", "t", payload_cols=["v"],
                     tolerance_seconds=600).collect()[0]
    assert miss.v is None


def test_asof_matches_brute_force(spark):
    import random

    rng = random.Random(5)
    lrows = [(rng.randint(1, 6), _ts(rng.randint(0, 500)), i) for i in range(80)]
    rrows_raw = {(rng.randint(1, 6), _ts(rng.randint(0, 500))) for _ in range(60)}
    rrows = [(k, t, i) for i, (k, t) in enumerate(sorted(rrows_raw))]
    left = spark.createDataFrame(lrows, "k long, t timestamp, lid long")
    right = spark.createDataFrame(rrows, "k long, t timestamp, v long")
    got = {
        r.lid: r.v
        for r in asof_join(left, right, "k", "k", "t", "t", payload_cols=["v"]).collect()
    }
    for k, t, lid in lrows:
        cands = [(rt, v) for rk, rt, v in rrows if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, lid
