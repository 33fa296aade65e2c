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


def test_assertion_intervals_gaps_and_islands(spark):
    """Episodes split at snapshot gaps; page multiplicity within one
    snapshot collapses; disjoint keys never merge.  Pinned against a
    pure-Python interval oracle and a DuckDB gaps-and-islands twin."""
    from collections import defaultdict

    import duckdb

    from kgce.operators.temporal import assertion_intervals

    rows = [
        # (subj, pred, obj, snap): A asserted in 1,2,3 then gap, back in 6
        ("A", "r", "B", 1), ("A", "r", "B", 2), ("A", "r", "B", 3),
        ("A", "r", "B", 6),
        # same snapshot asserted by THREE pages -> one episode row, n_pages 3
        ("C", "r", "D", 4), ("C", "r", "D", 4), ("C", "r", "D", 4),
        # single-snapshot episode
        ("E", "r", "F", 9),
        # different object = different key, overlapping snaps don't merge
        ("A", "r", "X", 2), ("A", "r", "X", 3),
    ]
    df = spark.createDataFrame(
        rows, "subj_text string, pred string, obj_text string, snap_id int"
    )
    got = sorted(
        (r.subj_text, r.pred, r.obj_text, r.valid_from, r.valid_to,
         r.n_snapshots, r.n_page_assertions)
        for r in assertion_intervals(df).collect()
    )

    # pure-Python oracle
    by_key = defaultdict(lambda: defaultdict(int))
    for s, p, o, snap in rows:
        by_key[(s, p, o)][snap] += 1
    want = []
    for key, snaps in by_key.items():
        run = []
        for snap in sorted(snaps) + [None]:
            if run and (snap is None or snap != run[-1] + 1):
                want.append(
                    (*key, run[0], run[-1], len(run),
                     sum(snaps[x] for x in run))
                )
                run = []
            if snap is not None:
                run.append(snap)
    assert got == sorted(want)
    assert ("A", "r", "B", 1, 3, 3, 3) in got and ("A", "r", "B", 6, 6, 1, 1) in got
    assert ("C", "r", "D", 4, 4, 1, 3) in got

    # DuckDB twin of the same gaps-and-islands plan
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (subj_text VARCHAR, pred VARCHAR, obj_text VARCHAR, snap_id INT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    duck = sorted(
        tuple(r)
        for r in con.execute("""
            WITH snaps AS (
              SELECT subj_text, pred, obj_text, snap_id,
                     count(*) AS n_pages
              FROM t GROUP BY ALL
            ), isl AS (
              SELECT *, snap_id - row_number() OVER (
                  PARTITION BY subj_text, pred, obj_text ORDER BY snap_id
                ) AS island
              FROM snaps
            )
            SELECT subj_text, pred, obj_text,
                   min(snap_id) AS valid_from, max(snap_id) AS valid_to,
                   CAST(count(*) AS BIGINT) AS n_snapshots,
                   CAST(sum(n_pages) AS BIGINT) AS n_page_assertions
            FROM isl GROUP BY subj_text, pred, obj_text, island
        """).fetchall()
    )
    assert got == duck


def test_assertions_asof_point_in_time_view(spark):
    """assertions_asof == the facts whose episode covers the probe snap;
    re-asserted facts appear through either episode but never twice
    (episodes are disjoint per key by construction)."""
    from kgce.operators.temporal import assertion_intervals, assertions_asof

    rows = [
        ("A", "r", "B", s) for s in (1, 2, 3, 6)
    ] + [("C", "r", "D", 4), ("E", "r", "F", 9), ("A", "r", "X", 2), ("A", "r", "X", 3)]
    df = spark.createDataFrame(
        rows, "subj_text string, pred string, obj_text string, snap_id int"
    )
    intervals = assertion_intervals(df)

    def facts_at(snap):
        return {
            (r.subj_text, r.pred, r.obj_text)
            for r in assertions_asof(intervals, snap).collect()
        }

    for snap in range(0, 11):
        want = {
            (s, p, o)
            for (s, p, o) in {(s, p, o) for s, p, o, _ in rows}
            if any(rs == snap for a, b, c, rs in rows if (a, b, c) == (s, p, o))
        }
        assert facts_at(snap) == want, snap
    # the A-r-B gap snapshot sits between two episodes and matches neither
    assert ("A", "r", "B") in facts_at(3) and ("A", "r", "B") not in facts_at(5)
    # at most one row per key survives any probe
    out = assertions_asof(intervals, 2).collect()
    assert len(out) == len({(r.subj_text, r.pred, r.obj_text) for r in out})
