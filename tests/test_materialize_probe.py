"""materialize()'s strategy probe (VERDICT r2 item 6): callers that
know the op mix skip the probe job entirely; the fallback probe is one
boolean aggregate. Equality of results is pinned across every path."""

from __future__ import annotations

import datetime as dt

from oec_etl_spark.operators.lww import materialize

COLS = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, op string, seq long"


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _log(spark, with_specials: bool):
    rows = [
        ("c1", 1, "user", "v1", None, _ts(1), "I", 1),
        ("c1", 1, "user", "v2", None, _ts(3), "U", 2),
        ("c2", 1, "user", "gone", None, _ts(1), "I", 3),
        ("c2", 1, None, None, None, _ts(5), "D", 4),
        ("c3", 2, "assistant", "keep", None, _ts(2), "I", 5),
    ]
    if with_specials:
        rows += [
            ("c4", 1, "user", "snap", None, _ts(9), "R", 6),   # snapshot read
            ("c3", 2, None, "patched", None, _ts(7), "P", 7),  # partial update
        ]
    return spark.createDataFrame(rows, COLS)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_ops_param_matches_probe(spark):
    for specials in (False, True):
        log = _log(spark, specials)
        ops = {"I", "U", "D", "R", "P"} if specials else {"I", "U", "D"}
        assert _canon(materialize(log, ops=ops)) == _canon(materialize(log))


def test_ops_superset_is_safe(spark):
    """Declaring T/R/P on a log that has none must not change the
    result (unconditional handling is semantics-neutral)."""
    log = _log(spark, False)
    assert _canon(materialize(log, ops={"I", "U", "D", "T", "R", "P"})) == _canon(
        materialize(log, ops={"I", "U", "D"})
    )


def test_ops_param_skips_the_probe_job(spark):
    """Job accounting via job-group tagging: the ops-supplied call must
    run exactly one job fewer than the probing call on an identical
    plain I/U/D log (the probe is that one job)."""
    sc = spark.sparkContext
    log = _log(spark, False).localCheckpoint(eager=True)

    sc.setJobGroup("mat_with_ops", "materialize with ops param")
    materialize(log, ops={"I", "U", "D"}).collect()
    with_ops = len(sc.statusTracker().getJobIdsForGroup("mat_with_ops"))

    sc.setJobGroup("mat_probe", "materialize probing")
    materialize(log).collect()
    probing = len(sc.statusTracker().getJobIdsForGroup("mat_probe"))
    sc.setJobGroup(None, None)

    assert with_ops >= 1
    # the probe costs at least one whole extra job (under AQE its
    # aggregate may even split into two); supplying ops removes it
    assert probing > with_ops
