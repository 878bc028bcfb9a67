"""q_join_interval band-width invariance + worst-case banding fixture.

The interval-overlap join (operators/joins.py q_join_interval) explodes each
session onto fixed-width epoch bands and equi-joins on the band. Exactness
rests on one argument: two overlapping intervals share at least the band
containing their overlap start (= max of the two starts, which both
intervals span). That argument is width-INDEPENDENT — the width only tunes
candidate mass (r8: hour bands produced 42x more candidates than true
overlaps because sessions average 43 s; 300 s bands cut the join mass ~9x
at sf0.1 AND the sf1 replica with identical results). These tests pin the
invariance so the knob can never silently change semantics.
"""

from __future__ import annotations

import pandas as pd
import pytest

from recsys_spark_spark.operators import joins
from recsys_spark_spark.registry import load_all

QUERIES, _ = load_all()

SF_SMOKE = "/root/testdata/sf0.001"


def _run(spark, sf_dir):
    df = QUERIES["q_join_interval"](spark, sf_dir).toPandas()
    return (
        df.sort_values("day").reset_index(drop=True).astype({"n_pairs": "int64", "overlap_s": "int64"})
    )


def test_band_width_invariance_on_fixture(spark, monkeypatch):
    """The committed 300 s width, the r7 hour width, and a pathological
    7-second width must produce byte-identical day aggregates — banding is
    a pure performance knob."""
    base = _run(spark, SF_SMOKE)
    assert len(base) > 0 and base.n_pairs.sum() > 0  # non-vacuous
    for width in (3600, 7):
        monkeypatch.setattr(joins, "_IV_BAND_S", width)
        got = _run(spark, SF_SMOKE)
        pd.testing.assert_frame_equal(got, base)


def test_worst_case_banding_fixture(spark, tmp_path):
    """Hand-built sessions exercising every banding edge: intervals crossing
    band boundaries, a zero-length session exactly touching another's end
    (o_sec = 0 still counts: <= predicates), a long interval spanning many
    bands against a point interval in its last band, and disjoint sessions
    that share a band but do NOT overlap (the candidate the time predicate
    must reject). Expected output computed by brute force in Python."""
    rows = []

    def ev(eid, uid, sec):
        rows.append(
            {
                "event_id": eid,
                "ts": pd.Timestamp("2024-01-01", tz="UTC").tz_localize(None)
                + pd.Timedelta(seconds=sec),
                "user_id": uid,
                "event_type": "x",
                "value": 1.0,
                "props": "{}",
            }
        )

    events = {
        # user 1: one session [100, 400] — crosses the 300 s band boundary
        1: [100, 400],
        # user 2: [350, 360] — overlaps u1 inside the second band
        2: [350, 360],
        # user 3: point session at 400 — touches u1's end exactly (o_sec 0)
        3: [400],
        # user 4: [0, 50] — shares band 0 with u1 but does NOT overlap it
        4: [0, 50],
        # user 5: [0, 3000] long span (sub-gap strides) + a SECOND session
        # next day (gap ≥ 1800 splits) that overlaps nothing — no day-2 row
        5: [0, 1000, 2000, 3000, 86410, 86420],
        # user 6: point at 2999 — inside the LAST band of u5's long span
        6: [2999],
    }
    eid = 0
    for uid, secs in events.items():
        for s in secs:
            eid += 1
            ev(eid, uid, s)

    pdf = pd.DataFrame(rows)
    pdf.to_parquet(tmp_path / "events.parquet", index=False)

    got = QUERIES["q_join_interval"](spark, str(tmp_path)).toPandas()

    # brute force: sessionize with the same gap rule, then all-pairs overlap
    iv = []
    for uid, secs in events.items():
        cur = [secs[0], secs[0]]
        for s in secs[1:]:
            if s - cur[1] >= joins._IV_GAP_S:
                iv.append((uid, cur[0], cur[1]))
                cur = [s, s]
            else:
                cur[1] = s
        iv.append((uid, cur[0], cur[1]))
    pairs = [
        (ua, ub, max(sa, sb), min(ea, eb) - max(sa, sb))
        for i, (ua, sa, ea) in enumerate(iv)
        for (ub, sb, eb) in iv[i + 1 :]
        if sa <= eb and sb <= ea and ua != ub
    ]
    # (1,2) (1,3) (1,5) (2,5) (3,5) (4,5) (5,6); the u1-u4 candidate —
    # the same-band-but-disjoint case — is the one the predicate rejects
    assert len(pairs) == 7
    assert (1, 4) not in {(a, b) for a, b, *_ in pairs}
    assert (5, 6) in {(a, b) for a, b, *_ in pairs}  # last-band hit
    assert len(got) == 1  # all overlap starts fall on day 1
    assert int(got.n_pairs.iloc[0]) == 7
    assert int(got.overlap_s.iloc[0]) == sum(p[3] for p in pairs)


@pytest.mark.parametrize("width", [300])
def test_band_width_matches_committed_constant(width):
    assert joins._IV_BAND_S == width


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 7200)),  # (user, event sec)
        min_size=2,
        max_size=40,
    )
)
def test_banding_matches_brute_force_on_random_fixtures(spark, tmp_path_factory, data):
    """Randomized banding exactness: arbitrary event scatters (multi-session
    users, band-boundary landings, duplicate timestamps) must aggregate to
    exactly the brute-force all-pairs overlap result."""
    import pandas as pd

    tmp = tmp_path_factory.mktemp("ivband")
    base = pd.Timestamp("2024-01-01")
    rows = [
        {
            "event_id": k,
            "ts": base + pd.Timedelta(seconds=sec),
            "user_id": uid,
            "event_type": "x",
            "value": 1.0,
            "props": "{}",
        }
        for k, (uid, sec) in enumerate(sorted(data, key=lambda t: (t[0], t[1])))
    ]
    pd.DataFrame(rows).to_parquet(tmp / "events.parquet", index=False)

    got = QUERIES["q_join_interval"](spark, str(tmp)).toPandas()

    # brute force: sessionize per user (gap rule on DISTINCT seconds in
    # order; duplicate timestamps collapse like date_trunc('second') rows
    # feeding min/max), then all-pairs overlap
    by_user: dict[int, list[int]] = {}
    for uid, sec in data:
        by_user.setdefault(uid, []).append(sec)
    iv = []
    for uid, secs in by_user.items():
        secs = sorted(secs)
        cur = [secs[0], secs[0]]
        for s in secs[1:]:
            if s - cur[1] >= joins._IV_GAP_S:
                iv.append((uid, cur[0], cur[1]))
                cur = [s, s]
            else:
                cur[1] = s
        iv.append((uid, cur[0], cur[1]))
    pairs = [
        (max(sa, sb), min(ea, eb) - max(sa, sb))
        for i, (ua, sa, ea) in enumerate(iv)
        for (ub, sb, eb) in iv[i + 1 :]
        if ua != ub and sa <= eb and sb <= ea
    ]
    if not pairs:
        assert len(got) == 0
        return
    assert len(got) == 1  # all starts are within day one
    assert int(got.n_pairs.iloc[0]) == len(pairs)
    assert int(got.overlap_s.iloc[0]) == sum(o for _, o in pairs)
