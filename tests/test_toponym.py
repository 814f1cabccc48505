"""is_toponym_duplicate parity (operators/verify.toponym_status_pairs) vs
the reference lattice at /root/reference/src/dedupe.c:158-229, including
its branch quirks (city1-vs-district2; suburb1-vs-suburb2; a present city
is never rescued by the other side's district)."""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from libpostal_spark.operators import verify  # noqa: E402

COLS = [
    f"{f}{s}"
    for s in ("1", "2")
    for f in ("city", "city_district", "suburb", "state_district", "state",
              "country")
]


def _status(spark, rows, expansions=None):
    schema = "i long, " + ", ".join(f"{c} string" for c in COLS)
    df = spark.createDataFrame(
        [tuple([i] + list(r)) for i, r in enumerate(rows)], schema
    )
    out = verify.toponym_status_pairs(df, expansions=expansions)
    return [
        r["topo_status"] for r in out.orderBy("i").select("topo_status").collect()
    ]


def _row(**kw):
    return tuple(kw.get(c) for c in COLS)


def test_lattice_branches(spark):
    rows = [
        _row(city1="springfield", city2="springfield"),
        _row(city_district1="brooklyn", city2="brooklyn"),
        _row(suburb1="astoria", city2="astoria"),
        _row(city1="queens", city_district2="queens"),
        # branch-5 quirk: suburb1 compared to suburb2, city1 never checked
        _row(city1="metropolis", suburb1="riverdale", suburb2="riverdale"),
        _row(city1="albany", city2="troy"),
        # a PRESENT city is never rescued by the other side's district
        _row(city1="albany", city_district1="troy", city2="troy"),
        # suburb2 present but suburb1 absent: branch 5 cannot fire
        _row(city1="pt chester", suburb2="pt chester"),
        _row(),
    ]
    assert _status(spark, rows) == [
        verify.STATUS_EXACT,
        verify.STATUS_LIKELY,
        verify.STATUS_NEEDS_REVIEW,
        verify.STATUS_LIKELY,
        verify.STATUS_NEEDS_REVIEW,
        verify.STATUS_NON,
        verify.STATUS_NON,
        verify.STATUS_NON,
        verify.STATUS_NON,
    ]


def test_region_vetoes(spark):
    rows = [
        _row(city1="springfield", city2="springfield", state1="ny", state2="ca"),
        _row(city1="springfield", city2="springfield", state1="ny", state2="ny"),
        _row(city1="springfield", city2="springfield",
             country1="usa", country2="canada"),
        _row(city1="springfield", city2="springfield",
             state_district1="x dist", state_district2="y dist"),
        # absent on one side -> no veto
        _row(city1="springfield", city2="springfield", state1="ny"),
    ]
    assert _status(spark, rows) == [
        verify.STATUS_NON,
        verify.STATUS_EXACT,
        verify.STATUS_NON,
        verify.STATUS_NON,
        verify.STATUS_EXACT,
    ]


def test_expansion_equality(spark):
    exp = {"st": "saint", "mt": "mount"}
    rows = [
        _row(city1="st louis", city2="saint louis"),
        _row(city1="mt vernon", city2="mount vernon", state1="ny", state2="ny"),
        _row(city1="st louis", city2="saint paul"),
    ]
    assert _status(spark, rows, expansions=exp) == [
        verify.STATUS_EXACT,
        verify.STATUS_EXACT,
        verify.STATUS_NON,
    ]
