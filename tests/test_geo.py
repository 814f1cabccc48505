"""Geohash-neighbor blocking (operators/geo.py) vs the reference's
near_dupe.c with_latlon semantic and the vendored geohash encode."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_spark.operators import geo  # noqa: E402


def _py_geohash6(lat_u: int, lon_u: int) -> str:
    """Independent scalar mirror of the JVM expression."""
    x = (lon_u + geo.LON_SPAN // 2) * geo.CELLS // geo.LON_SPAN % geo.CELLS
    y = min((lat_u + geo.LAT_SPAN // 2) * geo.CELLS // geo.LAT_SPAN,
            geo.CELLS - 1)
    v = 0
    for k in range(geo.BITS):
        v |= ((x >> k) & 1) << (2 * k + 1)
        v |= ((y >> k) & 1) << (2 * k)
    return "".join(
        geo.GEOHASH_B32[(v >> (25 - 5 * i)) & 31] for i in range(6)
    )


# published geohash test vectors (truncated to precision 6)
GOLDENS = [
    (57_649_110, 10_407_440, "u4pruy"),   # the classic u4pruyd example
    (48_669_000, -4_329_000, "gbsuv7"),
    (39_923_240, 116_390_600, "wx4g0e"),
    (0, 0, "s00000"),
]


@pytest.mark.parametrize("lat_u,lon_u,expect", GOLDENS)
def test_geohash_goldens_scalar(lat_u, lon_u, expect):
    assert _py_geohash6(lat_u, lon_u) == expect


def test_geohash_goldens_spark(spark):
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [(la, lo) for la, lo, _ in GOLDENS], "lat_u long, lon_u long"
    )
    x, y = geo.cell_cols()
    got = [r[0] for r in df.select(geo.geohash_col(x, y)).collect()]
    assert got == [g for _, _, g in GOLDENS]


def test_neighbor_blocking_is_exact_contract(spark):
    """The pair set EQUALS the brute-force evaluation of the contract
    (cells ≤1 apart per axis AND dist² ≤ R2) — nothing missed, nothing
    extra, no duplicate emissions."""
    sf = "/root/testdata/sf0.001"
    got = {
        (r["id1"], r["id2"], r["d2"])
        for r in geo.geo_candidate_pairs(spark, sf).collect()
    }
    pts = geo.synth_points(spark, sf).collect()
    cells = {
        r["id"]: (
            (r["lon_u"] + geo.LON_SPAN // 2) * geo.CELLS
            // geo.LON_SPAN % geo.CELLS,
            min((r["lat_u"] + geo.LAT_SPAN // 2) * geo.CELLS
                // geo.LAT_SPAN, geo.CELLS - 1),
            r["lat_u"], r["lon_u"],
        )
        for r in pts
    }
    want = set()
    ids = sorted(cells)
    for i, a in enumerate(ids):
        ax, ay, alat, alon = cells[a]
        for b in ids[i + 1:]:
            bx, by, blat, blon = cells[b]
            d2 = (alat - blat) ** 2 + (alon - blon) ** 2
            if abs(ax - bx) <= 1 and abs(ay - by) <= 1 and d2 <= geo.R2:
                want.add((a, b, d2))
    assert got == want
    assert len(want) > 100  # the synthetic clusters actually produce pairs


def test_clusters_fully_recovered(spark):
    """Every intra-cluster pair is within one cell per axis by
    construction (jitter 3×STEP < cell span), so blocking recovers all
    C(4,2) pairs of every full CLUSTER_SIZE group."""
    sf = "/root/testdata/sf0.001"
    pairs = {
        (r["id1"], r["id2"])
        for r in geo.geo_candidate_pairs(spark, sf).collect()
    }
    n = 150  # customers at sf0.001
    for g in range(n // geo.CLUSTER_SIZE):
        members = range(g * geo.CLUSTER_SIZE, (g + 1) * geo.CLUSTER_SIZE)
        for a in members:
            for b in members:
                if a < b:
                    assert (a, b) in pairs, (g, a, b)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_geo_twins_scale_free(spark, sf_dir):
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{sf_dir}/customer.parquet')"
        )
        for q, sql in (
            (geo.geohash_keys, geo.geohash_keys_sql()),
            (geo.geo_candidate_pairs, geo.geo_candidate_pairs_sql()),
        ):
            sdf = q(spark, sf_dir).toPandas()
            odf = con.sql(sql).df()
            a = sdf.reindex(sorted(sdf.columns), axis=1).astype(str)
            b = odf.reindex(sorted(odf.columns), axis=1).astype(str)
            a = a.sort_values(list(a.columns), ignore_index=True)
            b = b.sort_values(list(b.columns), ignore_index=True)
            assert a.equals(b)
    finally:
        con.close()


def test_pair_plan_single_shuffle(spark):
    """Plan audit pinned: the candidate join is ONE exchange on the cell
    key per side (family explode is shuffle-free), no cartesian."""
    plan = geo.geo_candidate_pairs(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_place_variants_confirmed():
    """The four venue name variants all pass the expand-and-intersect
    gate against each other; an unrelated name does not."""
    # scalar mirror of _name_set_col
    fold = {"st": "street", "rd": "road", "ave": "avenue", "ln": "lane"}

    def nset(name):
        return sorted({fold.get(t, t) for t in name.split() if t != "the"})

    def gate(a, b):
        sa, sb = set(nset(a)), set(nset(b))
        return 2 * len(sa & sb) >= len(sa | sb)

    variants = ["red oak street", "red oak st", "the red oak street",
                "red oak"]
    for a in variants:
        for b in variants:
            assert gate(a, b), (a, b)
    assert not gate("red oak street", "blue elm lane")


def test_place_dedup_clusters_groups(spark):
    """Each CLUSTER_SIZE custkey group collapses to ONE component with
    the min id canonical; group count matches exactly."""
    sf = "/root/testdata/sf0.001"
    pdf = geo.place_dedup_clusters(spark, sf).toPandas()
    assert len(pdf) == 150
    by_group = pdf.assign(g=pdf["place_id"] // geo.CLUSTER_SIZE)
    for g, grp in by_group.groupby("g"):
        comps = set(grp["component"])
        assert comps == {g * geo.CLUSTER_SIZE}, (g, comps)
    # 37 full groups + 1 partial (ids 148-149) = 38 components
    n_groups = -(-150 // geo.CLUSTER_SIZE)
    assert int(pdf["is_canonical"].sum()) == n_groups
    assert pdf["component"].nunique() == n_groups


def test_place_twin_scale_free(spark):
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        try:
            con.sql(
                "CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{sf_dir}/customer.parquet')"
            )
            sdf = geo.place_dedup_clusters(spark, sf_dir).toPandas()
            odf = con.sql(geo.place_dedup_clusters_sql()).df()
        finally:
            con.close()
        a = sdf.reindex(sorted(sdf.columns), axis=1).astype(str)
        b = odf.reindex(sorted(odf.columns), axis=1).astype(str)
        a = a.sort_values(list(a.columns), ignore_index=True)
        b = b.sort_values(list(b.columns), ignore_index=True)
        assert a.equals(b), sf_dir


def test_antimeridian_pair_found(spark):
    """Two points ~600 m apart ACROSS the antimeridian: the wrapped
    family keys put them in a shared bucket and the cyclic-longitude
    distance confirms them; a third point safely inside the seam cell
    but far away is not paired. Also pins the domain-edge rule:
    lon = +180° wraps to cell 0, lat = +90° clamps to the last row."""
    pts = spark.createDataFrame(
        [(1, 0, 179_998_000), (2, 0, -179_997_000), (3, 0, 170_000_000)],
        "id long, lat_u long, lon_u long",
    )
    got = {(r["id1"], r["id2"]): r["d2"]
           for r in geo.candidate_pairs_from_points(pts).collect()}
    # cyclic dlon = 360_000_000 - 359_995_000 = 5_000 µdeg
    assert got == {(1, 2): 5_000 * 5_000}

    edge = spark.createDataFrame(
        [(0, 90_000_000, 180_000_000)], "id long, lat_u long, lon_u long"
    )
    x, y = geo.cell_cols()
    r = edge.select(x.alias("x"), y.alias("y")).collect()[0]
    assert r["x"] == 0 and r["y"] == geo.CELLS - 1
