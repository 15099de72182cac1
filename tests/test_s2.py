"""Structural validation of the from-scratch S2 cell-id implementation.

No s2 library exists in this environment, so these tests pin the published
invariants that jointly determine the algorithm: face-cell tokens, leaf
round-trips, hierarchy prefix nesting, Hilbert-curve continuity, exact
ST/UV inverses, and center re-encoding stability at every level.
"""

from __future__ import annotations

import numpy as np
import pytest

from yirgacheffe_spark.spatial import s2


def _rand_latlng(n, seed=0):
    rng = np.random.default_rng(seed)
    # uniform on the sphere (not in lat/lng) so faces are hit evenly
    z = rng.uniform(-1, 1, n)
    lng = rng.uniform(-180.0, 180.0, n)
    lat = np.degrees(np.arcsin(z))
    return lat, lng


class TestFaceStructure:
    def test_face_cell_tokens(self):
        # The six level-0 face cells have the published tokens 1 3 5 7 9 b
        # (id = (2*face + 1) << 60).  Axis points land on their face.
        pts = [
            (0.0, 0.0, "1"),      # +x axis -> face 0
            (0.0, 90.0, "3"),     # +y axis -> face 1
            (90.0, 0.0, "5"),     # +z (north pole) -> face 2
            (0.0, 180.0, "7"),    # -x axis -> face 3
            (0.0, -90.0, "9"),    # -y axis -> face 4
            (-90.0, 0.0, "b"),    # -z (south pole) -> face 5
        ]
        for face, (lat, lng, tok) in enumerate(pts):
            cell = s2.latlng_to_cell(np.array([lat]), np.array([lng]), 0)
            assert s2.cell_token(cell)[0] == tok, (lat, lng)
            # id = (2*face + 1) << 60, read through the signed int64 view
            expect = np.array([(2 * face + 1) << 60], dtype=np.uint64).view(np.int64)[0]
            assert int(cell[0]) == int(expect)

    def test_face_cell_centers_are_axes(self):
        for face, (lat, lng) in enumerate(
            [(0, 0), (0, 90), (90, 0), (0, 180), (0, -90), (-90, 0)]
        ):
            cell = np.array([(2 * face + 1) << 60], dtype=np.uint64).view(np.int64)
            clat, clng = s2.cell_to_latlng(cell)
            assert abs(clat[0] - lat) < 1e-9
            if abs(lat) < 89:  # lng undefined at poles
                assert abs(((clng[0] - lng + 180) % 360) - 180) < 1e-9

    def test_all_faces_hit(self):
        lat, lng = _rand_latlng(20000, seed=1)
        faces = np.asarray(s2.latlng_to_cell(lat, lng, 30), dtype=np.uint64) >> np.uint64(61)
        assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}
        # uniform-on-sphere points should split roughly evenly across faces
        counts = np.bincount(faces.astype(int), minlength=6)
        assert counts.min() > 20000 / 6 * 0.7

    def test_level_encoding(self):
        lat, lng = _rand_latlng(500, seed=2)
        for level in (0, 1, 7, 15, 29, 30):
            ids = s2.latlng_to_cell(lat, lng, level)
            assert np.all(s2.cell_level(ids) == level)
            # faces 0-3 read positive through the int64 view; 4-5 negative
            faces = np.asarray(ids).view(np.uint64) >> np.uint64(61)
            assert np.all(faces <= 5)
            assert np.array_equal(np.asarray(ids) < 0, faces >= 4)


class TestHierarchy:
    def test_parent_is_prefix(self):
        lat, lng = _rand_latlng(2000, seed=3)
        leaf = s2.latlng_to_cell(lat, lng, 30)
        for level in (0, 5, 12, 22, 29):
            coarse = s2.latlng_to_cell(lat, lng, level)
            assert np.array_equal(s2.cell_parent(leaf, level), coarse)
            assert np.all(s2.cell_contains(coarse, leaf))

    def test_children_partition_parent(self):
        lat, lng = _rand_latlng(50, seed=4)
        for level in (0, 3, 10, 29):
            cells = np.unique(s2.latlng_to_cell(lat, lng, level))
            for c in cells[:5]:
                kids = s2.cell_children(int(c))
                assert len(kids) == 4
                assert np.all(s2.cell_level(kids) == level + 1)
                assert np.all(s2.cell_parent(kids, level) == c)
                # children are contiguous in curve order and distinct
                assert len(set(kids.tolist())) == 4

    def test_contains_excludes_siblings(self):
        c = s2.latlng_to_cell(np.array([10.0]), np.array([20.0]), 10)
        kids = s2.cell_children(int(c[0]))
        other = s2.latlng_to_cell(np.array([-40.0]), np.array([120.0]), 11)
        assert not s2.cell_contains(c, other)[0]
        for k in kids:
            assert s2.cell_contains(c, np.array([k]))[0]


class TestRoundTrip:
    def test_center_reencodes_to_same_cell(self):
        lat, lng = _rand_latlng(3000, seed=5)
        for level in (2, 8, 16, 24, 30):
            ids = s2.latlng_to_cell(lat, lng, level)
            clat, clng = s2.cell_to_latlng(ids)
            again = s2.latlng_to_cell(clat, clng, level)
            assert np.array_equal(np.asarray(ids), np.asarray(again)), level

    def test_leaf_center_close_to_input(self):
        lat, lng = _rand_latlng(2000, seed=6)
        ids = s2.latlng_to_cell(lat, lng, 30)
        clat, clng = s2.cell_to_latlng(ids)
        # leaf cells are ~1cm: centers must be within a microdegree
        assert np.max(np.abs(clat - lat)) < 1e-5
        dlng = np.abs(((clng - lng + 180) % 360) - 180)
        assert np.max(dlng * np.cos(np.radians(lat))) < 1e-5

    def test_token_round_trip(self):
        lat, lng = _rand_latlng(300, seed=7)
        for level in (0, 9, 30):
            ids = np.asarray(s2.latlng_to_cell(lat, lng, level))
            toks = s2.cell_token(ids)
            assert np.array_equal(s2.token_to_cell(toks), ids)
            # tokens never end in '0' and are at most 16 hex chars
            assert all(1 <= len(t) <= 16 and not t.endswith("0") for t in toks)

    def test_st_uv_exact_inverse(self):
        s = np.linspace(0.0, 1.0, 10001)
        assert np.allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-15)
        u = np.linspace(-1.0, 1.0, 10001)
        assert np.allclose(s2.st_to_uv(s2.uv_to_st(u)), u, atol=1e-15)


class TestHilbertCurve:
    def test_consecutive_positions_are_edge_adjacent(self):
        """The defining property of a Hilbert curve: positions p and p+1 map
        to (i,j) cells exactly one edge apart.  This pins the lookup tables
        (any transcription error in kPosToIJ / kPosToOrientation breaks it)."""
        rng = np.random.default_rng(8)
        for face in range(6):
            pos = rng.integers(0, 1 << 59, 500, dtype=np.uint64)  # leaf curve positions
            ids_a = ((np.uint64(face) << np.uint64(61)) | (pos << np.uint64(1))) | np.uint64(1)
            ids_b = ((np.uint64(face) << np.uint64(61)) | ((pos + np.uint64(1)) << np.uint64(1))) | np.uint64(1)
            fa, ia, ja = s2._to_face_ij(ids_a)
            fb, ib, jb = s2._to_face_ij(ids_b)
            manhattan = np.abs(ia - ib) + np.abs(ja - jb)
            assert np.all(manhattan == 1), f"face {face}"

    def test_from_to_face_ij_inverse(self):
        rng = np.random.default_rng(9)
        face = rng.integers(0, 6, 2000).astype(np.int64)
        i = rng.integers(0, 1 << 30, 2000).astype(np.int64)
        j = rng.integers(0, 1 << 30, 2000).astype(np.int64)
        ids = s2._from_face_ij(face, i, j)
        f2, i2, j2 = s2._to_face_ij(ids)
        assert np.array_equal(f2, face)
        assert np.array_equal(i2, i)
        assert np.array_equal(j2, j)

    def test_spatial_locality(self):
        """Nearby points share long id prefixes far more often than far
        points — the property that makes S2 ids good partition keys."""
        rng = np.random.default_rng(10)
        lat = rng.uniform(-60, 60, 2000)
        lng = rng.uniform(-170, 170, 2000)
        near = s2.latlng_to_cell(lat + 1e-4, lng + 1e-4, 30)
        same12 = np.mean(
            np.asarray(s2.cell_parent(s2.latlng_to_cell(lat, lng, 30), 12))
            == np.asarray(s2.cell_parent(near, 12))
        )
        assert same12 > 0.95


class TestSparkIntegration:
    def test_s2_cell_column(self, spark):
        import pandas as pd

        pdf = pd.DataFrame({"lat": [37.77, -33.86, 51.5], "lng": [-122.42, 151.21, -0.12]})
        df = spark.createDataFrame(pdf)
        out = df.withColumn("s2", s2.s2_cell_column("lat", "lng", 12))
        rows = {(round(r.lat, 2)): r.s2 for r in out.collect()}
        expect = s2.latlng_to_cell(pdf["lat"].to_numpy(), pdf["lng"].to_numpy(), 12)
        for k, v in zip(pdf["lat"].round(2), expect):
            assert rows[k] == int(v)

    def test_s2_token_column(self, spark):
        df = spark.createDataFrame([(37.77, -122.42)], "lat double, lng double")
        out = (
            df.withColumn("s2", s2.s2_cell_column("lat", "lng", 9))
            .withColumn("tok", s2.s2_token_column("s2"))
            .collect()[0]
        )
        assert out.tok == s2.cell_token(np.array([out.s2]))[0]


def test_parent_level_guard():
    c = s2.latlng_to_cell(np.array([1.0]), np.array([2.0]), 5)
    with pytest.raises(ValueError):
        s2.cell_parent(c, 9)  # deeper than the cell itself


def test_leaf_has_no_children():
    c = s2.latlng_to_cell(np.array([1.0]), np.array([2.0]), 30)
    with pytest.raises(ValueError):
        s2.cell_children(int(c[0]))


class TestNeighbors:
    def test_four_distinct_same_level(self):
        lat, lng = _rand_latlng(80, seed=11)
        for level in (1, 5, 12, 30):
            for c in np.asarray(s2.latlng_to_cell(lat[:20], lng[:20], level)):
                nbrs = s2.edge_neighbors(int(c))
                assert len(set(nbrs.tolist())) == 4
                assert np.all(s2.cell_level(nbrs) == level)
                assert int(c) not in set(nbrs.tolist())

    def test_symmetry(self):
        """Edge adjacency is symmetric: b in N(a) <=> a in N(b) — including
        across cube-face boundaries (the FromFaceIJWrap path)."""
        lat, lng = _rand_latlng(60, seed=12)
        for level in (0, 1, 4, 10):
            for c in np.unique(np.asarray(s2.latlng_to_cell(lat, lng, level)))[:10]:
                for n in s2.edge_neighbors(int(c)):
                    back = set(s2.edge_neighbors(int(n)).tolist())
                    assert int(c) in back, (level, hex(int(c)), hex(int(n)))

    def test_face_cell_neighbors_are_adjacent_faces(self):
        # face 0 (+x) touches faces 1 (+y), 2 (+z), 4 (-y), 5 (-z) — never
        # its antipode face 3 (-x).
        face0 = np.array([1 << 60], dtype=np.uint64).view(np.int64)[0]
        toks = sorted(s2.cell_token(s2.edge_neighbors(int(face0))).tolist())
        assert toks == ["3", "5", "9", "b"]

    def test_neighbor_centers_are_close(self):
        lat, lng = _rand_latlng(50, seed=13)
        level = 8
        cells = np.asarray(s2.latlng_to_cell(lat, lng, level))
        # level-8 cells are ~0.3 degrees; neighbor centers must be within a
        # few cell pitches, never across the globe
        for c in cells[:15]:
            clat, clng = s2.cell_to_latlng(np.array([c]))
            nlat, nlng = s2.cell_to_latlng(s2.edge_neighbors(int(c)))
            # great-circle via chord distance on unit sphere
            def xyz(la, ln):
                la, ln = np.radians(la), np.radians(ln)
                return np.stack([np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)])
            d = np.linalg.norm(xyz(nlat, nlng) - xyz(clat, clng), axis=0)
            assert np.all(d < 0.05), d  # ~3 degrees of arc

    def test_grid_disk_ring(self):
        c = int(np.asarray(s2.latlng_to_cell(np.array([20.0]), np.array([30.0]), 10))[0])
        d0 = s2.grid_disk(c, 0)
        assert d0.tolist() == [c]
        d1 = s2.grid_disk(c, 1)
        assert len(d1) == 5 and c in d1.tolist()
        d2 = s2.grid_disk(c, 2)
        assert set(d1.tolist()) < set(d2.tolist())
        r2 = s2.grid_ring(c, 2)
        assert set(r2.tolist()) == set(d2.tolist()) - set(d1.tolist())
        assert np.all(s2.cell_level(d2) == 10)


def test_submit_enrich_s2_level(spark, tmp_path):
    """The cluster entrypoint's --s2-level flag adds a genuine S2 id column
    to the enriched output that matches direct numpy encoding."""
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    import submit_main
    from yirgacheffe_spark.spatial import pages

    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "pages_out")
    pages.generate_pages(spark, 60, partitions=2).write.parquet(src)
    rc = submit_main.main(
        ["enrich", "--input", src, "--output", out, "--res", "5",
         "--s2-level", "11"]
    )
    assert rc == 0
    got = spark.read.parquet(out).select("lat", "lng", "s2_cell").toPandas()
    expect = s2.latlng_to_cell(got["lat"].to_numpy(), got["lng"].to_numpy(), 11)
    assert np.array_equal(got["s2_cell"].to_numpy(np.int64), np.asarray(expect))


class TestNullSafety:
    def test_nonfinite_latlng_yields_sentinel_zero(self):
        lat = np.array([np.nan, 10.0, np.inf, 20.0])
        lng = np.array([5.0, np.nan, 5.0, 30.0])
        ids = s2.latlng_to_cell(lat, lng, 12)
        assert list(np.asarray(ids)[:3]) == [0, 0, 0]
        assert ids[3] != 0

    def test_token_round_trip_includes_invalid_x(self):
        assert s2.cell_token(np.array([0], dtype=np.int64))[0] == "X"
        assert s2.token_to_cell(np.array(["X"], dtype=object))[0] == 0
        assert s2.token_to_cell(np.array(["x"], dtype=object))[0] == 0

    def test_s2_cell_column_null_coords_give_null(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0), (None, 2.0), (1.0, None), (None, None)],
            "lat double, lng double",
        )
        rows = df.withColumn("s2", s2.s2_cell_column("lat", "lng", 9)).collect()
        assert rows[0].s2 is not None
        assert all(r.s2 is None for r in rows[1:])

    def test_s2_token_column_null_ids_no_precision_loss(self, spark):
        """A NULL in the id column must neither crash the token UDF nor
        corrupt the other ids in the batch (nullable long -> pandas float64
        loses bits above 2^53 — the ids must be coalesced before Arrow)."""
        big = int(s2.latlng_to_cell(np.array([-50.0]), np.array([-170.0]), 30)[0])
        assert big < 0  # face >= 4: top bit set, the precision-critical case
        df = spark.createDataFrame([(big,), (None,)], "cell long")
        rows = (
            df.withColumn("tok", s2.s2_token_column("cell"))
            .orderBy(F_isnull_last("cell"))
            .collect()
        )
        by_cell = {r.cell: r.tok for r in rows}
        assert by_cell[None] is None
        assert s2.token_to_cell(np.array([by_cell[big]], dtype=object))[0] == big

    def test_grid_ring_equals_disk_difference(self):
        c = int(np.asarray(s2.latlng_to_cell(np.array([-15.0]), np.array([60.0]), 9))[0])
        for k in (1, 2, 3):
            ring = set(s2.grid_ring(c, k).tolist())
            want = set(s2.grid_disk(c, k).tolist()) - set(s2.grid_disk(c, k - 1).tolist())
            assert ring == want


def F_isnull_last(col):
    from pyspark.sql import functions as F
    return F.col(col).isNull()


class TestS2CellLayer:
    def test_mask_matches_index_membership(self, spark):
        """Every pixel of the rasterized mask must equal the exact index
        test at the pixel center — and the mask must be fully contained in
        the layer's declared extent (the conservative bound holds)."""
        import yirgacheffe_spark as yg

        proj = yg.MapProjection("epsg:4326", 0.01, -0.01)
        cell = int(np.asarray(s2.latlng_to_cell(
            np.array([46.3]), np.array([7.7]), 8))[0])
        layer = yg.s2_tile(cell, proj)
        arr = layer.to_numpy(spark=spark)
        a = layer.area
        lngs = a.left + (np.arange(arr.shape[1]) + 0.5) * proj.xstep
        lats = a.top + (np.arange(arr.shape[0]) + 0.5) * proj.ystep
        glng, glat = np.meshgrid(lngs, lats)
        want = (np.asarray(s2.latlng_to_cell(glat.ravel(), glng.ravel(), 8))
                .reshape(arr.shape) == cell).astype(np.float64)
        np.testing.assert_array_equal(arr, want)
        assert arr.sum() > 0
        # the cell must not be clipped: a one-pixel ring of centers JUST
        # OUTSIDE the declared extent must contain no members
        ring_lng = np.concatenate([lngs, lngs,
                                   [a.left - 0.5 * proj.xstep] * len(lats),
                                   [a.right + 0.5 * proj.xstep] * len(lats)])
        ring_lat = np.concatenate([[a.top - 0.5 * proj.ystep] * len(lngs),
                                   [a.bottom + 0.5 * proj.ystep] * len(lngs),
                                   lats, lats])
        outside = np.asarray(s2.latlng_to_cell(ring_lat, ring_lng, 8))
        assert not np.any(outside == cell)

    def test_neighbors_never_double_claim(self, spark):
        """A cell and its 4 edge neighbors, rasterized on one grid, must
        never both claim a pixel (exact tessellation through the engine)."""
        import yirgacheffe_spark as yg

        proj = yg.MapProjection("epsg:4326", 0.02, -0.02)
        cell = int(np.asarray(s2.latlng_to_cell(
            np.array([-12.0]), np.array([131.0]), 7))[0])
        masks = [yg.s2_tile(cell, proj)]
        masks += [yg.s2_tile(int(n), proj) for n in s2.edge_neighbors(cell)]
        overlap = yg.where(yg.sum(masks) > 1, 1, 0).sum(spark=spark)
        assert overlap == 0

    def test_children_exactly_tile_parent(self, spark):
        import yirgacheffe_spark as yg

        proj = yg.MapProjection("epsg:4326", 0.01, -0.01)
        parent = int(np.asarray(s2.latlng_to_cell(
            np.array([38.0]), np.array([-9.1]), 9))[0])
        kids = [yg.s2_tile(int(k), proj) for k in s2.cell_children(parent)]
        diff = (yg.sum(kids) != yg.s2_tile(parent, proj)).sum(spark=spark)
        assert diff == 0

    def test_pole_cell_has_full_longitude_span(self):
        import yirgacheffe_spark as yg

        proj = yg.MapProjection("epsg:4326", 0.5, -0.5)
        pole = int(np.asarray(s2.latlng_to_cell(
            np.array([90.0]), np.array([0.0]), 3))[0])
        layer = yg.s2_tile(pole, proj)
        assert layer.area.left == -180.0 and layer.area.right == 180.0
        assert layer.area.top == 90.0
