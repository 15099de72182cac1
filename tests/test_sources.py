"""Source-layer behaviour: parquet tiles, mosaics, vectors, cells, uniform
and synthesized area layers, reprojection."""

import math

import numpy as np
import pytest

import yirgacheffe_spark as yg
from yirgacheffe_spark.plans.kernel import evaluate_window
from yirgacheffe_spark.reprojection import WGS84_A_B, area_of_pixel_m2
from yirgacheffe_spark.spatial import cells as ci

PROJ = yg.MapProjection("epsg:4326", 0.02, -0.02)
RNG = np.random.default_rng(seed=42)


def test_parquet_roundtrip_dtypes(tmp_path):
    for np_dtype in (np.uint8, np.int16, np.uint64, np.float32, np.float64):
        data = RNG.integers(0, 100, (11, 7)).astype(np_dtype)
        area = yg.Area(0.0, 0.0, 7 * 0.02, -11 * 0.02, PROJ)
        layer = yg.write_array_as_raster_table(
            str(tmp_path / f"r_{np_dtype.__name__}"), data, area, tile_size=4
        )
        np.testing.assert_array_equal(layer.read_array(0, 0, 7, 11), data)
        assert layer.datatype.to_numpy() == np_dtype


def test_parquet_nodata_to_nan(tmp_path):
    data = np.array([[1.0, 2.0], [0.0, 3.0]])
    area = yg.Area(0.0, 0.0, 2 * 0.02, -2 * 0.02, PROJ)
    layer = yg.write_array_as_raster_table(str(tmp_path / "nod"), data, area, nodata=0.0)
    got = layer.read_array(0, 0, 2, 2)
    assert np.isnan(got[1, 0])
    ignored = yg.ParquetRasterLayer(str(tmp_path / "nod"), ignore_nodata=True)
    assert ignored.read_array(0, 0, 2, 2)[1, 0] == 0.0


def test_group_layer_first_wins(spark):
    a = yg.from_array(np.full((4, 4), 1.0), (0.0, 0.0), PROJ, "a")
    b = yg.from_array(np.full((4, 4), 2.0), (0.04, -0.04), PROJ, "b")  # offset by 2px
    group = yg.GroupLayer([a, b], "g")
    got = group.to_numpy(spark=spark)
    assert got.shape == (6, 6)
    assert got[0, 0] == 1.0          # only a
    assert got[3, 3] == 1.0          # overlap: first-listed wins
    assert got[5, 5] == 2.0          # only b
    assert got[0, 5] == 0.0          # neither: zero fill


def test_group_layer_nan_holes_fall_through(spark):
    top = np.full((4, 4), 5.0)
    top[1, 1] = -1.0  # nodata hole
    a = yg.ArrayLayer(top, yg.Area(0.0, 0.0, 0.08, -0.08, PROJ), "a", nodata=-1.0)
    b = yg.from_array(np.full((4, 4), 9.0), (0.0, 0.0), PROJ, "b")
    got = yg.GroupLayer([a, b]).to_numpy(spark=spark)
    assert got[1, 1] == 9.0
    assert got[0, 0] == 5.0


def test_tiled_group_regular_grid(spark):
    # 2x2 grid of 4x4 tiles with globally-unique values (mosaic placement check).
    outer = np.arange(64, dtype=np.float64).reshape(8, 8)
    children = []
    for ty in range(2):
        for tx in range(2):
            chunk = outer[ty * 4 : (ty + 1) * 4, tx * 4 : (tx + 1) * 4]
            children.append(
                yg.from_array(chunk, (tx * 4 * 0.02, -(ty * 4) * 0.02), PROJ)
            )
    group = yg.TiledGroupLayer(children)
    np.testing.assert_array_equal(group.to_numpy(spark=spark), outer)


def test_vector_layer_rasterize_and_filter(spark):
    feats = [
        {"geom_wkt": "POLYGON ((0.02 -0.02, 0.10 -0.02, 0.10 -0.10, 0.02 -0.10, 0.02 -0.02))",
         "id_no": 1},
        {"geom_wkt": "POLYGON ((0.10 -0.10, 0.18 -0.10, 0.18 -0.18, 0.10 -0.18, 0.10 -0.10))",
         "id_no": 2},
    ]
    vec = yg.read_shape(feats, PROJ, burn_value="id_no")
    got = vec.to_numpy(spark=spark)
    assert set(np.unique(got)) <= {0.0, 1.0, 2.0}
    assert (got == 1.0).any() and (got == 2.0).any()

    only2 = yg.read_shape(feats, PROJ, burn_value="id_no", where_filter="id_no=2")
    got2 = only2.to_numpy(spark=spark)
    assert (got2 == 2.0).any() and not (got2 == 1.0).any()

    with pytest.raises(ValueError):
        yg.read_shape(feats, PROJ, where_filter="id_no=99")


def test_vector_layer_center_containment():
    # A rectangle covering exactly pixels [1,3) x [1,3): centers of those
    # pixels are inside; all_touched adds the boundary-touched ring.
    feats = [{"geom_wkt": "POLYGON ((0.02 -0.02, 0.06 -0.02, 0.06 -0.06, 0.02 -0.06, 0.02 -0.02))"}]
    interior = yg.VectorLayer(feats, PROJ, burn_value=1, all_touched=False)
    got = interior.read_array(0, 0, *interior.dimensions)
    assert got.sum() == 4  # 2x2 pixel centers strictly inside


def test_cell_layer_matches_naive_check(spark):
    cell = int(ci.latlng_to_cell(10.0, 20.0, 7))
    layer = yg.h3_tile(cell, PROJ)
    got = layer.to_numpy(spark=spark)
    # Naive oracle: per-pixel latlng_to_cell equality.
    w = layer.window
    lngs = layer.area.left + (np.arange(w.xsize) + 0.5) * PROJ.xstep
    lats = layer.area.top + (np.arange(w.ysize) + 0.5) * PROJ.ystep
    grid_lat, grid_lng = np.meshgrid(lats, lngs, indexing="ij")
    naive = (ci.latlng_to_cell(grid_lat.ravel(), grid_lng.ravel(), 7) == cell).reshape(got.shape)
    np.testing.assert_array_equal(got.astype(bool), naive)


def test_cell_disk_tessellates_without_overlap(spark):
    c0 = int(ci.latlng_to_cell(0.5, 0.5, 6))
    disk = ci.grid_disk(c0, 1)
    assert len(disk) == 9
    layers = [yg.h3_tile(int(c), PROJ) for c in disk]
    base = layers[0].area
    for l in layers[1:]:
        base = base | l.area
    stack = yg.sum([l.as_area(base) for l in layers])
    assert yg.where(stack > 1, 1, 0).sum(spark=spark) == 0.0
    # And the disk exactly covers its bounding box interior.
    inner = yg.h3_tile(c0, PROJ)
    assert yg.where(stack.as_area(inner.area) < 1, 1, 0).sum(spark=spark) == 0.0


def test_uniform_area_layer_broadcast():
    col = np.arange(5, dtype=np.float64) + 1
    ua = yg.UniformAreaLayer(col, yg.Area(-180.0, 0.0, 180.0, -5 * 0.02, PROJ))
    got = np.broadcast_to(ua.read_array(0, 0, 1, 5), (5, 8))
    np.testing.assert_array_equal(got[:, 0], col)
    np.testing.assert_array_equal(got[:, 7], col)


def test_area_per_pixel_geographic():
    proj = yg.MapProjection("epsg:4326", 1.0, -1.0)
    app = yg.area_raster(proj)
    equator = app.read_array(0, 89, 3, 1)  # row centred at +0.5 deg lat
    a, b = WGS84_A_B
    want = area_of_pixel_m2(a, b, 1.0, -1.0, 90.0 - 89.5)
    np.testing.assert_allclose(equator, want)
    # Equator pixels are larger than polar ones.
    polar = app.read_array(0, 0, 1, 1)
    assert equator[0, 0] > polar[0, 0]


def test_area_per_pixel_projected_constant():
    proj = yg.MapProjection("esri:54030", 1000.0, -1000.0)
    app = yg.AreaPerPixelLayer(proj)
    got = app.read_window(0, 0, 2, 2, yg.Window(0, 0, 2, 2))
    np.testing.assert_array_equal(got, np.full((2, 2), 1000.0 * 1000.0))


def test_reprojected_nearest_identity_rescale():
    data = np.arange(64, dtype=np.float64).reshape(8, 8)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.04, -0.04)
    rl = src.as_projection(coarse, "nearest")
    got = evaluate_window(rl)
    assert got.shape == (4, 4)
    # Nearest at 2x coarsening picks a source pixel from each 2x2 block.
    for i in range(4):
        for j in range(4):
            block = data[2 * i : 2 * i + 2, 2 * j : 2 * j + 2]
            assert got[i, j] in block


def test_reprojected_sum_block_stats():
    data = np.arange(64, dtype=np.float64).reshape(8, 8)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.04, -0.04)
    rl = yg.ReprojectedLayer(src, coarse, "sum")
    got = rl.read_array(0, 0, 4, 4)
    want = data.reshape(4, 2, 4, 2).sum(axis=(1, 3))
    np.testing.assert_array_equal(got, want)


def test_reprojected_med_rms_block_stats():
    data = RNG.integers(0, 50, (8, 8)).astype(np.float64)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.04, -0.04)
    med = yg.ReprojectedLayer(src, coarse, "med").read_array(0, 0, 4, 4)
    np.testing.assert_array_equal(
        med, np.median(data.reshape(4, 2, 4, 2), axis=(1, 3)))
    rms = yg.ReprojectedLayer(src, coarse, "rms").read_array(0, 0, 4, 4)
    np.testing.assert_allclose(
        rms, np.sqrt(np.mean(np.square(data.reshape(4, 2, 4, 2)), axis=(1, 3))))


def test_reprojected_nearest_noninteger_scale_preimage():
    # 0.02 -> 0.03 pitch is a 1.5x coarsening: exercises the preimage-window
    # gather (tile reads must touch only rows.min():rows.max()+1 of the source).
    data = np.arange(144, dtype=np.float64).reshape(12, 12)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.03, -0.03)
    rl = src.as_projection(coarse, "nearest")
    got = evaluate_window(rl)
    assert got.shape == (8, 8)
    # Expected: nearest source pixel of each target center, computed directly.
    for i in range(8):
        for j in range(8):
            sx = (j + 0.5) * 0.03 / 0.02
            sy = (i + 0.5) * 0.03 / 0.02
            assert got[i, j] == data[int(sy), int(sx)]


def test_reprojected_nearest_partial_window_reads_match_full(tmp_path):
    # Reading the target in pieces must equal reading it whole (the preimage
    # optimisation cannot change values, only the bytes fetched).
    data = RNG.integers(0, 99, (16, 16)).astype(np.float64)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.05, -0.05)
    rl = src.as_projection(coarse, "nearest")
    h, w = rl.window.ysize, rl.window.xsize
    whole = rl.read_array(0, 0, w, h)
    pieces = np.zeros_like(whole)
    for y0 in range(0, h, 3):
        for x0 in range(0, w, 3):
            ys, xs = min(3, h - y0), min(3, w - x0)
            pieces[y0:y0 + ys, x0:x0 + xs] = rl.read_array(x0, y0, xs, ys)
    np.testing.assert_array_equal(pieces, whole)


def test_as_projection_on_expression(spark):
    # Reference wraps any node (_operators/__init__.py:422-434); the sum of
    # an expression coarsened 2x by block-sum must equal the full-res sum.
    a = yg.from_array(np.arange(64, dtype=np.float64).reshape(8, 8), (0.0, 0.0), PROJ)
    b = yg.from_array(np.full((8, 8), 2.0), (0.0, 0.0), PROJ)
    expr = a * b + 1
    coarse = yg.MapProjection("epsg:4326", 0.04, -0.04)
    got = expr.as_projection(coarse, "sum").sum(spark=spark)
    want = (np.arange(64, dtype=np.float64).reshape(8, 8) * 2 + 1).sum()
    assert got == want


def test_as_projection_expression_nearest_local():
    a = yg.from_array(np.arange(144, dtype=np.float64).reshape(12, 12), (0.0, 0.0), PROJ)
    expr = a % 7
    coarse = yg.MapProjection("epsg:4326", 0.03, -0.03)
    got = evaluate_window(expr.as_projection(coarse, "nearest"))
    data = np.arange(144, dtype=np.float64).reshape(12, 12) % 7
    for i in range(8):
        for j in range(8):
            assert got[i, j] == data[int((i + 0.5) * 1.5), int((j + 0.5) * 1.5)]


class TestWhereFilter:
    FEATS = [
        {"species": 1, "cls": "bird", "pop": 10.5,
         "geom_wkt": "POLYGON ((0.003 -0.003, 0.037 -0.003, 0.037 -0.037, 0.003 -0.037, 0.003 -0.003))"},
        {"species": 2, "cls": "mammal", "pop": 3.0,
         "geom_wkt": "POLYGON ((0.103 -0.003, 0.137 -0.003, 0.137 -0.037, 0.103 -0.037, 0.103 -0.003))"},
        {"species": 3, "cls": "bird", "pop": None,
         "geom_wkt": "POLYGON ((0.203 -0.003, 0.237 -0.003, 0.237 -0.037, 0.203 -0.037, 0.203 -0.003))"},
    ]

    def _kept(self, flt):
        from yirgacheffe_spark.sources.vector import parse_where_filter
        pred = parse_where_filter(flt)
        return [f["species"] for f in self.FEATS if pred(f)]

    def test_comparisons(self):
        assert self._kept("species = 2") == [2]
        assert self._kept("species <> 2") == [1, 3]
        assert self._kept("pop >= 3.0") == [1, 2]
        assert self._kept("pop < 5") == [2]

    def test_string_and_bool_ops(self):
        assert self._kept("cls = 'bird'") == [1, 3]
        assert self._kept("cls = 'bird' AND pop > 5") == [1]
        assert self._kept("cls = 'mammal' OR species = 3") == [2, 3]
        assert self._kept("NOT (cls = 'bird')") == [2]

    def test_in_and_null(self):
        assert self._kept("species IN (1, 3)") == [1, 3]
        assert self._kept("cls IN ('mammal')") == [2]
        assert self._kept("pop IS NULL") == [3]
        assert self._kept("pop IS NOT NULL") == [1, 2]

    def test_escaped_quote(self):
        feats = [{"name": "o'brien", "geom_wkt": self.FEATS[0]["geom_wkt"]}]
        from yirgacheffe_spark.sources.vector import parse_where_filter
        pred = parse_where_filter("name = 'o''brien'")
        assert pred(feats[0])

    def test_layer_filters_and_burn_dtype(self):
        vl = yg.read_shape(self.FEATS, PROJ, burn_value="species",
                           where_filter="cls = 'bird' AND species < 3")
        assert vl.datatype == yg.DataType.Int64
        vl_f = yg.read_shape(self.FEATS[:2], PROJ, burn_value="pop")
        assert vl_f.datatype == yg.DataType.Float64


class TestGeneralBlockStats:
    def _expect(self, data, fy, fx, method):
        # Reference semantics: source pixel belongs to the target pixel its
        # center falls in; counts vary per target cell for non-integer factors.
        h, w = data.shape
        th, tw = int(np.floor(h / fy)), int(np.floor(w / fx))
        out = np.zeros((th, tw))
        for i in range(th):
            for j in range(tw):
                rows = [r for r in range(h) if i <= (r + 0.5) / fy < i + 1]
                cols = [c for c in range(w) if j <= (c + 0.5) / fx < j + 1]
                block = data[np.ix_(rows, cols)]
                out[i, j] = {
                    "sum": block.sum(), "average": block.mean(),
                    "min": block.min(), "max": block.max(),
                    "rms": np.sqrt(np.mean(np.square(block))),
                }[method]
        return out

    def test_noninteger_factor_stats(self):
        data = RNG.integers(0, 40, (12, 12)).astype(np.float64)
        src = yg.from_array(data, (0.0, 0.0), PROJ)
        coarse = yg.MapProjection("epsg:4326", 0.03, -0.03)  # 1.5x
        for method in ("sum", "average", "min", "max", "rms"):
            rl = yg.ReprojectedLayer(src, coarse, method)
            got = rl.read_array(0, 0, 8, 8)
            np.testing.assert_allclose(
                got, self._expect(data, 1.5, 1.5, method), rtol=1e-12,
                err_msg=method)

    def test_integer_factor_general_path_matches_reshape(self):
        data = RNG.integers(0, 40, (8, 8)).astype(np.float64)
        src = yg.from_array(data, (0.0, 0.0), PROJ)
        coarse = yg.MapProjection("epsg:4326", 0.04, -0.04)
        got = yg.ReprojectedLayer(src, coarse, "sum").read_array(0, 0, 4, 4)
        np.testing.assert_array_equal(got, data.reshape(4, 2, 4, 2).sum(axis=(1, 3)))

    def test_cross_crs_average(self):
        # Mercator source coarsened onto a lat/lng target grid near the
        # equator: every target cell must average >= 1 source pixel, and the
        # result must match a direct center-assignment computation.
        from yirgacheffe_spark.reprojection import lnglat_to_mercator

        m_step = 10000.0
        data = RNG.integers(0, 40, (40, 40)).astype(np.float64)
        merc = yg.MapProjection("epsg:3857", m_step, -m_step)
        src = yg.ArrayLayer(data, yg.Area(0.0, 200000.0, 400000.0, -200000.0, merc),
                            "m", nodata=None)
        tgt = yg.MapProjection("epsg:4326", 0.5, -0.5)
        rl = yg.ReprojectedLayer(src, tgt, "average")
        got = np.asarray(rl.read_window(0, 0, 4, 2, yg.Window(0, 0, 4, 2)))
        # Direct check for target cell (0, 0): lng [left, left+0.5), lat (top-0.5, top]
        area = rl.area
        for ti in range(2):
            for tj in range(4):
                x0, _ = lnglat_to_mercator(area.left + tj * 0.5, 0.0)
                x1, _ = lnglat_to_mercator(area.left + (tj + 1) * 0.5, 0.0)
                _, y0 = lnglat_to_mercator(0.0, area.top + ti * -0.5)
                _, y1 = lnglat_to_mercator(0.0, area.top + (ti + 1) * -0.5)
                # Out-of-extent source pixels average in as zeros (the same
                # zero-padding the integer-factor path applies at edges).
                rows = [r for r in range(-100, 140)
                        if y1 < 200000.0 - (r + 0.5) * m_step <= y0]
                cols = [c for c in range(-100, 140)
                        if x0 <= 0.0 + (c + 0.5) * m_step < x1]
                vals = [
                    data[r, c] if 0 <= r < 40 and 0 <= c < 40 else 0.0
                    for r in rows for c in cols
                ]
                np.testing.assert_allclose(
                    got[ti, tj], np.mean(vals), rtol=1e-12)


def _segment_membership(n_src, xsize, target_step, source_step):
    """Mirror of ReprojectedLayer._block_stats_general's center-in-segment
    rule: source pixel c belongs to target j iff searchsorted(frac_edges,
    c + 0.5, 'right') - 1 == j, with frac_edges the inverse-mapped target
    pixel edges in source-pixel units."""
    edges = np.arange(xsize + 1) * target_step
    frac = edges / source_step
    return {
        j: [c for c in range(n_src)
            if np.searchsorted(frac, c + 0.5, side="right") - 1 == j]
        for j in range(xsize)
    }


def test_reprojected_mode_med_noninteger_scale():
    # 1.5x coarsening: mode/med at arbitrary factors via the segmented path.
    data = RNG.integers(0, 5, (12, 12)).astype(np.float64)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.03, -0.03)
    members = _segment_membership(12, 8, 0.03, 0.02)
    for method in ("med", "mode"):
        got = yg.ReprojectedLayer(src, coarse, method).read_array(0, 0, 8, 8)
        for i in range(8):
            for j in range(8):
                blk = data[np.ix_(members[i], members[j])].ravel()
                if method == "med":
                    assert got[i, j] == np.median(blk), (i, j)
                else:
                    vals, counts = np.unique(blk, return_counts=True)
                    # ties -> smallest value (np.unique is sorted; argmax
                    # returns the first maximal count)
                    assert got[i, j] == vals[np.argmax(counts)], (i, j)


def test_reprojected_mode_med_general_matches_reshape_at_integer_factor():
    # At an integer factor the segmented path must agree with the exact
    # reshape path bit-for-bit (including the mode tie rule).
    data = RNG.integers(0, 4, (8, 8)).astype(np.int32)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.04, -0.04)
    for method in ("med", "mode"):
        rl = yg.ReprojectedLayer(src, coarse, method)
        via_reshape = rl.read_array(0, 0, 4, 4)
        via_general = rl._block_stats_general(0, 0, 4, 4)  # noqa: SLF001
        np.testing.assert_array_equal(via_reshape, via_general)


def test_reprojected_mode_dtype_preserved_general_path():
    data = RNG.integers(0, 7, (12, 12)).astype(np.int16)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.03, -0.03)
    out = yg.ReprojectedLayer(src, coarse, "mode").read_array(0, 0, 8, 8)
    assert out.dtype == np.int16


def test_reprojected_med_cross_crs():
    # Mercator -> lat/lng median: the general path must warp med across CRSs
    # (reference parity: GDAL warps all 8 methods at any factor).
    from yirgacheffe_spark.reprojection import lnglat_to_mercator

    m_step = 10000.0
    data = RNG.integers(0, 40, (40, 40)).astype(np.float64)
    merc = yg.MapProjection("epsg:3857", m_step, -m_step)
    src = yg.ArrayLayer(data, yg.Area(0.0, 200000.0, 400000.0, -200000.0, merc),
                        "m", nodata=None)
    rl = yg.ReprojectedLayer(src, yg.MapProjection("epsg:4326", 0.5, -0.5), "med")
    got = np.asarray(rl.read_window(0, 0, 4, 2, yg.Window(0, 0, 4, 2)))
    area = rl.area
    for ti in range(2):
        for tj in range(4):
            x0, _ = lnglat_to_mercator(area.left + tj * 0.5, 0.0)
            x1, _ = lnglat_to_mercator(area.left + (tj + 1) * 0.5, 0.0)
            _, y0 = lnglat_to_mercator(0.0, area.top + ti * -0.5)
            _, y1 = lnglat_to_mercator(0.0, area.top + (ti + 1) * -0.5)
            rows = [r for r in range(-100, 140)
                    if y1 < 200000.0 - (r + 0.5) * m_step <= y0]
            cols = [c for c in range(-100, 140)
                    if x0 <= 0.0 + (c + 0.5) * m_step < x1]
            vals = [data[r, c] if 0 <= r < 40 and 0 <= c < 40 else 0.0
                    for r in rows for c in cols]
            np.testing.assert_allclose(got[ti, tj], np.median(vals), rtol=1e-12)


class TestUTM:
    """Transverse Mercator (UTM zones) via the Krueger series — the public
    4th-order formulas; closes the 'first UTM raster' gap (the reference
    handles any GDAL CRS, _datatypes/area.py:315-364)."""

    def test_forward_known_invariants(self):
        from yirgacheffe_spark.reprojection import utm_forward

        # Central meridian of zone 31N is 3E: easting = 500000 exactly,
        # northing 0 at the equator.
        e, n = utm_forward(np.array([3.0]), np.array([0.0]), zone=31, south=False)
        assert abs(e[0] - 500000.0) < 1e-6
        assert abs(n[0]) < 1e-6
        # Meridian arc scaled by k0: 45 deg north on the central meridian.
        e, n = utm_forward(np.array([3.0]), np.array([45.0]), zone=31, south=False)
        assert abs(e[0] - 500000.0) < 1e-6
        # Meridian distance to 45N on WGS84 is 4984944.378 m (public value);
        # northing = k0 * that.
        assert abs(n[0] - 0.9996 * 4984944.378) < 0.5
        # South zones add the 10,000 km false northing.
        e, n = utm_forward(np.array([3.0]), np.array([-1.0]), zone=31, south=True)
        assert n[0] > 9_800_000

    def test_round_trip(self):
        from yirgacheffe_spark.reprojection import utm_forward, utm_inverse

        rng = np.random.default_rng(3)
        lng = 3.0 + rng.uniform(-2.9, 2.9, 200)
        lat = rng.uniform(-80.0, 84.0, 200)
        e, n = utm_forward(lng, lat, zone=31, south=False)
        lng2, lat2 = utm_inverse(e, n, zone=31, south=False)
        np.testing.assert_allclose(lng2, lng, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_transform_point_registry(self):
        from yirgacheffe_spark.grid import CRS
        from yirgacheffe_spark.reprojection import transform_point, utm_forward

        src = CRS("epsg:4326")
        dst = CRS("epsg:32631")
        x, y = transform_point(src, dst, 4.0, 52.0)
        e, n = utm_forward(np.array([4.0]), np.array([52.0]), zone=31, south=False)
        assert (x, y) == (float(e[0]), float(n[0]))
        back = transform_point(dst, src, x, y)
        assert abs(back[0] - 4.0) < 1e-9 and abs(back[1] - 52.0) < 1e-9

    def test_nearest_reprojection_from_utm(self):
        """Read a UTM-stored raster onto a lat/lng grid with nearest — the
        non-separable 2-D gather path."""
        from yirgacheffe_spark.reprojection import utm_forward

        data = RNG.integers(0, 99, (40, 40)).astype(np.float64)
        m_step = 1000.0
        utm = yg.MapProjection("epsg:32631", m_step, -m_step)
        # 40x40 km block starting at easting 480km, northing 5,760km (~52N).
        src = yg.ArrayLayer(
            data, yg.Area(480000.0, 5760000.0, 520000.0, 5720000.0, utm),
            "u", nodata=None,
        )
        tgt = yg.MapProjection("epsg:4326", 0.02, -0.02)
        rl = yg.ReprojectedLayer(src, tgt, "nearest")
        h, w = rl.window.ysize, rl.window.xsize
        got = np.asarray(rl.read_window(0, 0, w, h, yg.Window(0, 0, w, h)))
        area = rl.area
        # Direct check on a probe subset: each target center forward-projects
        # into the source grid; nearest = floor cell.
        for ti in range(0, h, 3):
            for tj in range(0, w, 3):
                lng_c = area.left + (tj + 0.5) * 0.02
                lat_c = area.top - (ti + 0.5) * 0.02
                e, n = utm_forward(np.array([lng_c]), np.array([lat_c]),
                                   zone=31, south=False)
                col = int(np.floor((e[0] - 480000.0) / m_step))
                row = int(np.floor((5760000.0 - n[0]) / m_step))
                want = data[row, col] if 0 <= row < 40 and 0 <= col < 40 else 0.0
                assert got[ti, tj] == want, (ti, tj)

    def test_block_stats_non_separable_raises(self):
        data = np.ones((40, 40))
        utm = yg.MapProjection("epsg:32631", 1000.0, -1000.0)
        src = yg.ArrayLayer(
            data, yg.Area(480000.0, 5760000.0, 520000.0, 5720000.0, utm),
            "u", nodata=None,
        )
        rl = yg.ReprojectedLayer(src, yg.MapProjection("epsg:4326", 0.02, -0.02),
                                 "average")
        with pytest.raises(NotImplementedError, match="separable"):
            rl.read_window(0, 0, 4, 4, yg.Window(0, 0, 4, 4))


class TestNationalGridsAndPolar:
    """Round-trip + anchor + scale invariants for the widened CRS registry:
    OSGB (epsg:27700, Airy 1830 + single-Helmert OSGB36), Lambert-93
    (epsg:2154, LCC 2SP on GRS80), polar stereographic (epsg:3413/3031),
    ETRS89 UTM (epsg:258xx), and ellipsoidal Mercator (epsg:3395)."""

    def _crs(self, code):
        import yirgacheffe_spark as yg

        return yg.MapProjection(code, 1.0, -1.0).crs

    def test_false_origin_anchors(self):
        from yirgacheffe_spark import reprojection as R

        # Grid coordinates of (lat0, lon0) must be the false origin exactly.
        tm = R._projection_for(self._crs("epsg:27700"))
        # 27700's origin is in OSGB36 datum terms: bypass the datum shift.
        tm_nohelm = R._TM(R._ELL_AIRY1830, -2.0, 49.0, 0.9996012717,
                          400_000.0, -100_000.0)
        e, n = tm_nohelm.forward(np.array([-2.0]), np.array([49.0]))
        assert abs(e[0] - 400_000.0) < 1e-6 and abs(n[0] + 100_000.0) < 1e-6

        lcc = R._projection_for(self._crs("epsg:2154"))
        e, n = lcc.forward(np.array([3.0]), np.array([46.5]))
        assert abs(e[0] - 700_000.0) < 1e-6 and abs(n[0] - 6_600_000.0) < 1e-6

        ps = R._projection_for(self._crs("epsg:3413"))
        e, n = ps.forward(np.array([-45.0]), np.array([90.0]))
        assert abs(e[0]) < 1e-6 and abs(n[0]) < 1e-6

    def test_os_worked_example(self):
        """Ordnance Survey's published TM worked example ('A guide to
        coordinate systems in Great Britain'): OSGB36 geodetic
        52d39'27.2531\"N 1d43'4.5177\"E -> E 651409.903 N 313177.270."""
        from yirgacheffe_spark import reprojection as R

        tm = R._TM(R._ELL_AIRY1830, -2.0, 49.0, 0.9996012717,
                   400_000.0, -100_000.0)
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lng = 1 + 43 / 60 + 4.5177 / 3600
        e, n = tm.forward(np.array([lng]), np.array([lat]))
        assert abs(e[0] - 651409.903) < 2e-3, e
        assert abs(n[0] - 313177.270) < 2e-3, n

    def test_round_trips(self):
        from yirgacheffe_spark.reprojection import transform_points

        rng = np.random.default_rng(5)
        cases = {
            "epsg:27700": (rng.uniform(-6, 1.5, 50), rng.uniform(50, 58, 50)),
            "epsg:2154": (rng.uniform(-4, 8, 50), rng.uniform(42, 51, 50)),
            "epsg:3413": (rng.uniform(-180, 180, 50), rng.uniform(60, 89, 50)),
            "epsg:3031": (rng.uniform(-180, 180, 50), rng.uniform(-89, -60, 50)),
            "epsg:25832": (rng.uniform(6, 12, 50), rng.uniform(40, 60, 50)),
            "epsg:3395": (rng.uniform(-179, 179, 50), rng.uniform(-80, 80, 50)),
        }
        import yirgacheffe_spark as yg

        wgs = yg.MapProjection("epsg:4326", 1.0, -1.0).crs
        for code, (lng, lat) in cases.items():
            crs = yg.MapProjection(code, 1.0, -1.0).crs
            x, y = transform_points(wgs, crs, lng, lat)
            lng2, lat2 = transform_points(crs, wgs, x, y)
            # Datum-shifted CRSs (27700) round-trip to ~1 mm, not exactly:
            # the 2-D Helmert convention drops ellipsoidal height on each
            # leg (PROJ behaves identically); everything else is sub-nm.
            tol = 5e-8 if code == "epsg:27700" else 1e-9
            np.testing.assert_allclose(lng2, lng, atol=tol, err_msg=code)
            np.testing.assert_allclose(lat2, lat, atol=tol, err_msg=code)

    def test_scale_at_standard_parallels(self):
        """Conformal projections have unit scale on their standard
        parallels (k0 on a TM central meridian): measured numerically
        against the ellipsoid's meridian arc."""
        from yirgacheffe_spark import reprojection as R

        def meridian_scale(proj, ell, lng, lat):
            d = 1e-5
            x1, y1 = proj.forward(np.array([lng]), np.array([lat - d / 2]))
            x2, y2 = proj.forward(np.array([lng]), np.array([lat + d / 2]))
            grid = float(np.hypot(x2 - x1, y2 - y1)[0])
            s = math.sin(math.radians(lat))
            m_rad = ell.a * (1 - ell.e2) / (1 - ell.e2 * s * s) ** 1.5
            return grid / (m_rad * math.radians(d))

        import math

        lcc = R._projection_for(self._crs("epsg:2154"))
        for sp in (44.0, 49.0):
            assert abs(meridian_scale(lcc, R._ELL_GRS80, 3.0, sp) - 1.0) < 1e-7

        ps = R._projection_for(self._crs("epsg:3413"))
        assert abs(meridian_scale(ps, R._ELL_WGS84, -45.0, 70.0) - 1.0) < 1e-7
        ps_s = R._projection_for(self._crs("epsg:3031"))
        assert abs(meridian_scale(ps_s, R._ELL_WGS84, 0.0, -71.0) - 1.0) < 1e-7

        tm = R._TM(R._ELL_AIRY1830, -2.0, 49.0, 0.9996012717, 400_000.0,
                   -100_000.0)
        assert abs(meridian_scale(tm, R._ELL_AIRY1830, -2.0, 52.0)
                   - 0.9996012717) < 1e-7

    def test_helmert_exact_inverse_and_magnitude(self):
        from yirgacheffe_spark import reprojection as R

        lng = np.array([-0.1278]); lat = np.array([51.5074])
        l2, p2 = R._datum_wgs84_to_local(R._ELL_AIRY1830, R._HELMERT_OSGB36, lng, lat)
        l3, p3 = R._datum_local_to_wgs84(R._ELL_AIRY1830, R._HELMERT_OSGB36, l2, p2)
        # ~1 mm asymmetry from the 2-D convention (height dropped per leg);
        # the XYZ-level Helmert inverse itself is exact (checked below).
        np.testing.assert_allclose(l3, lng, atol=1e-7)
        np.testing.assert_allclose(p3, lat, atol=1e-7)
        xyz = R._geodetic_to_geocentric(R._ELL_WGS84, lng, lat)
        np.testing.assert_allclose(
            R._HELMERT_OSGB36.inverse(R._HELMERT_OSGB36.apply(xyz)), xyz,
            atol=1e-9)
        # The OSGB36<->WGS84 shift is ~100+ m over Britain — the datum shift
        # must actually move the point (guards against a silent no-op).
        moved = (abs(float((l2 - lng)[0])) * 111_000 * 0.62
                 + abs(float((p2 - lat)[0])) * 111_000)
        assert 20 < moved < 400

    def test_separability(self):
        import yirgacheffe_spark as yg
        from yirgacheffe_spark.reprojection import separable_pair

        wgs = yg.MapProjection("epsg:4326", 1.0, -1.0).crs
        assert separable_pair(wgs, yg.MapProjection("epsg:3395", 1.0, -1.0).crs)
        assert not separable_pair(wgs, yg.MapProjection("epsg:27700", 1.0, -1.0).crs)
        assert not separable_pair(wgs, yg.MapProjection("epsg:3413", 1.0, -1.0).crs)

    def test_engine_reproject_from_27700(self, spark):
        """A raster stored on the British grid reprojects to lat/lng through
        the engine's non-separable 2-D gather and agrees with a direct
        numpy gather through the same transform."""
        import yirgacheffe_spark as yg
        from yirgacheffe_spark.reprojection import transform_points

        rng = np.random.default_rng(8)
        data = rng.integers(0, 100, (40, 40)).astype(np.int32)
        bng = yg.MapProjection("epsg:27700", 1000.0, -1000.0)
        src = yg.from_array(data, (400000.0, 200000.0), bng)
        tgt = yg.MapProjection("epsg:4326", 0.005, -0.005)
        rl = yg.ReprojectedLayer(src, tgt, "nearest")
        w = rl.window
        got = rl.read_array(0, 0, w.xsize, w.ysize)
        # independent gather
        area = rl.area
        tx = area.left + (np.arange(w.xsize) + 0.5) * 0.005
        ty = area.top - (np.arange(w.ysize) + 0.5) * 0.005
        gx, gy = np.meshgrid(tx, ty)
        sx, sy = transform_points(tgt.crs, bng.crs, gx.ravel(), gy.ravel())
        cols = np.floor((sx - 400000.0) / 1000.0).astype(int).reshape(gy.shape)
        rows = np.floor((sy - 200000.0) / -1000.0).astype(int).reshape(gy.shape)
        valid = (cols >= 0) & (cols < 40) & (rows >= 0) & (rows < 40)
        want = np.zeros_like(got)
        want[valid] = data[rows[valid], cols[valid]]
        np.testing.assert_array_equal(got, want)


class TestRegisterCrs:
    """User-parameterized CRS registration: any TM/LCC/stereo/Mercator
    national grid from its published parameters, no code change — the
    no-GDAL counterpart of the reference accepting every GDAL-known CRS
    (``_datatypes/area.py:315-364``)."""

    def _wgs(self):
        import yirgacheffe_spark as yg

        return yg.MapProjection("epsg:4326", 1.0, -1.0).crs

    def test_nztm_round_trip_and_anchor(self):
        """EPSG:2193 (NZTM2000, published params: GRS80, lat0=0, lon0=173,
        k0=0.9996, FE=1.6e6, FN=1e7): registered from parameters, the
        false origin anchors exactly and round trips are sub-nm."""
        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        R.register_crs("epsg:2193", "transverse_mercator", "grs80",
                       lon0=173.0, k0=0.9996,
                       false_easting=1_600_000.0, false_northing=10_000_000.0)
        crs = yg.MapProjection("epsg:2193", 1.0, -1.0).crs
        proj = R._projection_for(crs)
        e, n = proj.forward(np.array([173.0]), np.array([0.0]))
        assert abs(e[0] - 1_600_000.0) < 1e-6 and abs(n[0] - 10_000_000.0) < 1e-6

        rng = np.random.default_rng(11)
        lng = rng.uniform(166.0, 179.0, 60)
        lat = rng.uniform(-47.5, -34.0, 60)
        x, y = R.transform_points(self._wgs(), crs, lng, lat)
        lng2, lat2 = R.transform_points(crs, self._wgs(), x, y)
        np.testing.assert_allclose(lng2, lng, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_statcan_lcc_round_trip(self):
        """EPSG:3347 (Statistics Canada LCC, published params)."""
        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        R.register_crs("epsg:3347", "lambert_conformal_conic_2sp", "grs80",
                       lat0=63.390675, lon0=-91.8666667, sp1=49.0, sp2=77.0,
                       false_easting=6_200_000.0, false_northing=3_000_000.0)
        crs = yg.MapProjection("epsg:3347", 1.0, -1.0).crs
        rng = np.random.default_rng(12)
        lng = rng.uniform(-135.0, -55.0, 60)
        lat = rng.uniform(43.0, 80.0, 60)
        x, y = R.transform_points(self._wgs(), crs, lng, lat)
        lng2, lat2 = R.transform_points(crs, self._wgs(), x, y)
        np.testing.assert_allclose(lng2, lng, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_conus_albers_builtin_and_snyder_anchor(self):
        """epsg:5070 (NAD83 / Conus Albers) is pre-registered; forward
        matches Snyder 1987's worked ellipsoidal Albers example (p. 292:
        Clarke 1866, sp 29.5/45.5, origin 23/-96, point 35/-75 ->
        1,885,472.7 E / 1,535,925.0 N) and CONUS round trips to ~1.5 mm
        (the authalic-latitude series truncation)."""
        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        snyder = R._Albers(R._NAMED_ELLIPSOIDS["clarke1866"],
                           23.0, -96.0, 29.5, 45.5, 0.0, 0.0)
        x, y = snyder.forward(np.array([-75.0]), np.array([35.0]))
        assert abs(x[0] - 1_885_472.7) < 0.1 and abs(y[0] - 1_535_925.0) < 0.1

        crs = yg.MapProjection("epsg:5070", 30.0, -30.0).crs
        rng = np.random.default_rng(15)
        lng = rng.uniform(-125.0, -66.0, 80)
        lat = rng.uniform(24.0, 50.0, 80)
        x, y = R.transform_points(self._wgs(), crs, lng, lat)
        lng2, lat2 = R.transform_points(crs, self._wgs(), x, y)
        np.testing.assert_allclose(lng2, lng, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=5e-8)

    def test_albers_equal_area_property_and_registration(self):
        """A user-registered Albers grid preserves area: the forward
        Jacobian determinant equals M*N*cos(phi) (the ellipsoidal area
        element) everywhere — the defining property, checked numerically
        — and registering 5070's published parameters under a fresh code
        reproduces the built-in bit-for-bit."""
        import math

        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        R.register_crs("epsg:61768", "albers_equal_area", "grs80",
                       lat0=23.0, lon0=-96.0, sp1=29.5, sp2=45.5)
        mine = yg.MapProjection("epsg:61768", 1.0, -1.0).crs
        builtin = yg.MapProjection("epsg:5070", 1.0, -1.0).crs
        rng = np.random.default_rng(16)
        lng = rng.uniform(-125.0, -66.0, 60)
        lat = rng.uniform(24.0, 50.0, 60)
        x1, y1 = R.transform_points(self._wgs(), mine, lng, lat)
        x2, y2 = R.transform_points(self._wgs(), builtin, lng, lat)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)

        proj = R._projection_for(mine)
        ell = R._ELL_GRS80
        h = 1e-6
        x0, y0 = proj.forward(lng, lat)
        xl, yl = proj.forward(lng + h, lat)
        xp, yp = proj.forward(lng, lat + h)
        dxdl = (xl - x0) / math.radians(h)
        dydl = (yl - y0) / math.radians(h)
        dxdp = (xp - x0) / math.radians(h)
        dydp = (yp - y0) / math.radians(h)
        det = np.abs(dxdl * dydp - dydl * dxdp)
        phi = np.radians(lat)
        s = np.sin(phi)
        m_rad = ell.a * (1 - ell.e2) / (1 - ell.e2 * s * s) ** 1.5
        n_rad = ell.a / np.sqrt(1 - ell.e2 * s * s)
        np.testing.assert_allclose(det, m_rad * n_rad * np.cos(phi), rtol=1e-6)

    def test_albers_missing_parallels_raise(self):
        import pytest as _pt

        from yirgacheffe_spark import reprojection as R

        with _pt.raises(ValueError, match="sp1"):
            R.register_crs("epsg:61769", "albers_equal_area", lat0=23.0)

    def test_helmert_registration_matches_builtin_27700(self):
        """Registering the British grid's published parameters (including
        the 7-param OSGB36 Helmert) under a fresh code must reproduce the
        built-in epsg:27700 transform bit-for-bit."""
        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        R.register_crs("epsg:61766", "transverse_mercator",
                       ellipsoid=(6377563.396, 299.3249646),  # Airy 1830
                       lon0=-2.0, lat0=49.0, k0=0.9996012717,
                       false_easting=400_000.0, false_northing=-100_000.0,
                       helmert=(-446.448, 125.157, -542.060,
                                -0.1502, -0.2470, -0.8421, 20.4894))
        mine = yg.MapProjection("epsg:61766", 1.0, -1.0).crs
        builtin = yg.MapProjection("epsg:27700", 1.0, -1.0).crs
        rng = np.random.default_rng(13)
        lng = rng.uniform(-6.0, 1.5, 40)
        lat = rng.uniform(50.0, 58.0, 40)
        x1, y1 = R.transform_points(self._wgs(), mine, lng, lat)
        x2, y2 = R.transform_points(self._wgs(), builtin, lng, lat)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)

    def test_engine_reproject_from_registered_crs(self, spark):
        """End-to-end: a raster stored on a user-registered grid reprojects
        through the engine's 2-D gather and agrees with an independent
        numpy gather through the same transform (mirror of the built-in
        27700 differential)."""
        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        R.register_crs("epsg:2193", "transverse_mercator", "grs80",
                       lon0=173.0, k0=0.9996,
                       false_easting=1_600_000.0, false_northing=10_000_000.0)
        rng = np.random.default_rng(14)
        data = rng.integers(0, 100, (40, 40)).astype(np.int32)
        nztm = yg.MapProjection("epsg:2193", 1000.0, -1000.0)
        src = yg.from_array(data, (1_700_000.0, 5_500_000.0), nztm)
        tgt = yg.MapProjection("epsg:4326", 0.005, -0.005)
        rl = yg.ReprojectedLayer(src, tgt, "nearest")
        w = rl.window
        got = rl.read_array(0, 0, w.xsize, w.ysize)
        area = rl.area
        tx = area.left + (np.arange(w.xsize) + 0.5) * 0.005
        ty = area.top - (np.arange(w.ysize) + 0.5) * 0.005
        gx, gy = np.meshgrid(tx, ty)
        sx, sy = R.transform_points(tgt.crs, nztm.crs, gx.ravel(), gy.ravel())
        cols = np.floor((sx - 1_700_000.0) / 1000.0).astype(int).reshape(gy.shape)
        rows = np.floor((sy - 5_500_000.0) / -1000.0).astype(int).reshape(gy.shape)
        valid = (cols >= 0) & (cols < 40) & (rows >= 0) & (rows < 40)
        want = np.zeros_like(got)
        want[valid] = data[rows[valid], cols[valid]]
        np.testing.assert_array_equal(got, want)

    def test_bad_inputs_raise(self):
        import pytest as _pt

        from yirgacheffe_spark import reprojection as R

        with _pt.raises(ValueError, match="ellipsoid"):
            R.register_crs("epsg:61767", "mercator", "not_an_ellipsoid")
        with _pt.raises(ValueError, match="sp1"):
            R.register_crs("epsg:61767", "lambert_conformal_conic_2sp")
        with _pt.raises(ValueError, match="lat_ts"):
            R.register_crs("epsg:61767", "polar_stereographic")
        with _pt.raises(ValueError, match="projection kind"):
            R.register_crs("epsg:61767", "oblique_mercator", lon0=0.0)


class TestSinusoidal:
    """Sinusoidal family (Snyder section 30): the MODIS land grid
    (sphere) and ESRI:54008 World Sinusoidal (WGS84 ellipsoid)."""

    def _wgs(self):
        import yirgacheffe_spark as yg

        return yg.MapProjection("epsg:4326", 1.0, -1.0).crs

    def test_modis_grid_constants_and_round_trip(self):
        """crs:modis_sinusoidal (the authalic-sphere MODIS land grid)
        reproduces the published half-width (pi*R = 20015109.355 m; the
        MODIS docs round to 20015109.354) and round trips to double
        precision; esri:53008 is the DIFFERENT 6371000 m ESRI sphere."""
        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        crs = yg.MapProjection("crs:modis_sinusoidal", 1000.0, -1000.0).crs
        proj = R._projection_for(crs)
        x, _ = proj.forward(np.array([180.0 - 1e-12]), np.array([0.0]))
        assert abs(x[0] - 20015109.354) < 5e-3
        # equator: x = R * lam exactly; central meridian: y = R * phi
        x0, y0 = proj.forward(np.array([90.0]), np.array([0.0]))
        assert abs(x0[0] - 6371007.181 * np.pi / 2) < 1e-6
        _, y1 = proj.forward(np.array([0.0]), np.array([45.0]))
        assert abs(y1[0] - 6371007.181 * np.pi / 4) < 1e-6

        # ESRI:53008 must use ESRI's GCS_Sphere radius, not the MODIS one
        esri = R._projection_for(
            yg.MapProjection("esri:53008", 1000.0, -1000.0).crs)
        xe, _ = esri.forward(np.array([180.0 - 1e-12]), np.array([0.0]))
        assert abs(xe[0] - 6371000.0 * np.pi) < 5e-3

        rng = np.random.default_rng(21)
        lng = rng.uniform(-179.0, 179.0, 100)
        lat = rng.uniform(-85.0, 85.0, 100)
        x, y = R.transform_points(self._wgs(), crs, lng, lat)
        lng2, lat2 = R.transform_points(crs, self._wgs(), x, y)
        np.testing.assert_allclose(lng2, lng, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_ellipsoidal_equal_area_property(self):
        """ESRI:54008 (WGS84 ellipsoid): the forward Jacobian determinant
        equals M*N*cos(phi) everywhere — sinusoidal is equal-area by
        construction, which pins both the meridian-arc series and the
        parallel scaling."""
        import math

        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        crs = yg.MapProjection("esri:54008", 1000.0, -1000.0).crs
        proj = R._projection_for(crs)
        ell = R._ELL_WGS84
        rng = np.random.default_rng(22)
        lng = rng.uniform(-170.0, 170.0, 80)
        lat = rng.uniform(-80.0, 80.0, 80)
        h = 1e-6
        x0, y0 = proj.forward(lng, lat)
        xl, yl = proj.forward(lng + h, lat)
        xp, yp = proj.forward(lng, lat + h)
        dxdl = (xl - x0) / math.radians(h)
        dydl = (yl - y0) / math.radians(h)
        dxdp = (xp - x0) / math.radians(h)
        dydp = (yp - y0) / math.radians(h)
        det = np.abs(dxdl * dydp - dydl * dxdp)
        phi = np.radians(lat)
        s = np.sin(phi)
        m_rad = ell.a * (1 - ell.e2) / (1 - ell.e2 * s * s) ** 1.5
        n_rad = ell.a / np.sqrt(1 - ell.e2 * s * s)
        np.testing.assert_allclose(det, m_rad * n_rad * np.cos(phi), rtol=1e-5)
        # ellipsoidal round trip
        lng2, lat2 = proj.inverse(x0, y0)
        np.testing.assert_allclose(lng2, lng, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_user_registered_modis_matches_builtin(self):
        """register_crs('sinusoidal', 'authalic_sphere') reproduces the
        built-in sphere grid bit-for-bit — the MODIS-grid user path."""
        import yirgacheffe_spark as yg
        from yirgacheffe_spark import reprojection as R

        R.register_crs("epsg:61770", "sinusoidal", "authalic_sphere")
        mine = yg.MapProjection("epsg:61770", 1.0, -1.0).crs
        builtin = yg.MapProjection("crs:modis_sinusoidal", 1.0, -1.0).crs
        rng = np.random.default_rng(23)
        lng = rng.uniform(-179.0, 179.0, 50)
        lat = rng.uniform(-85.0, 85.0, 50)
        x1, y1 = R.transform_points(self._wgs(), mine, lng, lat)
        x2, y2 = R.transform_points(self._wgs(), builtin, lng, lat)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
