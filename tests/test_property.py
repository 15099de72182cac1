"""Property-based tests (hypothesis): random expression trees over random
arrays must evaluate bit-identically to direct numpy, through the local
kernel (the same code path the Spark kernels run per tile)."""

import numpy as np
from hypothesis import given, settings, strategies as st

import yirgacheffe_spark as yg
from yirgacheffe_spark.plans.kernel import evaluate_window

PROJ = yg.MapProjection("epsg:4326", 0.02, -0.02)
H, W = 6, 9


def _arrays(draw, n):
    out = []
    for i in range(n):
        vals = draw(
            st.lists(
                st.integers(min_value=-50, max_value=50),
                min_size=H * W, max_size=H * W,
            )
        )
        out.append(np.array(vals, dtype=np.float64).reshape(H, W))
    return out


_BINOPS = [
    ("add", lambda a, b: a + b),
    ("sub", lambda a, b: a - b),
    ("mul", lambda a, b: a * b),
    ("min", lambda a, b: np.minimum(a, b) if isinstance(a, np.ndarray) else a),
    ("gt_mul", lambda a, b: (a > b) * a),
]

_UNARY = [
    ("abs", lambda a: abs(a)),
    ("neg", lambda a: -a),
    ("clip", None),  # special-cased
    ("plus3", lambda a: a + 3),
    ("times2", lambda a: a * 2),
]


@st.composite
def _expr_case(draw):
    arrays = _arrays(draw, draw(st.integers(min_value=2, max_value=3)))
    ops = draw(
        st.lists(st.integers(min_value=0, max_value=len(_BINOPS) - 1),
                 min_size=1, max_size=4)
    )
    unaries = draw(
        st.lists(st.integers(min_value=0, max_value=len(_UNARY) - 1),
                 min_size=0, max_size=2)
    )
    return arrays, ops, unaries


@given(_expr_case())
@settings(max_examples=60, deadline=None)
def test_random_expression_matches_numpy(case):
    arrays, ops, unaries = case
    layers = [yg.from_array(a, (10.0, 50.0), PROJ) for a in arrays]

    expr = layers[0]
    want = arrays[0]
    for j, op_i in enumerate(ops):
        other_i = (j + 1) % len(arrays)
        name, fn = _BINOPS[op_i]
        if name == "min":
            expr = yg.minimum(expr, layers[other_i])
            want = np.minimum(want, arrays[other_i])
        elif name == "gt_mul":
            expr = (expr > layers[other_i]) * expr
            want = (want > arrays[other_i]) * want
        else:
            expr = fn(expr, layers[other_i])
            want = fn(want, arrays[other_i])
    for u_i in unaries:
        name, fn = _UNARY[u_i]
        if name == "clip":
            expr = yg.clip(expr, min=-10, max=10)
            want = np.clip(want, -10, 10)
        elif name == "abs":
            expr = expr.abs()
            want = np.abs(want)
        else:
            expr = fn(expr)
            want = fn(want)

    got = evaluate_window(expr)
    np.testing.assert_array_equal(got, want)


@given(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=40))
@settings(max_examples=40, deadline=None)
def test_union_extent_zero_fills_exactly(dx, dy):
    """Shifted ADD must equal the manual union computation for ANY offset:
    the overlap adds, the fringes pass through one side."""
    rng = np.random.default_rng(dx * 100 + dy)
    a = rng.integers(0, 9, (8, 10)).astype(np.float64)
    b = rng.integers(0, 9, (8, 10)).astype(np.float64)
    la = yg.from_array(a, (0.0, 0.0), PROJ)
    lb = yg.from_array(b, (dx * 0.02, -dy * 0.02), PROJ)
    got = evaluate_window(la + lb)
    h, w = 8 + dy, 10 + dx
    want = np.zeros((max(h, 8), max(w, 10)))
    want[:8, :10] += a
    want[dy : dy + 8, dx : dx + 10] += b
    np.testing.assert_array_equal(got, want)


@given(st.integers(min_value=2, max_value=6))
@settings(max_examples=20, deadline=None)
def test_reproject_sum_preserves_total_any_factor(f):
    """Sum-resampling at ANY integer factor conserves the total."""
    rng = np.random.default_rng(f)
    n = f * 6
    data = rng.integers(0, 9, (n, n)).astype(np.float64)
    src = yg.from_array(data, (0.0, 0.0), PROJ)
    coarse = yg.MapProjection("epsg:4326", 0.02 * f, -0.02 * f)
    out = yg.ReprojectedLayer(src, coarse, "sum").read_array(0, 0, 6, 6)
    assert out.sum() == data.sum()


def test_crs_round_trips_fuzz():
    """Hypothesis fuzz: every registered projected CRS round-trips random
    in-domain coordinates through the geographic hub."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    import yirgacheffe_spark as yg
    from yirgacheffe_spark.reprojection import transform_points

    wgs = yg.MapProjection("epsg:4326", 1.0, -1.0).crs
    domains = {
        "epsg:27700": ((-7.0, 2.0), (49.5, 59.0), 5e-8),
        "epsg:2154": ((-5.0, 9.0), (41.0, 51.5), 1e-9),
        "epsg:3413": ((-180.0, 180.0), (55.0, 89.9), 1e-9),
        "epsg:3031": ((-180.0, 180.0), (-89.9, -55.0), 1e-9),
        "epsg:3395": ((-179.9, 179.9), (-84.0, 84.0), 1e-9),
        "epsg:32633": ((9.0, 21.0), (-75.0, 80.0), 1e-9),
    }

    @settings(max_examples=60, deadline=None)
    @given(
        code=st.sampled_from(sorted(domains)),
        u=st.floats(0.0, 1.0), v=st.floats(0.0, 1.0),
    )
    def check(code, u, v):
        (x0, x1), (y0, y1), tol = domains[code]
        lng = np.array([x0 + (x1 - x0) * u])
        lat = np.array([y0 + (y1 - y0) * v])
        crs = yg.MapProjection(code, 1.0, -1.0).crs
        px, py = transform_points(wgs, crs, lng, lat)
        lng2, lat2 = transform_points(crs, wgs, px, py)
        # longitudes compare modulo 360 (+-180 is one meridian)
        dlng = (float(lng2[0] - lng[0]) + 180.0) % 360.0 - 180.0
        assert abs(dlng) < tol, (code, lng[0], lat[0])
        assert abs(float(lat2[0] - lat[0])) < tol, (code, lng[0], lat[0])

    check()
