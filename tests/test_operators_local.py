"""Golden-oracle tests: every operator against the raw numpy expression,
evaluated through the engine's fused kernel (driver-side, one tile).

Mirrors the reference's tests/unit/test_operators.py strategy."""

import numpy as np
import pytest

import yirgacheffe_spark as yg
from yirgacheffe_spark import DataType
from yirgacheffe_spark.plans.kernel import evaluate_window

PROJ = yg.MapProjection("epsg:4326", 0.02, -0.02)
RNG = np.random.default_rng(seed=42)


def L(data, origin=(10.0, 50.0), name=None):
    return yg.from_array(np.asarray(data), origin, PROJ, name)


A = RNG.uniform(1.0, 100.0, (10, 10))
B = RNG.uniform(1.0, 100.0, (10, 10))
AI = RNG.integers(1, 100, (10, 10)).astype(np.int32)
BI = RNG.integers(1, 100, (10, 10)).astype(np.int32)


BINARY_CASES = [
    (lambda x, y: x + y, A, B),
    (lambda x, y: x - y, A, B),
    (lambda x, y: x * y, A, B),
    (lambda x, y: x / y, A, B),
    (lambda x, y: x // y, A, B),
    (lambda x, y: x % y, A, B),
    (lambda x, y: x**y, A / 50, B / 50),
    (lambda x, y: x == y, AI, BI),
    (lambda x, y: x != y, AI, BI),
    (lambda x, y: x < y, A, B),
    (lambda x, y: x <= y, A, B),
    (lambda x, y: x > y, A, B),
    (lambda x, y: x >= y, A, B),
    (lambda x, y: x & y, AI, BI),
    (lambda x, y: x | y, AI, BI),
    (lambda x, y: x << y, AI, BI % 4),
    (lambda x, y: x >> y, AI, BI % 4),
]


@pytest.mark.parametrize("fn,lhs,rhs", BINARY_CASES)
def test_binary_layer_layer(fn, lhs, rhs):
    got = evaluate_window(fn(L(lhs), L(rhs)))
    np.testing.assert_array_equal(got, fn(lhs, rhs))


@pytest.mark.parametrize("fn,lhs,rhs", BINARY_CASES)
def test_binary_layer_scalar(fn, lhs, rhs):
    scalar = rhs.flat[0].item()
    got = evaluate_window(fn(L(lhs), scalar))
    np.testing.assert_array_equal(got, fn(lhs, scalar))


REVERSE_CASES = [
    (lambda s, x: s + x, 3.5, A),
    (lambda s, x: s - x, 3.5, A),
    (lambda s, x: s * x, 3.5, A),
    (lambda s, x: s / x, 3.5, A),
    (lambda s, x: s // x, 300.5, A),
    (lambda s, x: s % x, 300.5, A),
    (lambda s, x: s**x, 1.01, A / 50),
]


@pytest.mark.parametrize("fn,scalar,arr", REVERSE_CASES)
def test_reverse_scalar_layer(fn, scalar, arr):
    got = evaluate_window(fn(scalar, L(arr)))
    np.testing.assert_array_equal(got, fn(scalar, arr))


UNARY_CASES = [
    (lambda x: -x, A),
    (lambda x: +x, A),
    (lambda x: x.abs(), A - 50),
    (lambda x: x.floor(), A),
    (lambda x: x.round(), A),
    (lambda x: x.ceil(), A),
    (lambda x: x.log(), A),
    (lambda x: x.log2(), A),
    (lambda x: x.log10(), A),
    (lambda x: x.exp(), A / 20),
    (lambda x: x.exp2(), A / 20),
]

UNARY_NUMPY = [np.negative, np.positive, np.abs, np.floor, np.round, np.ceil,
               np.log, np.log2, np.log10, np.exp, np.exp2]


@pytest.mark.parametrize("case,npfn", list(zip(UNARY_CASES, UNARY_NUMPY)))
def test_unary(case, npfn):
    fn, arr = case
    got = evaluate_window(fn(L(arr)))
    np.testing.assert_allclose(got, npfn(arr))


def test_module_level_functions_match_methods():
    assert np.array_equal(evaluate_window(yg.log(L(A))), np.log(A))
    assert np.array_equal(evaluate_window(yg.abs(L(A - 50))), np.abs(A - 50))
    assert np.array_equal(evaluate_window(yg.clip(L(A), min=20, max=60)), np.clip(A, 20, 60))


def test_isnan_and_nan_to_num():
    data = A.copy()
    data[2, 3] = np.nan
    data[4, 5] = np.inf
    got = evaluate_window(L(data).isnan())
    np.testing.assert_array_equal(got, np.isnan(data))
    got2 = evaluate_window(L(data).nan_to_num(nan=-1, posinf=999))
    np.testing.assert_array_equal(got2, np.nan_to_num(data, nan=-1, posinf=999))


def test_isin():
    got = evaluate_window(L(AI).isin([1, 5, 7, 11]))
    np.testing.assert_array_equal(got, np.isin(AI, [1, 5, 7, 11]))


def test_clip():
    got = evaluate_window(L(A).clip(min=25.0, max=75.0))
    np.testing.assert_array_equal(got, np.clip(A, 25.0, 75.0))


def test_where_layers_and_scalars():
    cond, x, y = L(AI % 2), L(A), L(B)
    np.testing.assert_array_equal(
        evaluate_window(yg.where(cond, x, y)), np.where(AI % 2, A, B)
    )
    np.testing.assert_array_equal(
        evaluate_window(yg.where(cond, 1, 0)), np.where(AI % 2, 1, 0)
    )


def test_minimum_maximum():
    np.testing.assert_array_equal(evaluate_window(yg.minimum(L(A), L(B))), np.minimum(A, B))
    np.testing.assert_array_equal(evaluate_window(yg.maximum(L(A), L(B))), np.maximum(A, B))


def test_logical_ops():
    x, y = AI % 2, BI % 3
    np.testing.assert_array_equal(
        evaluate_window(L(x).logical_and(L(y))), np.logical_and(x, y)
    )
    np.testing.assert_array_equal(
        evaluate_window(L(x).logical_or(L(y))), np.logical_or(x, y)
    )
    np.testing.assert_array_equal(
        evaluate_window(L(x).logical_xor(L(y))), np.logical_xor(x, y)
    )
    np.testing.assert_array_equal(evaluate_window(L(x).logical_not()), np.logical_not(x))


def test_astype():
    expr = L(A).as_type(DataType.Int32)
    assert expr.datatype == DataType.Int32
    np.testing.assert_array_equal(evaluate_window(expr), A.astype(np.int32))


def test_conv2d_matches_direct_cross_correlation():
    k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float32)
    got = evaluate_window(L(A).conv2d(k))
    padded = np.pad(A, 1)
    want = np.zeros_like(A)
    for i in range(A.shape[0]):
        for j in range(A.shape[1]):
            want[i, j] = np.sum(padded[i : i + 3, j : j + 3] * k.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_nary_sum_any_all():
    layers = [L(A), L(B), L(A * 2)]
    np.testing.assert_allclose(evaluate_window(yg.sum(layers)), A + B + A * 2)
    masks = [L(AI % 2), L(BI % 2)]
    np.testing.assert_array_equal(
        evaluate_window(yg.any(masks)), (AI % 2 != 0) | (BI % 2 != 0)
    )
    np.testing.assert_array_equal(
        evaluate_window(yg.all(masks)), (AI % 2 != 0) & (BI % 2 != 0)
    )
    with pytest.raises(ValueError):
        yg.sum([])


def test_result_datatype_coercion():
    assert (L(AI) + L(BI)).datatype == DataType.Int32
    assert (L(AI) + L(A)).datatype == DataType.Float64
    assert (L(AI.astype(np.uint8)) + L(BI.astype(np.int16))).datatype == DataType.Int16
    assert (L(A) + 1).datatype == DataType.Float64


def test_numpy_nonscalar_operand_rejected():
    with pytest.raises(ValueError):
        _ = L(A) + np.ones(3)


def test_zero_dim_numpy_scalar_lifted():
    got = evaluate_window(L(A) + np.float64(2.0))
    np.testing.assert_array_equal(got, A + 2.0)


def test_conv2d_integer_fast_path_bit_identical():
    """Integer data + integer-valued weights take the exact box/shifted-add
    fast path; with every product and partial sum an exactly-representable
    float64 integer the result must be BIT-identical to the einsum form
    (order-free arithmetic), for uniform and general kernels, all small
    int dtypes, and int64 (which skips the cumsum box)."""
    import numpy as np

    from yirgacheffe_spark.operators import _conv2d

    def einsum_ref(data, weights):
        view = np.lib.stride_tricks.sliding_window_view(data, weights.shape)
        return np.einsum("ijkl,kl->ij", view, weights.astype(np.float64))

    rng = np.random.default_rng(9)
    kernels = [
        np.ones((5, 5), dtype=np.float32),
        np.ones((3, 3), dtype=np.float64) * 4,
        rng.integers(-3, 4, (3, 5)).astype(np.float64),
        np.array([[0, 1], [2, 0]], dtype=np.float32),
    ]
    for dt in (np.int16, np.int32, np.uint8, np.int64):
        lo, hi = (0, 200) if dt == np.uint8 else (-900, 900)
        data = rng.integers(lo, hi, (40, 37)).astype(dt)
        for w in kernels:
            got = _conv2d(data, w)
            ref = einsum_ref(data, w)
            assert np.array_equal(got, ref), (dt, w.shape)
    # Float data must keep the einsum path (order-sensitive sums).
    fdata = rng.random((20, 20)).astype(np.float64)
    w = rng.random((3, 3))
    assert np.array_equal(_conv2d(fdata, w), einsum_ref(fdata, w))
