"""API-surface parity: multiband output, GeoJSON vector loading, aliases."""

import json

import numpy as np
import pytest

import yirgacheffe_spark as yg
from yirgacheffe_spark.plans.kernel import evaluate_window

PROJ = yg.MapProjection("epsg:4326", 0.02, -0.02)


def test_save_multiband_roundtrip(spark, tmp_path):
    data = np.arange(48, dtype=np.float64).reshape(6, 8)
    a = yg.from_array(data, (0.0, 0.0), PROJ, "a")
    path = str(tmp_path / "mb")
    yg.save_multiband([a * 1, a * 2, a * 3], path, spark=spark)
    for band in (1, 2, 3):
        layer = yg.read_raster(path, band=band)
        np.testing.assert_array_equal(layer.read_array(0, 0, 8, 6), data * band)


def test_save_multiband_rejects_mixed_dtypes(spark, tmp_path):
    data = np.arange(16, dtype=np.float64).reshape(4, 4)
    a = yg.from_array(data, (0.0, 0.0), PROJ)
    with pytest.raises(ValueError):
        yg.save_multiband([a, a.as_type(yg.DataType.Int32)], str(tmp_path / "x"), spark=spark)


def test_geojson_vector_layer(tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"id_no": 3},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0.0, 0.0], [0.2, 0.0], [0.2, -0.2], [0.0, -0.2], [0.0, 0.0]]],
                },
            },
            {
                "type": "Feature",
                "properties": {"id_no": 9},
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [[[1.0, 0.0], [1.2, 0.0], [1.2, -0.2], [1.0, -0.2], [1.0, 0.0]]]
                    ],
                },
            },
        ],
    }
    path = tmp_path / "polys.geojson"
    path.write_text(json.dumps(doc))
    layer = yg.VectorLayer.layer_from_file(str(path), PROJ, burn_value="id_no")
    got = evaluate_window(layer)
    assert {3.0, 9.0} <= set(np.unique(got))


def test_reference_aliases():
    assert yg.RasterLayer is yg.ParquetRasterLayer
    assert yg.H3CellLayer is yg.CellLayer
