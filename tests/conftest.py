import numpy as np
import pytest

import yirgacheffe_spark.constants as C


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    session = (
        SparkSession.builder.master("local[4]")
        .appName("yirgacheffe-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture(autouse=True)
def small_tiles(monkeypatch):
    """Force multi-tile plans so tiling/halo/join paths execute in every test."""
    monkeypatch.setattr(C, "TILE_YSIZE", 4)
    monkeypatch.setattr(C, "TILE_XSIZE", 4)
    monkeypatch.setattr(C, "STORAGE_TILE_SIZE", 4)


@pytest.fixture
def wgs84_02():
    from yirgacheffe_spark import MapProjection

    return MapProjection("epsg:4326", 0.02, -0.02)


def make_layer(data, origin=(10.0, 50.0), step=0.02, name=None):
    import yirgacheffe_spark as yg

    proj = yg.MapProjection("epsg:4326", step, -step)
    return yg.from_array(np.asarray(data), origin, proj, name)
