"""Compile an expression tree to a Spark plan and run terminal actions.

Physical shape of every computation:

1. **Plan (driver)** — resolve the operation area/window with the reference's
   extent algebra, split the window into a grid of tiles, and classify
   leaves: parquet-backed rasters become DataFrame scans + a *re-tiling*
   equi-join keyed on tile coordinates (Catalyst prunes them by the window's
   tile range, pushed down to parquet row-group stats); everything else
   (in-memory arrays, constants, generated layers) ships inside the kernel
   closure via a broadcast.
2. **Execute (cluster)** — one ``mapInPandas`` kernel per stage evaluates the
   *whole* numpy expression tree per tile (operator fusion, per-tile CSE),
   emitting either result tiles (save / read_array) or per-tile aggregate
   partials (sum/min/max/unique), which Spark combines — the classic
   partial/final two-stage aggregation.

Scale notes: tiles are the unit of parallelism and shuffle keys are tile
coordinates, so plans scale by adding executors; the only shuffle per parquet
leaf is its re-tiling join (none when the source grid aligns 1:1 — the common
case of rasters written by this engine being read back at the same grid);
aggregations move eight bytes per tile.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import constants
from ..dtypes import DataType
from ..grid import Window
from ..operators import LayerOperation
from . import kernel as K
from .session import get_spark

TILE_SCHEMA = "band int, tile_y int, tile_x int, ysize int, xsize int, payload binary"
PARTIAL_SCHEMA = "ty int, tx int, partial double"
# NaN keys travel as an explicit flag: pandas NaN becomes SQL null in the
# Arrow handoff, which would silently merge NaN with genuine nulls.
UNIQUE_SCHEMA = "value double, is_nan boolean, count long"


def _as_root(tree) -> LayerOperation:
    return tree if isinstance(tree, LayerOperation) else LayerOperation(tree)


def _plan_payload(root: LayerOperation):
    """Everything the kernel needs, precomputed on the driver."""
    projection = root.projection
    if projection is None:
        raise ValueError("No map projection")
    area = root.operation_area(projection)
    window = root.window
    ty_size, tx_size = constants.TILE_YSIZE, constants.TILE_XSIZE
    tiles_y = math.ceil(window.ysize / ty_size)
    tiles_x = math.ceil(window.xsize / tx_size)

    leaves = K.collect_parquet_leaves(root)
    paddings = K.collect_leaf_paddings(root)
    slot_meta = []
    for i, leaf in enumerate(leaves):
        leaf._slot_index = i  # noqa: SLF001 — survives pickling with the tree
        axoff, ayoff = leaf.region_pixel_origin(area)
        slot_meta.append(
            {
                "pad": paddings.get(id(leaf), 0),
                "S": leaf.tile_size,
                "ayoff": ayoff,
                "axoff": axoff,
                "np_dtype": leaf.datatype.to_numpy(),
                "nodata": leaf.nodata,
                "ignore_nodata": leaf._ignore_nodata,  # noqa: SLF001
                "path": leaf.path,
                "band": leaf.band,
                "stored_tiles": leaf.stored_tiles,
            }
        )

    shared = frozenset(h for h, c in K.collect_hash_counts(root).items() if c >= 2)
    return {
        "tree": root,
        "area": area,
        "projection": projection,
        "window": window,
        "ty_size": ty_size,
        "tx_size": tx_size,
        "tiles_y": tiles_y,
        "tiles_x": tiles_x,
        "shared_hashes": shared,
        "slot_meta": slot_meta,
        "out_dtype": root.datatype.to_numpy(),
    }


def _retile_join(spark: SparkSession, payload: dict, slot: int,
                 tile_box: tuple[int, int, int, int]) -> DataFrame:
    """Scan one parquet leaf and key its stored tiles by the computation tiles
    they feed (including the leaf's halo margin), grouped per target tile.

    All arithmetic is Spark SQL (JVM-side); the source scan carries tile-range
    predicates that push down to parquet row-group statistics.
    """
    meta = payload["slot_meta"][slot]
    s = meta["S"]
    p = meta["pad"]
    ayoff, axoff = meta["ayoff"], meta["axoff"]
    ty_size, tx_size = payload["ty_size"], payload["tx_size"]
    ty_lo, ty_hi, tx_lo, tx_hi = tile_box
    stored_y, stored_x = meta["stored_tiles"]

    # Leaf pixel range the requested tile box can touch (with halo).
    y_px_lo = ty_lo * ty_size - p + ayoff
    y_px_hi = min((ty_hi + 1) * ty_size, payload["window"].ysize) + p + ayoff
    x_px_lo = tx_lo * tx_size - p + axoff
    x_px_hi = min((tx_hi + 1) * tx_size, payload["window"].xsize) + p + axoff
    sy_lo = max(y_px_lo // s, 0)
    sy_hi = min((y_px_hi - 1) // s, stored_y - 1)
    sx_lo = max(x_px_lo // s, 0)
    sx_hi = min((x_px_hi - 1) // s, stored_x - 1)

    src = (
        spark.read.parquet(meta["path"])
        .where(
            (F.col("band") == meta["band"])
            & F.col("tile_y").between(int(sy_lo), int(sy_hi))
            & F.col("tile_x").between(int(sx_lo), int(sx_hi))
        )
    )
    # Window-space start of each stored tile.
    a_y = F.col("tile_y").cast("long") * s - ayoff
    a_x = F.col("tile_x").cast("long") * s - axoff
    # Computation tiles whose halo-grown window intersects this stored tile.
    first_ty = F.greatest(
        F.lit(ty_lo), (F.floor((a_y - ty_size - p) / ty_size) + 1).cast("int")
    )
    last_ty = F.least(F.lit(ty_hi), F.floor((a_y + F.col("ysize") + p - 1) / ty_size).cast("int"))
    first_tx = F.greatest(
        F.lit(tx_lo), (F.floor((a_x - tx_size - p) / tx_size) + 1).cast("int")
    )
    last_tx = F.least(F.lit(tx_hi), F.floor((a_x + F.col("xsize") + p - 1) / tx_size).cast("int"))

    exploded = (
        src.withColumn("first_ty", first_ty)
        .withColumn("last_ty", last_ty)
        .withColumn("first_tx", first_tx)
        .withColumn("last_tx", last_tx)
        .where((F.col("first_ty") <= F.col("last_ty")) & (F.col("first_tx") <= F.col("last_tx")))
        .select(
            F.explode(F.sequence("first_ty", "last_ty")).alias("ty"),
            F.col("first_tx"),
            F.col("last_tx"),
            F.col("tile_y").alias("sy"),
            F.col("tile_x").alias("sx"),
            F.col("ysize").alias("sh"),
            F.col("xsize").alias("sw"),
            F.col("payload").alias("p"),
        )
        .select(
            "ty",
            F.explode(F.sequence("first_tx", "last_tx")).alias("tx"),
            "sy",
            "sx",
            "sh",
            "sw",
            "p",
        )
    )
    return exploded.groupBy("ty", "tx").agg(
        F.collect_list(F.struct("sy", "sx", "sh", "sw", "p")).alias(f"pieces_{slot}")
    )


def _base_grid(spark: SparkSession, payload: dict,
               tile_box: tuple[int, int, int, int]) -> DataFrame:
    ty_lo, ty_hi, tx_lo, tx_hi = tile_box
    n_y, n_x = ty_hi - ty_lo + 1, tx_hi - tx_lo + 1
    n = n_y * n_x
    parallelism = min(n, spark.sparkContext.defaultParallelism * 2)
    return spark.range(0, n, numPartitions=max(parallelism, 1)).select(
        (F.lit(ty_lo) + (F.col("id") / n_x).cast("int")).alias("ty"),
        (F.lit(tx_lo) + (F.col("id") % n_x).cast("int")).alias("tx"),
    )


def _build(tree, spark: SparkSession | None, sub_window: Window | None = None):
    spark = get_spark(spark)
    root = _as_root(tree)
    payload = _plan_payload(root)

    if sub_window is None:
        tile_box = (0, payload["tiles_y"] - 1, 0, payload["tiles_x"] - 1)
    else:
        ty_size, tx_size = payload["ty_size"], payload["tx_size"]
        tile_box = (
            max(sub_window.yoff // ty_size, 0),
            min((sub_window.ymax - 1) // ty_size, payload["tiles_y"] - 1),
            max(sub_window.xoff // tx_size, 0),
            min((sub_window.xmax - 1) // tx_size, payload["tiles_x"] - 1),
        )

    df = _base_grid(spark, payload, tile_box)
    for slot in range(len(payload["slot_meta"])):
        df = df.join(_retile_join(spark, payload, slot, tile_box), ["ty", "tx"], "left")
    bc = spark.sparkContext.broadcast(payload)
    return spark, root, payload, bc, df


def _assemble_slot(meta: dict, pieces, y0: int, x0: int, h: int, w: int):
    """Paste a tile's joined source pieces into a halo-padded window-space
    array, zero-filled, with NODATA substituted to NaN afterwards (matching
    the reference's pad-then-substitute order, ``rasters.py:343-369``)."""
    p = meta["pad"]
    s = meta["S"]
    dt = meta["np_dtype"]
    oy, ox = y0 - p, x0 - p
    out = np.zeros((h + 2 * p, w + 2 * p), dtype=dt)
    if pieces is not None:
        for piece in pieces:
            ay = piece["sy"] * s - meta["ayoff"]
            ax = piece["sx"] * s - meta["axoff"]
            sh, sw = piece["sh"], piece["sw"]
            iy0, iy1 = max(ay, oy), min(ay + sh, oy + out.shape[0])
            ix0, ix1 = max(ax, ox), min(ax + sw, ox + out.shape[1])
            if iy0 >= iy1 or ix0 >= ix1:
                continue
            data = np.frombuffer(piece["p"], dtype=dt).reshape(sh, sw)
            out[iy0 - oy : iy1 - oy, ix0 - ox : ix1 - ox] = data[
                iy0 - ay : iy1 - ay, ix0 - ax : ix1 - ax
            ]
    if not meta["ignore_nodata"] and meta["nodata"] is not None:
        out = np.where(out == meta["nodata"], float("nan"), out)
    return out, (oy, ox)


def _tile_results(bc, pdf_iter, mode: str):
    """Generator core of every kernel: yields (ty, tx, h, w, result) per tile."""
    payload = bc.value
    ty_size, tx_size = payload["ty_size"], payload["tx_size"]
    window = payload["window"]
    slot_meta = payload["slot_meta"]
    n_slots = len(slot_meta)
    tree = payload["tree"]
    for pdf in pdf_iter:
        for row in pdf.itertuples(index=False):
            ty, tx = int(row.ty), int(row.tx)
            y0, x0 = ty * ty_size, tx * tx_size
            h = min(ty_size, window.ysize - y0)
            w = min(tx_size, window.xsize - x0)
            ctx = K.EvalContext(
                area=payload["area"],
                projection=payload["projection"],
                shared_hashes=payload["shared_hashes"],
            )
            for slot in range(n_slots):
                pieces = getattr(row, f"pieces_{slot}")
                if isinstance(pieces, float) and pd.isna(pieces):
                    pieces = None
                assembled, origin = _assemble_slot(slot_meta[slot], pieces, y0, x0, h, w)
                ctx.slots[slot] = assembled
                ctx.slot_origins[slot] = origin
            result = K.eval_tree(tree, ctx, x0, y0, w, h)
            result = np.asarray(result)
            if result.shape != (h, w):
                result = np.broadcast_to(result, (h, w))
            yield ty, tx, h, w, result


def tiles_dataframe(tree, spark: SparkSession | None = None,
                    sub_window: Window | None = None) -> DataFrame:
    """The computation as a DataFrame of result tiles (the save/read plan)."""
    spark, root, payload, bc, df = _build(tree, spark, sub_window)
    out_dtype = payload["out_dtype"]

    def compute(pdf_iter):
        for ty, tx, h, w, result in _tile_results(bc, pdf_iter, "tiles"):
            yield pd.DataFrame(
                {
                    "band": [1],
                    "tile_y": [ty],
                    "tile_x": [tx],
                    "ysize": [h],
                    "xsize": [w],
                    "payload": [np.ascontiguousarray(result.astype(out_dtype)).tobytes()],
                }
            )

    return df.mapInPandas(compute, schema=TILE_SCHEMA)


def aggregate(tree, stat: str, spark: SparkSession | None = None) -> float:
    """Whole-layer reduction: per-tile partials inside the kernel, combined
    deterministically (sum: float64 promotion per tile, then ordered add —
    preserving the reference's accumulation semantics)."""
    assert stat in ("sum", "min", "max")
    spark, root, payload, bc, df = _build(tree, spark)

    def compute(pdf_iter):
        for ty, tx, _h, _w, result in _tile_results(bc, pdf_iter, stat):
            if stat == "sum":
                partial = float(np.sum(result.astype(np.float64)))
            elif stat == "min":
                partial = float(np.min(result))
            else:
                partial = float(np.max(result))
            yield pd.DataFrame({"ty": [ty], "tx": [tx], "partial": [partial]})

    partials = df.mapInPandas(compute, schema=PARTIAL_SCHEMA)
    if stat == "min":
        row = partials.agg(F.min("partial").alias("v")).collect()[0]
        return float(row["v"])
    if stat == "max":
        row = partials.agg(F.max("partial").alias("v")).collect()[0]
        return float(row["v"])
    # Deterministic float addition order: tile-major, like the strip loop.
    rows = partials.collect()
    total = 0.0
    for r in sorted(rows, key=lambda r: (r["ty"], r["tx"])):
        total += r["partial"]
    return total


def unique(tree, return_counts: bool = False, spark: SparkSession | None = None):
    """Distinct pixel values (optionally with counts): per-tile ``np.unique``
    partials, final combine by key in Spark (NaNs grouped together)."""
    spark, root, payload, bc, df = _build(tree, spark)

    def compute(pdf_iter):
        for _ty, _tx, _h, _w, result in _tile_results(bc, pdf_iter, "unique"):
            values, counts = np.unique(np.asarray(result), return_counts=True)
            values = values.astype(np.float64)
            nan_mask = np.isnan(values)
            yield pd.DataFrame(
                {
                    "value": np.where(nan_mask, 0.0, values),
                    "is_nan": nan_mask,
                    "count": counts.astype(np.int64),
                }
            )

    combined = (
        df.mapInPandas(compute, schema=UNIQUE_SCHEMA)
        .groupBy("value", "is_nan")
        .agg(F.sum("count").alias("count"))
        .collect()
    )
    pairs = sorted(
        ((float("nan") if r["is_nan"] else r["value"], r["count"]) for r in combined),
        key=lambda kv: (math.isnan(kv[0]), kv[0]),
    )
    values = np.array([v for v, _ in pairs])
    if return_counts:
        return values, np.array([c for _, c in pairs], dtype=np.int64)
    return values


def read_array(tree, x: int, y: int, width: int, height: int,
               spark: SparkSession | None = None) -> np.ndarray:
    """Materialise a window of the computation as numpy on the driver.

    Regions outside the computation window read as zeros.  Only the tiles
    overlapping the request are computed (tile-range pruning)."""
    root = _as_root(tree)
    request = Window(x, y, width, height)
    window = root.window
    full = Window(0, 0, window.xsize, window.ysize)
    overlap = Window.intersection_or_none([request, full])
    out_dtype = root.datatype.to_numpy()
    out = np.zeros((height, width), dtype=out_dtype)
    if overlap is None:
        return out
    rows = tiles_dataframe(root, spark, sub_window=overlap).collect()
    ty_size, tx_size = constants.TILE_YSIZE, constants.TILE_XSIZE
    for r in rows:
        tile = np.frombuffer(r["payload"], dtype=out_dtype).reshape(r["ysize"], r["xsize"])
        ty0, tx0 = r["tile_y"] * ty_size, r["tile_x"] * tx_size
        iy0, iy1 = max(ty0, overlap.yoff), min(ty0 + r["ysize"], overlap.ymax)
        ix0, ix1 = max(tx0, overlap.xoff), min(tx0 + r["xsize"], overlap.xmax)
        if iy0 >= iy1 or ix0 >= ix1:
            continue
        out[iy0 - y : iy1 - y, ix0 - x : ix1 - x] = tile[iy0 - ty0 : iy1 - ty0, ix0 - tx0 : ix1 - tx0]
    return out


def save(tree, path: str, and_sum: bool = False, spark: SparkSession | None = None):
    """Write the computation as a parquet raster table (atomic via Spark's
    job-commit protocol), optionally also returning the pixel sum."""
    import os  # pylint: disable=C0415

    from ..sources import parquet as pq_raster  # pylint: disable=C0415

    spark = get_spark(spark)
    root = _as_root(tree)
    if constants.TILE_YSIZE != constants.TILE_XSIZE:
        raise ValueError("save requires square computation tiles")
    result = tiles_dataframe(root, spark)
    if and_sum:
        result = result.persist()
    (
        result.repartition(F.col("tile_y"))
        .sortWithinPartitions("tile_y", "tile_x")
        .write.mode("overwrite")
        .parquet(path)
    )
    os.makedirs(path, exist_ok=True)
    pq_raster.write_meta(
        path,
        root.operation_area(root.projection),
        root.datatype,
        None,
        constants.TILE_YSIZE,
    )
    total = None
    if and_sum:
        rows = result.select("tile_y", "tile_x", "payload").collect()
        dt = root.datatype.to_numpy()
        total = 0.0
        for r in sorted(rows, key=lambda r: (r["tile_y"], r["tile_x"])):
            total += float(np.sum(np.frombuffer(r["payload"], dtype=dt).astype(np.float64)))
        result.unpersist()
    return total
