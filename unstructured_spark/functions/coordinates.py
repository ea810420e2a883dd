"""Coordinate systems & affine conversion (reference
``documents/coordinates.py:1-113``, ``elements.py:760-787``).

A coordinate system is (name, width, height, orientation). Conversion
between systems is pure per-point arithmetic → native Column math over
the ``coordinates`` struct (SURVEY §1.3: "pure math → native column
arithmetic"), no UDF.

Orientations (reference coordinates.py): screen/pixel space has y
growing downward from the top-left; cartesian/point space has y growing
upward from the bottom-left. Relative space is the unit square.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CoordinateSystem:
    name: str
    width: float
    height: float
    y_down: bool  # True: screen orientation; False: cartesian

    def scaled(self) -> bool:
        return not (self.width == 1.0 and self.height == 1.0)


def PixelSpace(width: float, height: float) -> CoordinateSystem:
    return CoordinateSystem("PixelSpace", width, height, y_down=True)


def PointSpace(width: float, height: float) -> CoordinateSystem:
    return CoordinateSystem("PointSpace", width, height, y_down=False)


RelativeCoordinateSystem = CoordinateSystem(
    "RelativeCoordinateSystem", 1.0, 1.0, y_down=False
)


def convert_point(
    x: Column, y: Column, src: CoordinateSystem, dst: CoordinateSystem
) -> tuple[Column, Column]:
    """(x, y) in `src` → (x, y) in `dst`: normalize to the relative unit
    square (flipping y for y-down systems), then scale out."""
    rel_x = x / F.lit(src.width)
    rel_y = (
        (F.lit(src.height) - y) / F.lit(src.height)
        if src.y_down
        else y / F.lit(src.height)
    )
    out_x = rel_x * F.lit(dst.width)
    out_y = (
        F.lit(dst.height) - rel_y * F.lit(dst.height)
        if dst.y_down
        else rel_y * F.lit(dst.height)
    )
    return out_x, out_y


def convert_coordinates_column(
    df: DataFrame,
    dst: CoordinateSystem,
    *,
    coordinates: str = "coordinates",
) -> DataFrame:
    """Rewrite the ``coordinates`` struct of the element schema into the
    target system (reference Element.convert_coordinates_to_new_system,
    elements.py:760-787). Source width/height/orientation come from the
    struct itself; all arithmetic stays in whole-stage codegen."""
    c = F.col(coordinates)
    src_w = c["layout_width"]
    src_h = c["layout_height"]
    # stored systems are named; PixelSpace is the only y-down one
    src_is_y_down = c["system"] == "PixelSpace"
    rel_x = lambda p: p["x"] / src_w  # noqa: E731
    rel_y = lambda p: F.when(  # noqa: E731
        src_is_y_down, (src_h - p["y"]) / src_h
    ).otherwise(p["y"] / src_h)
    if dst.y_down:
        out_y = lambda p: F.lit(dst.height) * (1 - rel_y(p))  # noqa: E731
    else:
        out_y = lambda p: F.lit(dst.height) * rel_y(p)  # noqa: E731
    new_points = F.transform(
        c["points"],
        lambda p: F.struct(
            (rel_x(p) * F.lit(dst.width)).alias("x"), out_y(p).alias("y")
        ),
    )
    new_struct = F.when(
        c.isNotNull(),
        F.struct(
            new_points.alias("points"),
            F.lit(dst.name).alias("system"),
            F.lit(float(dst.width)).alias("layout_width"),
            F.lit(float(dst.height)).alias("layout_height"),
        ),
    )
    return df.withColumn(coordinates, new_struct)
