package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimension pruning —
  * the storage-side optimization behind "cluster by (a, b)" in modern
  * lakehouse tables: interleaving the bits of two dimension keys makes
  * ranges of the combined value compact in BOTH dimensions, so after
  * a `repartitionByRange(zvalue)` write, every file covers a small
  * rectangle of (a, b) space and parquet min/max stats prune 2-D box
  * queries on EITHER OR BOTH columns — something a single-column sort
  * can only do for its leading column.
  *
  * Everything is codegen'd bitwise arithmetic (shifts, masks, or) on
  * longs — identical in any engine, no UDF; the layout write is one
  * range shuffle, the same cost as any global sort.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions (the
    * classic mask-shift Morton spread: 0bxyzw → 0bx0y0z0w0...). */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit cell coordinates: x on even
    * bits, y on odd bits. */
  def morton(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Quantize a value into `cells` equal-width buckets over
    * [min, max] (clamped): the cell coordinate fed to [[morton]].
    * Bounds are caller-supplied constants (at scale: from table
    * statistics), so the code stays a pure projection. */
  def cell(c: Column, minV: Double, maxV: Double, cells: Int): Column = {
    require(cells > 0 && cells <= 65536, "cells must be in (0, 65536]")
    require(maxV > minV, "max must exceed min")
    least(lit(cells - 1), greatest(lit(0),
      floor((c.cast("double") - minV) * cells / (maxV - minV)).cast("long")))
  }

  /** The z-value column for two dimensions quantized to a 256×256
    * grid. */
  def zValue(x: Column, xMin: Double, xMax: Double,
             y: Column, yMin: Double, yMax: Double,
             cells: Int = 256): Column =
    morton(cell(x, xMin, xMax, cells), cell(y, yMin, yMax, cells))

  /** Rewrite `df` in z-order across `numFiles` range partitions: one
    * range shuffle on the z-value, files sorted internally so parquet
    * row-group stats are tight on BOTH source columns. */
  def layoutZOrdered(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
