package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P11: `int_to_rgb` (`gst-detection-tf.py:324-329`) as pure Catalyst
  * column expressions — codegen'd bit-twiddling, no UDF. Semantics:
  * num = trunc(id / 80 * 255); r = num & 255; g = (num >> 8) & 255;
  * b = (num >> 16) & 255. */
object ColorFunctions {
  private def num(labelId: Column): Column =
    (labelId.cast("double") / 80.0 * 255.0).cast("int")

  def rgbR(labelId: Column): Column = num(labelId).bitwiseAND(lit(255))
  def rgbG(labelId: Column): Column =
    shiftright(num(labelId), 8).bitwiseAND(lit(255))
  def rgbB(labelId: Column): Column =
    shiftright(num(labelId), 16).bitwiseAND(lit(255))
}
