package graft

import java.nio.file.Files
import graft.sources.{Formats, Tables}

/** S1 breadth: the same table round-trips through every supported
  * format with a declared schema. */
class FormatsSpec extends SparkTestBase {

  test("nation round-trips through parquet, orc, json and csv") {
    val nation = Tables.nation(spark, sf)
    val expected = nation.collect().map(_.toString).sorted.toSeq
    Formats.Supported.foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft-fmt-$fmt-").toString
      Formats.write(nation, dir, fmt)
      val back = Formats.read(spark, dir, fmt, nation.schema)
      assert(back.collect().map(_.toString).sorted.toSeq === expected,
        s"round-trip mismatch for $fmt")
    }
    intercept[IllegalArgumentException](
      Formats.read(spark, "/tmp/x", "avro-nope", nation.schema))
  }
}
