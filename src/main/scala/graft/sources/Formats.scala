package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format breadth beyond parquet: CSV, JSON lines and
  * ORC through one declarative surface. Schemas are always DECLARED
  * on read (the engine's fixed-schema contract, §1.1) — schema
  * inference costs an extra pass at scale and can drift. */
object Formats {
  val Supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  def write(df: DataFrame, path: String, format: String): Unit = {
    require(Supported.contains(format), s"unsupported format: $format")
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def read(spark: SparkSession, path: String, format: String,
      schema: StructType): DataFrame = {
    require(Supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }
}
