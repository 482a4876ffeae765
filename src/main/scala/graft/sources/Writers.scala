package graft.sources

import org.apache.spark.sql.DataFrame

/** Output layout for detection metadata at scale. A 100 TB run's
  * results are consumed by key-scoped readers ("all boxes of video
  * X"), so the sink partitions by the access key: directory-level
  * partition pruning turns those reads into single-partition scans,
  * and `maxRecordsPerFile` bounds file sizes without an extra
  * repartition shuffle. (The VDMS-shaped store is the streaming
  * sink — streaming/VdmsSink.scala; this is the lakehouse path.)
  */
object Writers {
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 1000000L,
      mode: String = "overwrite"): Unit =
    df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
