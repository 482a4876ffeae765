package graft

import org.apache.spark.sql.SparkSession

/** Working directories for the SIDE-EFFECTING queries (persisted
  * index builds, SCD2 merges, profile stores): keyed by the input
  * dir AND the running SparkSession, so two concurrent sessions
  * benching the same sf directory cannot race each other's
  * delete/rebuild of a shared path. The session component is the
  * application id plus the session object's identity hash — unique
  * per SparkSession within and across JVMs on the same host; the
  * dir component keeps paths stable WITHIN a session so a query's
  * own marker/idempotence machinery still engages across repeat
  * invocations (the wipe-then-rebuild queries rely on that).
  */
object TmpPaths {
  def workDir(spark: SparkSession, tag: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${tag}_" +
      java.lang.Integer.toHexString(dir.hashCode) + "_" +
      spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9_-]", "") +
      "_" + java.lang.Integer.toHexString(System.identityHashCode(spark))
}
