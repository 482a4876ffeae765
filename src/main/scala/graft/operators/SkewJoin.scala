package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join (SURVEY.md §2.8 / the 100 TB checklist):
  * when one join key carries a disproportionate share of the fact
  * rows, a plain shuffle join puts that key's entire volume in one
  * task. Salting splits it: the fact side gets a deterministic salt
  * in [0, salts), the dimension side is replicated once per salt,
  * and the join key becomes (key, salt) — the hot key now spreads
  * over `salts` tasks. AQE's skew-split handles moderate skew
  * automatically; explicit salting is for the pathological keys AQE
  * can't subdivide (single-key hash partitions).
  */
object SkewJoin {

  /** Inner equi-join of `fact` (big, possibly skewed) with `dim`
    * (smaller, replicated) on `key`, salted `salts` ways. The salt
    * is a deterministic hash of the whole fact row, so results are
    * reproducible. Semantics identical to fact.join(dim, key). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
