package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * First line of defense is AQE's runtime skew-join splitting (enabled
  * by default in Spark 4); `saltedEquiJoin` is the explicit fallback for
  * planners that must handle a known-skewed key distribution (e.g. the
  * event graph's handful of event-type authority nodes, or a power-law
  * in-degree at 100 TB): the big side spreads each hot key over `salt`
  * sub-keys, the small side is replicated `salt`×, and the join runs on
  * the compound key — no single reducer sees a whole hot key.
  */
object Skew {

  /** Content-derived salt: a Murmur3 hash of the WHOLE row, mod `salt`.
    * Deterministic under task retry, AQE re-planning and input
    * repartitioning (unlike partition-id/row-position schemes, which can
    * route the same row differently between attempts and break
    * deterministic-output assumptions downstream, e.g. a sink retry
    * double-writing differently-routed rows), and it spreads a hot key
    * as evenly as the row content varies — rows identical in every
    * column collapse onto one replica, which only matters for corpora
    * that are themselves pure duplicates. */
  private[graft] def contentSalt(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(df(_)): _*), lit(salt))

  /** Equi-join `big ⋈ small` on `bigKey === smallKey` with `salt`-way
    * key spreading. For inner / left_outer joins the result set is
    * identical to the unsalted join (the salt assignment only routes
    * rows; every big row still meets every matching small row exactly
    * once). Right/full-outer are rejected: unmatched small-side rows
    * would surface once per replica.
    *
    * Limitation (see [[contentSalt]]): big-side rows identical in EVERY
    * column share one salt replica, so a hot key made of pure full-row
    * duplicates is not spread. Callers with duplicate-heavy inputs
    * should carry a distinguishing column (an id, a file/offset) into
    * `big` — any column that varies restores the spread. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, salt: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "leftouter", "left")(joinType),
      s"saltedEquiJoin supports inner/left_outer joins, got $joinType")
    val saltedBig = big.withColumn("__salt", contentSalt(big, salt))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("__salt") === saltedSmall("__salt"),
        joinType)
      .drop(saltedBig("__salt")).drop(saltedSmall("__salt"))
  }
}
