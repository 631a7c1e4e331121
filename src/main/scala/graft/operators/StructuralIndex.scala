package graft.operators

import graft.Checkpoints
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.unsafe.types.UTF8String

/** Persisted structural projection — the build-once half of the
  * structural family's lifecycle.
  *
  * All four structural operators ([[Triangles]], [[LinkPredict]],
  * [[LabelProp]], [[KCore]]) start from the same two frames: the
  * canonical undirected simple edge set ([[Triangles.undirected]] — a
  * corpus-scale `distinct`, i.e. a full shuffle of the edge list) and
  * its endpoint degrees ([[Triangles.degrees]]). Rebuilding that
  * projection per query is fine at gate scale and absurd at 100 TB:
  * an analysis session that runs triangles, then k-core, then link
  * prediction on one graph pays the same corpus-wide
  * distinct-exchange three extra times (VERDICT r17 missing #3).
  *
  * This object persists the pair as BUCKETED parquet tables (r19 —
  * the `graph_bucketed_write` kernel-layout pattern applied to the
  * structural family): `und` is bucketed+sorted by `a` and `deg` by
  * `id`, with one bucket per shuffle partition, so a consumer joining
  * or semi-joining on those keys starts CO-PARTITIONED — the scan
  * itself is the exchange. That is exactly the k-core peel's round-0
  * shape ([[KCore.runPreDegreed]]): the stored degrees ARE round 0's
  * degree aggregate, and the `a`-side semi-join of the edge list
  * against the surviving-node set runs exchange-free
  * (`CatalystSpec` asserts the dropped Exchange). The r18 unbucketed
  * parquet layout had `graph_kcore_indexed` SLOWER than from-scratch
  * at 100× (17.2 vs 13.7 s — VERDICT r18 wrong #2) because the peel
  * re-shuffled the parquet-read edge list anyway.
  *
  * The operators' `*On` entry points consume the tables directly —
  * the `band_index` / `ivf_index` lifecycle pattern, with the same
  * proof shape: the `*_indexed` gates share the from-scratch gates'
  * DuckDB oracles VERBATIM, so the persisted path is bit-equal to the
  * recomputed one (edge ids and integer degrees/strengths round-trip
  * parquet exactly; nothing floating lives in the index).
  *
  * Catalog lifecycle: Spark keeps bucket metadata in the session
  * catalog, not in the parquet files, so a FRESH JVM re-attaches the
  * index by re-registering an external `CLUSTERED BY` table over the
  * persisted path — the bucket count needed for that round-trip is
  * persisted alongside the data (`meta.parquet`). Readers do this
  * transparently ([[attach]]); a shell user can therefore
  * `structural_index` once and run `*_indexed` verbs from later
  * processes, like any real index.
  *
  * Invalidation contract: the index is a pure function of the edge
  * list, so any edge mutation invalidates it wholesale — rebuild, no
  * append path (degrees and `distinct` are not incrementally
  * maintainable without keeping multiplicity counts, which would
  * change the stored shape; a deployment that needs deltas stores
  * `(a, b, multiplicity)` and derives this view — out of scope until
  * an operator needs it). */
object StructuralIndex {

  /** Deterministic catalog identifier for the index at `dir`: a
    * readable sanitized tail plus the graft hash of the FULL raw
    * path, so two dirs that sanitize alike (`sf0.1` vs `sf0_1`) can
    * never share a table (ADVICE r18). */
  private def tableName(dir: String, part: String): String = {
    val tail = dir.replaceAll("[^a-zA-Z0-9]", "_").takeRight(40)
    val h = java.lang.Long.toHexString(
      graft.functions.GraftHash.hashUtf8(UTF8String.fromString(dir)))
    s"graft_structidx_${tail}_${h}_$part"
  }

  private def qualified(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toString
  }

  /** Build and persist the projection under `dir`: `und` (a, b, wt —
    * bucketed by `a`) and `deg` (id, deg — bucketed by `id`), plus
    * `meta.parquet` carrying the bucket count for cross-JVM
    * re-attachment. The stored edge set carries the micro-unit edge
    * STRENGTH ([[Triangles.undirectedWeighted]] — its `(a, b)` key set
    * is exactly [[Triangles.undirected]]'s, since the weighted groupBy
    * and the unweighted distinct share the key), so ONE index serves
    * both the unweighted operators (which project the weight away; the
    * pruning reaches the scan) and the weighted ones. The weighted set
    * is materialized once and feeds both writes (degrees derive from
    * it — one extra hash agg, no second corpus scan), then released.
    *
    * `buckets <= 0` (the default) sizes the layout to
    * `spark.sql.shuffle.partitions`, so the bucket hash matches the
    * shuffle hash of every downstream join — the
    * `graph_bucketed_write` sizing rule. */
  def write(edges: DataFrame, dir: String, buckets: Int = 0): Unit = {
    val spark = edges.sparkSession
    val n = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val undW = Checkpoints.materialize(Triangles.undirectedWeighted(edges))
    writePart(spark, undW, dir, "und", "a", n)
    // One degree table carries BOTH the edge count and the micro-unit
    // strength (each reader prunes the other's column at the scan), so
    // BOTH peels' round-0 aggregates are stored: deg for
    // [[KCore.runPreDegreed]], wd for [[KCore.runWeightedPreDegreed]].
    // One co-keyed join of the two aggregates over the already-
    // materialized projection — no extra corpus scan.
    writePart(spark,
      Triangles.degrees(undW)
        .join(Triangles.weightedDegrees(undW), Seq("id")),
      dir, "deg", "id", n)
    Checkpoints.release(undW)
    spark.range(1).select(lit(n).as("buckets"))
      .write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  private def writePart(spark: SparkSession, df: DataFrame, dir: String,
      part: String, key: String, buckets: Int): Unit = {
    val t = tableName(dir, part)
    // A stale catalog entry from an earlier build of the same dir (or
    // an orphan warehouse table from a dropped external path) blocks
    // saveAsTable — drop first, the writeBucketedGraph discipline.
    spark.sql(s"DROP TABLE IF EXISTS $t")
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .option("path", qualified(spark, s"$dir/$part"))
      .saveAsTable(t)
  }

  /** The `part` table of the index at `dir`, re-registered in this
    * session's catalog if a previous JVM wrote it (bucket metadata
    * lives in the catalog, not the files — the external
    * `CLUSTERED BY ... LOCATION` round-trip restores it from the
    * persisted bucket count). */
  private def attach(spark: SparkSession, dir: String,
      part: String, key: String): DataFrame = synchronized {
    val t = tableName(dir, part)
    if (!spark.catalog.tableExists(t)) {
      val path = qualified(spark, s"$dir/$part")
      val buckets = spark.read.parquet(s"$dir/meta.parquet")
        .head().getInt(0)
      val ddl = spark.read.parquet(path).schema.toDDL
      spark.sql(s"CREATE TABLE $t ($ddl) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
        s"LOCATION '$path'")
    }
    spark.table(t)
  }

  /** One part of the index, bucket-aware or plain: `bucketed = false`
    * reads the SAME parquet files without re-attaching the bucket
    * metadata. Bucket info pins every join touching the scan to the
    * fixed bucket-partition layout and disables AQE's re-planning on
    * it — a win when the consumer's joins are ON the bucket key (the
    * k-core peel), a measured loss when the first thing the consumer
    * does is union/re-key the scan so the join is NOT bucket-aligned
    * (link prediction's center join: 1.65× slower with metadata at
    * sf0.1). Consumers choose; the data is one physical copy. */
  private def part(spark: SparkSession, dir: String, name: String,
      key: String, bucketed: Boolean): DataFrame =
    if (bucketed) attach(spark, dir, name, key)
    else spark.read.parquet(qualified(spark, s"$dir/$name"))

  /** The persisted undirected simple edge set `(a, b)` — the weight
    * column projected away (column pruning reaches the parquet scan,
    * so the unweighted consumers never read it). Bucketed by `a`
    * unless `bucketed = false` (see [[part]]). */
  def undirected(spark: SparkSession, dir: String,
      bucketed: Boolean = true): DataFrame =
    part(spark, dir, "und", "a", bucketed).select(col("a"), col("b"))

  /** The persisted WEIGHTED edge set `(a, b, wt)` (micro-unit
    * strengths) — input shape of [[Triangles.perNodeWeightedOn]],
    * [[KCore.runWeightedOn]], [[LabelProp.runWeightedOn]] and
    * [[LinkPredict.topCandidatesWeightedOn]]. Bucketed by `a` unless
    * `bucketed = false` (see [[part]]). */
  def undirectedWeighted(spark: SparkSession, dir: String,
      bucketed: Boolean = true): DataFrame =
    part(spark, dir, "und", "a", bucketed)
      .select(col("a"), col("b"), col("wt"))

  /** The persisted endpoint degrees `(id, deg)` — the strength column
    * pruned at the scan. Bucketed by `id` — round 0 of the k-core
    * peel reads this INSTEAD of re-aggregating the edge list
    * ([[KCore.runPreDegreed]]). */
  def degrees(spark: SparkSession, dir: String,
      bucketed: Boolean = true): DataFrame =
    part(spark, dir, "deg", "id", bucketed).select(col("id"), col("deg"))

  /** The persisted endpoint STRENGTHS `(id, wd)` (micro-unit weighted
    * degrees — [[Triangles.weightedDegrees]] of the stored
    * projection), the count column pruned at the scan. Round 0 of the
    * WEIGHTED peel ([[KCore.runWeightedPreDegreed]]). */
  def weightedDegrees(spark: SparkSession, dir: String,
      bucketed: Boolean = true): DataFrame =
    part(spark, dir, "deg", "id", bucketed).select(col("id"), col("wd"))
}
