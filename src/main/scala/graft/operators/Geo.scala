package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Spatial operators. The fixture tables carry no coordinates, so
  * points derive deterministically from keys via the repo's
  * multiplicative-hash convention (two independent odd multipliers →
  * micro-degree offsets) — both engines compute the same integers,
  * so the geometry is oracle-replayable.
  *
  * Density-invariant fixture: the lat side is fixed at 1e6
  * micro-degrees but the lon side scales LINEARLY with the table
  * size (700 micro-degrees per point), so area ∝ rows and point
  * density is constant at every scale factor — the real-world
  * regime (a city's data volume grows with its extent, not by
  * packing 10× the points into the same block). Under constant
  * density the true answer and the candidate volume both grow
  * linearly, so the measured scale slope certifies the OPERATOR
  * (grid blocking with a constant 9-cell probe multiplier), not the
  * fixture. The one-row `count()` that sizes the strip is bounded
  * driver-plane state, same class as bucket boundaries.
  *
  * Scale design: the radius self-join is the textbook grid-cell
  * blocking — cell side = radius, so any qualifying pair is in the
  * same or an adjacent cell. The probe side explodes into its 9
  * neighbor cells (a CONSTANT multiplier at any table size), the
  * join is a plain (cx, cy) equi hash join, and the exact squared
  * distance check is row-local integer arithmetic. Never a cross
  * join, never a non-equi range condition (which would plan a nested
  * loop); candidate volume ∝ true neighbor density, the same shape
  * PostGIS/Sedona grid joins and the dedup LSH buckets use.
  */
object Geo {

  /** Pairs of customers within `radius` micro-degrees (planar
    * Euclidean on the micro-degree grid — the declared metric; at
    * city scale the lat/lon anisotropy is a constant factor the
    * radius choice absorbs). Each pair is found exactly once: the
    * probe covers A's 9 neighbor cells, B's home cell matches at
    * most one of them, and `a_id < b_id` picks one orientation.
    */
  def cellJoin(s: SparkSession, dir: String,
      radius: Long = 20000L): DataFrame = {
    val lonSide = Tables.customer(s, dir).count() * 700L
    val pts = Tables.customer(s, dir).select(
        col("c_custkey").as("id"),
        (col("c_custkey") * lit(2654435761L) % lit(1000000L)).as("lat"),
        (col("c_custkey") * lit(2246822519L) % lit(lonSide)).as("lon"))
      .withColumn("cx", expr(s"lon div ${radius}L"))
      .withColumn("cy", expr(s"lat div ${radius}L"))
    val probes = pts
      .select(col("id").as("a_id"), col("lat").as("a_lat"),
        col("lon").as("a_lon"), col("cx"), col("cy"),
        explode(expr("sequence(-1, 1)")).as("dx"))
      .select(col("a_id"), col("a_lat"), col("a_lon"),
        (col("cx") + col("dx")).as("pcx"), col("cy"),
        explode(expr("sequence(-1, 1)")).as("dy"))
      .select(col("a_id"), col("a_lat"), col("a_lon"),
        col("pcx"), (col("cy") + col("dy")).as("pcy"))
    val homes = pts.select(col("id").as("b_id"),
      col("lat").as("b_lat"), col("lon").as("b_lon"),
      col("cx").as("pcx"), col("cy").as("pcy"))
    probes.join(homes, Seq("pcx", "pcy"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist2",
        (col("a_lat") - col("b_lat")) * (col("a_lat") - col("b_lat")) +
          (col("a_lon") - col("b_lon")) * (col("a_lon") - col("b_lon")))
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("a_id"), col("b_id"), col("dist2"))
      .orderBy("a_id", "b_id")
  }
}
