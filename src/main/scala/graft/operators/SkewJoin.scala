package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join via key salting.
  *
  * AQE's skew-join split (on by default) handles most skew at runtime;
  * explicit salting remains the tool when a handful of hot keys dwarf
  * everything else (the classic power-law join at corpus scale): the
  * probe side gets a random salt in [0, salts), the build side is
  * replicated once per salt value, and the join key becomes (key, salt) —
  * splitting each hot key's row group across `salts` reducers.
  *
  * The salt is correctness-invariant for probe-side-preserving join types
  * (inner, left/left_outer, left_semi, left_anti): every probe row carries
  * exactly one salt and meets exactly the build replica with that salt.
  * Build-side-preserving types (right/full outer, right_semi/right_anti)
  * would emit each unmatched build row once per salt — `saltedJoin` rejects
  * them; salt the other way around (swap probe/build) instead.
  */
object SkewJoin {

  private val probePreserving =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      salts: Int = 8,
      joinType: String = "inner"
  ): DataFrame = {
    require(probePreserving(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' preserves the (replicated) build " +
        "side and would duplicate unmatched build rows; use inner/left/" +
        "left_semi/left_anti, or swap probe and build")
    val p = probe.withColumn("_salt", (rand(42) * salts).cast("int"))
    val b = build.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    p.join(b,
      p(probeKey) === b(buildKey) && p("_salt") === b("_salt"),
      joinType)
      .drop("_salt")
  }
}
