package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  // item A: [x, x, y] ; item B: [x, y] (tie) ; item C: [z] (single)
  private def ann() = Seq(
    ("A", 1, "x"), ("A", 2, "x"), ("A", 3, "y"),
    ("B", 1, "x"), ("B", 2, "y"),
    ("C", 1, "z")
  ).toDF("item", "annotator", "label")

  test("majority vote: modal label, tie to smallest, exact pairwise agreement") {
    val mv = Agreement.majorityVote(ann(), "item", "label")
      .orderBy("item")
      .select("item", "modal_label", "modal_votes", "n_annotations",
        "agreement_millionths")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(mv == Seq(
      ("A", "x", 2L, 3L, 333333L), // floor(1e6 * 2 / 6)
      ("B", "x", 1L, 2L, 0L), // tie c=1 -> lexicographically smallest
      ("C", "z", 1L, 1L, 1000000L))) // single annotation: perfect by definition
  }

  test("fleiss kappa: hand-computed, negative value floors (not truncates)") {
    val k = Agreement.fleissKappa(ann(), "item", "label").head()
    // over A and B only (C has n=1): m=2, sa=333333 -> pbar=166666
    // nn=5, c_x=3, c_y=2 -> p_u 600000/400000 -> pe_u=520000
    // kappa = floor(1e6*(166666-520000)/480000) = floor(-736112.5) = -736113
    assert(k.getLong(0) == 2L && k.getLong(1) == 5L)
    assert(k.getLong(2) == 166666L && k.getLong(3) == 520000L)
    assert(k.getLong(4) == -736113L,
      "negative kappa must FLOOR: truncation would give -736112")
  }

  test("oneLabelPerAnnotator collapses duplicate submissions deterministically") {
    val dup = Seq(("A", 1, "y"), ("A", 1, "x"), ("A", 2, "y"))
      .toDF("item", "annotator", "label")
    val one = Agreement.oneLabelPerAnnotator(dup, "item", "annotator", "label")
      .orderBy("annotator").select("annotator", "label")
      .as[(Int, String)].collect().toSeq
    assert(one == Seq((1, "x"), (2, "y")), "min label wins, engine-stable")
  }

  test("perfect and degenerate corpora") {
    // unanimous two-label corpus: pbar=1e6, pe<1e6 -> kappa=1e6
    val unan = Seq(("A", 1, "x"), ("A", 2, "x"), ("B", 1, "y"), ("B", 2, "y"))
      .toDF("item", "annotator", "label")
    val k1 = Agreement.fleissKappa(unan, "item", "label").head()
    assert(k1.getLong(2) == 1000000L && k1.getLong(4) == 1000000L)
    // one-label corpus: pe_u = 1e6 -> kappa undefined (NULL), never 0/0
    val mono = Seq(("A", 1, "x"), ("A", 2, "x")).toDF("item", "annotator", "label")
    val k2 = Agreement.fleissKappa(mono, "item", "label").head()
    assert(k2.getLong(3) == 1000000L && k2.isNullAt(4))
    // no item with n>=2: all NULL stats, zero counts, no crash
    val thin = Seq(("A", 1, "x"), ("B", 2, "y")).toDF("item", "annotator", "label")
    val k3 = Agreement.fleissKappa(thin, "item", "label").head()
    assert(k3.getLong(0) == 0L && k3.isNullAt(2) && k3.isNullAt(4))
  }

  test("partitioning independence") {
    val base = Agreement.fleissKappa(ann(), "item", "label").collect().toSeq
    val re = Agreement.fleissKappa(ann().repartition(7), "item", "label")
      .collect().toSeq
    assert(base == re)
  }

  private def bt(prefs: Seq[(Long, Long, Long)], rounds: Int = 5) =
    Agreement.bradleyTerry(prefs.toDF("winner", "loser", "n"), iterations = rounds)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("bradleyTerry: two items reach the exact closed-form MLE in one round and hold it") {
    // A beats B 3:1 -> P(A beats B) = 3/4 -> s_A = 1.5e6, s_B = 0.5e6
    // (s_A + s_B stays 2e6, so round 1 is already the fixed point)
    val out = bt(Seq((1L, 2L, 3L), (2L, 1L, 1L)))
    assert(out(1L) == ((1L, 3L, 4L, 1500000L)))
    assert(out(2L) == ((2L, 1L, 4L, 500000L)))
  }

  test("bradleyTerry: a never-winning item floors at 1; chains rank transitively") {
    val shutout = bt(Seq((1L, 2L, 2L)))
    assert(shutout(2L)._4 == 1L && shutout(2L)._2 == 0L)
    assert(shutout(1L)._4 > 1000000L)
    // A beats B 5:1, B beats C 5:1 -> s_A > s_B > s_C
    val chain = bt(Seq((1L, 2L, 5L), (2L, 1L, 1L), (2L, 3L, 5L), (3L, 2L, 1L)))
    assert(chain(1L)._4 > chain(2L)._4 && chain(2L)._4 > chain(3L)._4, chain.toString)
  }

  test("bradleyTerry: smallItemSet driver-side rounds are bit-identical to the distributed rounds") {
    val rnd = new scala.util.Random(7)
    val prefs = (0 until 300).map { _ =>
      val a = rnd.nextInt(12).toLong; val b = rnd.nextInt(12).toLong
      (a, b, 1L + rnd.nextInt(5))
    }.filter(p => p._1 != p._2)
    val dist = Agreement.bradleyTerry(prefs.toDF("winner", "loser", "n"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val local = Agreement.bradleyTerry(prefs.toDF("winner", "loser", "n"),
      smallItemSet = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(local == dist)
  }

  test("bradleyTerry: local ≡ distributed on the real browse-transition pairs (ag03's corpus)") {
    // the integer-recurrence claim the smallItemSet mode rests on, pinned
    // on the exact preference table ag03 fits (sf0.001 events, the
    // transition-pairs construction), not only on synthetic draws — 100
    // items, ~thousands of pairs, well inside the 2e6 guard
    val ev = graft.Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("ts"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1)
          .cast("long").as("item"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prefs = ev
      .select(col("item").as("winner"), lag(col("item"), 1).over(w).as("loser"))
      .filter(col("loser").isNotNull)
      .groupBy("winner", "loser").agg(count(lit(1)).as("n"))
      .persist()
    val dist = Agreement.bradleyTerry(prefs, iterations = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    val local = Agreement.bradleyTerry(prefs, iterations = 5, smallItemSet = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    prefs.unpersist()
    assert(dist.nonEmpty && local == dist,
      s"driver MM and distributed rounds diverged: ${(local -- dist).take(3)} vs ${(dist -- local).take(3)}")
  }

  test("bradleyTerry: duplicate pref rows combine; self-matches drop; repartition-invariant") {
    val prefs = Seq((1L, 2L, 2L), (1L, 2L, 1L), (2L, 1L, 1L), (3L, 3L, 9L))
    val a = bt(prefs)
    assert(a(1L) == ((1L, 3L, 4L, 1500000L))) // same 3:1 as the closed form
    assert(!a.contains(3L))
    val b = Agreement.bradleyTerry(
      prefs.toDF("winner", "loser", "n").repartition(7), iterations = 5)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(a == b)
  }
}
