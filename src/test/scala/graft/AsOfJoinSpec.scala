package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics of the native as-of merge ([[graft.plans.AsOfJoin]])
  * that the sf-data oracle can't isolate: left rows before any right row,
  * inclusive time ties, keys on one side only, empty right partitions,
  * tolerance cutoffs, and randomized agreement with a brute-force model
  * across shuffled multi-partition inputs.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long)], right: Seq[(Long, Long)],
      tol: Long): Map[(Long, Long), Option[Long]] = {
    val l = left.toDF("k", "t").repartition(5)
    val r = right.toDF("rk", "rt").repartition(3)
    plans.AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", tol)
      .collect()
      .map(row => ((row.getLong(0), row.getLong(1)),
        if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .toMap
  }

  private def brute(left: Seq[(Long, Long)], right: Seq[(Long, Long)],
      tol: Long): Map[(Long, Long), Option[Long]] =
    left.map { case (k, t) =>
      val cand = right.filter { case (rk, rt) =>
        rk == k && rt <= t && (tol < 0L || t - rt <= tol)
      }
      ((k, t), if (cand.isEmpty) None else Some(cand.map(_._2).max))
    }.toMap

  test("as-of merge: hand-built edge fixture across tolerances") {
    val left = Seq((1L, 5L), (1L, 10L), (1L, 20L), (2L, 1L), (3L, 7L))
    val right = Seq((1L, 3L), (1L, 10L), (1L, 15L), (1L, 25L),
      (2L, 2L), (2L, 9L), (4L, 1L))
    for (tol <- Seq(-1L, 5L, 1L, 0L)) {
      assert(run(left, right, tol) == brute(left, right, tol),
        s"divergence at tolerance $tol")
    }
    // pinned expectations at unbounded tolerance: inclusive tie at t=10,
    // pre-first-right-row and right-only keys emit null
    val u = run(left, right, -1L)
    assert(u((1L, 10L)) == Some(10L), "time tie must be inclusive")
    assert(u((1L, 20L)) == Some(15L))
    assert(u((2L, 1L)) == None, "left row before any right row -> null")
    assert(u((3L, 7L)) == None, "key with no right rows -> null")
  }

  test("as-of merge: empty right side emits all-null matches") {
    val got = run(Seq((1L, 5L), (2L, 9L)), Seq.empty, -1L)
    assert(got.values.forall(_.isEmpty))
  }

  test("as-of merge: randomized agreement with the brute model") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(400)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .distinct // duplicate (k,t) left rows collapse in the Map compare
    val right = Seq.fill(400)((rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong))
    for (tol <- Seq(-1L, 100L, 7L)) {
      assert(run(left, right, tol) == brute(left, right, tol),
        s"randomized divergence at tolerance $tol")
    }
  }
}
