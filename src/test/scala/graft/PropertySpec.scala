package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based algebraic invariants (SURVEY.md §5): dedup idempotence,
  * left-join row preservation, argmax-form equivalence, count-gate
  * monotonicity — over ScalaCheck-generated data (fixed seeds, 15 cases
  * per property), not just the fixtures.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int)]] =
    Gen.listOfN(60, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(0, 9)))

  private def cases(n: Int): Seq[List[(String, Int)]] =
    (0 until n).map(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("dropDuplicates is idempotent and never increases row count") {
    cases(15).foreach { rows =>
      val df = rows.toDF("k", "v")
      val once = df.dropDuplicates()
      assert(once.count() <= df.count())
      assert(once.dropDuplicates().count() == once.count())
    }
  }

  test("left join preserves left row count when right keys are unique") {
    cases(15).foreach { rows =>
      val left = rows.toDF("k", "v")
      val right = rows.map(_._1).distinct.zipWithIndex.toDF("k", "id")
      assert(left.join(right, Seq("k"), "left").count() == left.count())
    }
  }

  test("argmax via self-join ⊇ argmax via window, window picks min tie") {
    cases(10).foreach { rows =>
      val counts = rows.toDF("k", "v").groupBy("k", "v").count()
      val maxes = counts.groupBy("k").agg(max("count").as("mx"))
      val self = counts.join(maxes, Seq("k"))
        .filter(col("count") === col("mx"))
        .select("k", "v").as[(String, Int)].collect().toSet
      val win = counts.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy(desc("count"), col("v"))))
        .filter(col("rn") === 1)
        .select("k", "v").as[(String, Int)].collect().toSet
      assert(win.subsetOf(self))
      win.foreach { case (k, v) =>
        assert(v == self.filter(_._1 == k).map(_._2).min)
      }
    }
  }

  test("documents doc_id stays below Dedup.COPY_OFFSET (copy-relabel collision guard)") {
    val mx = Tables.documents(spark, TestSpark.sf)
      .agg(max(col("doc_id"))).head().getLong(0)
    assert(mx < ext.Dedup.COPY_OFFSET,
      s"doc_id $mx would collide with relabeled incremental-dedup copies")
  }

  test("count gates are monotone under union") {
    cases(15).zip(cases(15).reverse).foreach { case (r1, r2) =>
      val a = r1.toDF("k", "v")
      val b = r2.toDF("k", "v")
      assert(a.unionByName(b).count() == a.count() + b.count())
    }
  }

  test("BMP codec round-trips any dims/colors through ImageIO (padding sweep)") {
    // width mod 4 ∈ {0,1,2,3} all occur across the generated cases, so
    // every row-padding branch of the writer is exercised
    val gen = Gen.zip(Gen.chooseNum(1, 80), Gen.chooseNum(1, 60),
      Gen.chooseNum(0, 255), Gen.chooseNum(0, 255), Gen.chooseNum(0, 255))
    (0 until 25).foreach { i =>
      val (w, h, r, g, b) = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ext.Multimodal.bmpBytes(w, h, r, g, b)))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"case $i: ${w}x$h")
      for ((x, y) <- Seq((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1))) {
        val px = img.getRGB(x, y)
        assert(((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff) == ((r, g, b)),
          s"case $i: corner ($x,$y)")
      }
    }
  }

  test("MinHashSig eval matches an independent fold on arbitrary inputs") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val K = graft.expr.MinHashSig.K
    val M = graft.expr.MinHashSig.M
    def reference(xs: Seq[Long]): Seq[Long] =
      (0 until K).map { i =>
        val perms = xs.map(h => ((2L * i + 1) * (h % M) + i * 2654435761L) % M)
        if (perms.isEmpty) Long.MaxValue else perms.min
      }
    val gen = Gen.listOf(Gen.chooseNum(0L, Long.MaxValue / 2))
    (0 until 25).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default, Seed(100L + i)).get
      val expr = graft.expr.MinHashSig(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          xs, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)), K, M)
      val got = expr.eval(null).asInstanceOf[GenericArrayData].toLongArray.toSeq
      assert(got == reference(xs), s"case $i (n=${xs.length})")
    }
  }

  test("isotonic fit is monotone non-decreasing and mass-conserving (PAVA invariants)") {
    // The minimax form iso(i) = max_{j<=i} min_{k>=i} mean(j..k) must
    // reproduce PAVA's two defining invariants on real data: the fitted
    // curve never decreases, and pooling preserves total mass
    // (Σ iso_i·n_i = Σ n1_i exactly, modulo one rounding per segment).
    val rows = graft.ops.StatOps.isotonic(spark, TestSpark.sf)
      .select("b", "n", "n1", "iso_fit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length > 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4 + 1e-15,
        s"fit decreased at bucket ${b._1}: ${a._4} -> ${b._4}")
    }
    val massIso = rows.map(r => r._2 * r._4).sum
    val massRaw = rows.map(_._3).sum.toDouble
    assert(math.abs(massIso - massRaw) <= 1e-6 * massRaw,
      s"pooling must conserve mass: $massIso vs $massRaw")
    // and it is a genuine POOLING: far fewer distinct levels than buckets
    assert(rows.map(_._4).distinct.length < rows.length / 4)
  }
}
