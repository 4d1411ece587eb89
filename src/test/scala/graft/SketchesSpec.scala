package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches

/** Accuracy and contract properties of the deterministic sketches —
  * the oracle gate proves cross-engine equality; these prove the
  * estimates are actually USEFUL (within theoretical error) and that
  * the sketch-specific guarantees hold.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("hll: estimate within ~3 standard errors at raw-regime cardinality") {
    import spark.implicits._
    // 5000 distinct keys per group — far above the 640 linear-counting
    // cutoff for m=256 (standard error 1.04/16 ≈ 6.5%)
    val df = (0 until 5000).flatMap(i => Seq(("g1", i.toLong * 7 + 1)))
      .toDF("grp", "k")
    val est = Sketches.hllDistinct(df, "k", "grp").collect()(0).getLong(2)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.20, s"est=$est for n=5000")
  }

  test("hll: small cardinality lands in the linear-counting branch") {
    import spark.implicits._
    val df = (1 to 40).map(i => ("g", i.toLong)).toDF("grp", "k")
    val r = Sketches.hllDistinct(df, "k", "grp").collect()(0)
    assert(r.getLong(1) > 0, "must have zero registers at n=40, m=256")
    val est = r.getLong(2)
    assert(math.abs(est - 40.0) / 40.0 < 0.25, s"lc est=$est for n=40")
  }

  test("hll: duplicates don't move the estimate (distinct semantics)") {
    import spark.implicits._
    val once = (1 to 300).map(i => ("g", i.toLong)).toDF("grp", "k")
    val thrice = (1 to 300).flatMap(i => Seq.fill(3)(("g", i.toLong)))
      .toDF("grp", "k")
    val e1 = Sketches.hllDistinct(once, "k", "grp").collect()(0).getLong(2)
    val e3 = Sketches.hllDistinct(thrice, "k", "grp").collect()(0).getLong(2)
    assert(e1 == e3, s"$e1 != $e3")
  }

  test("hllOverlap: disjoint sets intersect near 0, identical sets near full") {
    import spark.implicits._
    // a: keys 1..1000, b: keys 501..1500 → true |A∩B| = 500
    val df = ((1 to 1000).map(i => ("a", i.toLong)) ++
      (501 to 1500).map(i => ("b", i.toLong))).toDF("grp", "k")
    val r = Sketches.hllOverlap(df, "k", "grp").collect()(0)
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    val (ea, eb, eu, ei) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(math.abs(eu - 1500.0) / 1500.0 < 0.25, s"union est $eu")
    assert(ei >= 0 && math.abs(ei - 500.0) / 500.0 < 0.6,
      s"intersect est $ei (inclusion-exclusion compounds 3 estimator errors)")
    assert(math.abs(ea - 1000.0) / 1000.0 < 0.25 &&
      math.abs(eb - 1000.0) / 1000.0 < 0.25, s"single ests $ea/$eb")
    // disjoint sets: intersection clamps to ≥ 0 and stays small
    val dj = ((1 to 800).map(i => ("a", i.toLong)) ++
      (10001 to 10800).map(i => ("b", i.toLong))).toDF("grp", "k")
    val d = Sketches.hllOverlap(dj, "k", "grp").collect()(0)
    assert(d.getLong(5) >= 0 && d.getLong(5) < 300,
      s"disjoint intersect est ${d.getLong(5)}")
  }

  test("heavyHitters: exact counts over the MG gate, threshold keys only") {
    import spark.implicits._
    // 1000 rows: key 7 appears 200× (20%), key 9 appears 50× (5%),
    // 750 singletons — k=15 means threshold ⌈1000/15⌉ ≈ 67 rows
    val rows = Seq.fill(200)(7L) ++ Seq.fill(50)(9L) ++
      (1000L until 1750L)
    val df = rows.toDF("user_id").repartition(8)
    val r = Sketches.heavyHitters(df, "user_id", k = 15)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((7L, 200L, 200000L)),
      s"only the 20% key crosses n/15: ${r.toSeq}")
    // lower the bar to 5% and the second key appears, exact count
    val r2 = Sketches.heavyHitters(df, "user_id", k = 20)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r2 == Seq((7L, 200L), (9L, 50L)), s"$r2")
  }

  test("cms: never underestimates, exact when collision-free") {
    import spark.implicits._
    // 10 keys on 64 columns — likely collision-free per row, and the
    // min-of-rows estimate can NEVER be below the true count
    val df = (1 to 10).flatMap(k => Seq.fill(k)(("e", k.toLong))).toDF("t", "k")
    val est = Sketches.countMin(df, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = (1 to 10).map(k => k.toLong -> k.toLong).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated key $k: ${est(k)} < $n")
    }
    assert(est == truth, s"collision-free case must be exact: $est")
  }

  test("cms error audit: collision-free corpus is all-exact; totals reconcile") {
    import spark.implicits._
    val df = (1 to 10).flatMap(k => Seq.fill(k)(("e", k.toLong))).toDF("t", "k")
    val audit = Sketches.countMinError(df, "k")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit == Map("0_exact" -> ((10L, 0L))),
      s"collision-free must land entirely in 0_exact: $audit")
    // dense key space (>> 64 columns): collisions are structural —
    // every key still appears in exactly one bucket and no overcount
    // is negative (CMS cannot undercount)
    val dense = (1 to 800).flatMap(k => Seq.fill(2)(("e", k.toLong))).toDF("t", "k")
    val a2 = Sketches.countMinError(dense, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a2.map(_._2).sum == 800L, s"keys must partition: ${a2.toSeq}")
    assert(a2.forall(_._3 >= 0L), s"negative overcount: ${a2.toSeq}")
    assert(a2.exists(x => x._1 != "0_exact"),
      s"800 keys on 64 columns must collide somewhere: ${a2.toSeq}")
  }

  test("cms: heavy hitter estimate survives a skewed mix") {
    import spark.implicits._
    val rows = Seq.fill(5000)(("e", 42L)) ++
      (1 to 500).map(i => ("e", 100L + i))
    val est = Sketches.countMin(rows.toDF("t", "k"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // heavy key exact-or-over but within the ε·N additive CMS bound
    assert(est(42L) >= 5000L && est(42L) <= 5000L + 2L * 5500 / 64,
      s"heavy hitter est ${est(42L)}")
  }
}
