package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Components, Neighborhood, Ranking}
import graft.pipeline.{Sampling, TextAnalysis}

/** Property-based invariants over randomized inputs — the structural
  * guarantees the fixed fixtures can't sweep: generated graphs and
  * corpora, 30+ cases per property. Seeded by scalacheck's default
  * RNG; a failing case prints its shrunk input.
  *
  * Spark jobs per case are small (tens of rows) but real — properties
  * are capped at 30 cases to keep the suite under a minute.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(30)
    .withWorkers(1)

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val edgeListGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 25).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.choose(0L, 9L)
        b <- Gen.choose(0L, 9L)
      } yield (a, b))
    }

  test("property: chunkDocs covers every token exactly once per stride step") {
    import spark.implicits._
    val gen = Gen.choose(1, 300)
    check("chunk coverage")(Prop.forAll(gen) { n =>
      val d = Seq((1L, Seq.fill(n)("a").mkString(" "))).toDF("doc_id", "text")
      val chunks = Sampling.chunkDocs(d, size = 64, overlap = 16)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val covered = chunks.flatMap { case (_, start, len) => start until (start + len) }.toSet
      val starts = chunks.map(_._2)
      // every token in some chunk, starts advance by exactly the stride,
      // every chunk non-empty and within bounds
      covered == (0L until n.toLong).toSet &&
        starts.sameElements(starts.indices.map(_ * 48L)) &&
        chunks.forall { case (_, s, l) => l > 0 && s + l <= n }
    })
  }

  test("property: winnow selects ≥1 fingerprint per full window, all pos valid") {
    import spark.implicits._
    // random words from a tiny vocab → repeated shingles stress the
    // tie rule; docs long enough to have ≥1 full window
    val docGen = Gen.choose(8, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    check("winnow guarantee")(Prop.forAll(docGen) { text =>
      val nShingles = text.split(" ").length - 2
      val sel = TextAnalysis.winnow(Seq((1L, text)).toDF("doc_id", "text"), window = 4)
        .collect().map(r => r.getLong(1))
      // guarantee: at least one selection once a full window exists;
      // positions are 1-based shingle offsets
      sel.nonEmpty && sel.forall(p => p >= 1 && p <= nShingles)
    })
  }

  test("property: communities labels are a subset of node ids (no invented labels)") {
    import spark.implicits._
    check("lpa closure")(Prop.forAll(edgeListGen) { es =>
      val real = es.filter { case (a, b) => a != b }
      real.isEmpty || {
        val g = real.toDF("src", "dst")
        val c = Components.communities(g, rounds = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        val nodes = real.flatMap { case (a, b) => Seq(a, b) }.toSet
        c.map(_._1).toSet == nodes && c.forall { case (_, lab) => nodes(lab) }
      }
    })
  }

  test("property: graphDiff counts reconcile with raw edge sets") {
    import spark.implicits._
    check("diff reconciliation")(Prop.forAll(edgeListGen, edgeListGen) { (e1, e2) =>
      (e1.isEmpty || e2.isEmpty) || {
        val d = Neighborhood.graphDiff(e1.toDF("src", "dst"), e2.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
        val b = e1.toSet
        val a = e2.toSet
        b.union(a).map(_._1).forall { src =>
          val bs = b.collect { case (s, t) if s == src => t }
          val as = a.collect { case (s, t) if s == src => t }
          val (kept, added, removed) =
            ((bs & as).size.toLong, (as -- bs).size.toLong, (bs -- as).size.toLong)
          if (added + removed == 0) !d.contains(src)
          else d.get(src).contains((kept, added, removed))
        }
      }
    })
  }

  test("property: sampled betweenness is non-negative and excludes sources-only rows") {
    import spark.implicits._
    check("betweenness sanity")(Prop.forAll(edgeListGen) { es =>
      val real = es.filter { case (a, b) => a != b }
      real.isEmpty || {
        val g = real.toDF("src", "dst")
        val srcs = real.map(_._1).distinct.take(3).toDF("node")
        val b = Ranking.betweennessSampled(g, srcs, maxDepth = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        b.forall(_._2 > 0) &&
          b.map(_._1).toSet.subsetOf(
            real.flatMap { case (x, y) => Seq(x, y) }.toSet)
      }
    })
  }

  test("property: threshold sample is a deterministic subset of its input") {
    import spark.implicits._
    val corpusGen = Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 1000L)).map(_.distinct))
    check("threshold sample")(Prop.forAll(corpusGen) { ids =>
      ids.isEmpty || {
        val d = ids.map(i => (i, s"doc $i the and is")).toDF("doc_id", "text")
        val s1 = Sampling.stratifiedSampleThreshold(d, frac = 0.5)
          .collect().map(_.getLong(0)).toSet
        val s2 = Sampling.stratifiedSampleThreshold(d, frac = 0.5)
          .collect().map(_.getLong(0)).toSet
        s1 == s2 && s1.subsetOf(ids.toSet)
      }
    })
  }

  /** In-memory reference k-core: repeatedly drop nodes with
    * undirected simple degree < k until stable; returns survivor →
    * within-core degree. */
  private def bruteKCore(edges: List[(Long, Long)], k: Int): Map[Long, Int] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    var alive = und.flatMap { case (a, b) => Set(a, b) }
    var changed = true
    while (changed) {
      val deg = alive.map { n =>
        n -> und.count { case (a, b) =>
          (a == n && alive(b)) || (b == n && alive(a)) }
      }.toMap
      val next = alive.filter(deg(_) >= k)
      changed = next != alive
      alive = next
    }
    alive.map { n =>
      n -> und.count { case (a, b) =>
        (a == n && alive(b)) || (b == n && alive(a)) }
    }.toMap
  }

  test("property: degree-decrement peel equals brute-force k-core") {
    import spark.implicits._
    check("kcore peel")(Prop.forAll(edgeListGen, Gen.choose(2, 4)) { (es, k) =>
      val expected = bruteKCore(es, k)
      val got = Ranking.kCoreBounded(es.toDF("src", "dst"), k, rounds = 12)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      got == expected
    })
  }

  test("property: MG-gated heavy hitters equal the brute-force threshold filter") {
    import spark.implicits._
    // keys drawn from a small skewed domain so hitters actually occur;
    // k small enough that the MG candidate stage does real eviction
    val keysGen = Gen.choose(20, 120).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const(1L), 3 -> Gen.const(2L), 1 -> Gen.choose(10L, 40L))))
    check("heavy hitters")(Prop.forAll(keysGen, Gen.choose(3, 8)) { (ks, k) =>
      val expected = ks.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k >= ks.size }.toMap
      val got = graft.functions.Sketches
        .heavyHitters(ks.toDF("user_id").repartition(5), "user_id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    })
  }

  test("property: sparsifyTopK keeps exactly the window top-k with exact tie order") {
    import spark.implicits._
    val wGen = Gen.choose(3, 30).flatMap(n =>
      Gen.listOfN(n, for {
        s <- Gen.choose(0L, 4L); d <- Gen.choose(10L, 20L)
        w <- Gen.choose(1L, 5L)
      } yield (s, d, w)))
    check("sparsify topk")(Prop.forAll(wGen, Gen.choose(1, 3)) { (es0, k) =>
      val es = es0.groupBy(e => (e._1, e._2)).map { case ((s, d), g) =>
        (s, d, g.map(_._3).sum) }.toList   // unique (src, dst)
      val expected = es.groupBy(_._1).flatMap { case (s, g) =>
        g.sortBy(e => (-e._3, e._2)).take(k).zipWithIndex
          .map { case ((_, d, w), i) => (s, i + 1L) -> ((d, w)) }
      }
      val got = Ranking.sparsifyTopK(es.toDF("src", "dst", "weight"), k)
        .collect().map(r => (r.getLong(0), r.getLong(3)) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      got == expected
    })
  }

  test("property: hllOverlap union/intersection obey set-algebra bounds") {
    import spark.implicits._
    val gen = for {
      na <- Gen.choose(5, 200); nb <- Gen.choose(5, 200)
      off <- Gen.choose(0, 150)
    } yield (na, nb, off)
    check("hll overlap bounds")(Prop.forAll(gen) { case (na, nb, off) =>
      val df = ((1 to na).map(i => ("a", i.toLong)) ++
        (1 to nb).map(i => ("b", (off + i).toLong))).toDF("grp", "k")
      val r = graft.functions.Sketches.hllOverlap(df, "k", "grp").collect()(0)
      val (ea, eb, eu, ei) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // the union register bank dominates both sides' banks, so its
      // estimate can never fall below either single estimate; the
      // clamped intersection is non-negative and ≤ min single est + slack
      eu >= math.max(ea, eb) && ei >= 0 && ea + eb - eu <= math.min(ea, eb)
    })
  }
}
