package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** Pins the r16 fused single-pass folds (QuantizeInt8Stats,
  * HllRegisterSeed/HllZFold) to the higher-order-function chains they
  * replaced, bit for bit, over the real sf0.001 embedding corpus plus
  * synthetic edge rows (zero vector, empty vector, null vector). */
class FusedFoldSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    val real = Tables.embeddings(s, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    // no empty-vector row: recon_mse divides by size(v), which under
    // ANSI throws for BOTH the fused and the HOF form identically —
    // the corpus contract (fixed-width vectors) excludes it
    val edges = Seq(
      (100001L, Some(Seq.fill(8)(0.0f))), // zero vector
      (100003L, None) // null vector
    ).toDF("vec_id", "embedding")
    real.unionByName(edges)
  }

  /** The r15 HOF chain, verbatim, as the parity oracle. */
  private def hofSummary(emb: DataFrame): DataFrame = {
    val v = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("maxabs",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("scale", round(col("maxabs") / 127.0, 8))
      .withColumn("codes", transform(col("v"),
        x => when(col("maxabs") === 0, 0L)
          .otherwise(round(x * 127.0 / col("maxabs"), 0).cast("long"))))
      .withColumn("recon_mse", round(
        aggregate(
          zip_with(col("v"), col("codes"),
            (x, c) => {
              val err = x - c.cast("double") * col("maxabs") / 127.0
              err * err
            }),
          lit(0.0), (acc, x) => acc + x) / size(col("v")), 8))
    v.select(col("vec_id"), col("scale"),
      aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
      aggregate(col("codes"), lit(0L), (acc, c) => acc + c * c).as("code_sq_sum"),
      col("recon_mse"))
  }

  test("quantizeSummary == the r15 HOF chain bit for bit") {
    val fused = Similarity.quantizeSummary(corpus)
    val hof = hofSummary(corpus)
    assert(fused.exceptAll(hof).count() == 0 &&
      hof.exceptAll(fused).count() == 0,
      "fused quantize summary drifted from the HOF form")
  }

  test("quantizeInt8 codes/scale/mse == the r15 HOF chain") {
    val v = corpus.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("maxabs",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("scale", round(col("maxabs") / 127.0, 8))
      .withColumn("codes", transform(col("v"),
        x => when(col("maxabs") === 0, 0L)
          .otherwise(round(x * 127.0 / col("maxabs"), 0).cast("long"))))
      .withColumn("recon_mse", round(
        aggregate(
          zip_with(col("v"), col("codes"),
            (x, c) => {
              val err = x - c.cast("double") * col("maxabs") / 127.0
              err * err
            }),
          lit(0.0), (acc, x) => acc + x) / size(col("v")), 8))
      .select(col("vec_id"), col("scale"), col("codes"), col("recon_mse"))
    val fused = Similarity.quantizeInt8(corpus)
    assert(fused.exceptAll(v).count() == 0 && v.exceptAll(fused).count() == 0,
      "fused quantizeInt8 drifted from the HOF form")
  }

  test("HllRegisterSeed / HllZFold == the transform/aggregate forms") {
    val m = 64
    val df = spark.range(500).toDF("node")
      .withColumn("idx", pmod(xxhash64(col("node")), lit(m.toLong)).cast("int"))
      .withColumn("rho",
        (lit(1) + pmod(xxhash64(col("node"), lit(7)), lit(58))).cast("int"))
    val seeds = df.select(col("node"),
      graft.functions.HllOps.seedRegister(col("idx"), col("rho"), m).as("f"),
      transform(sequence(lit(0), lit(m - 1)),
        i => when(i === col("idx"), col("rho")).otherwise(lit(0))).as("h"))
    assert(seeds.filter(not(col("f") <=> col("h"))).count() == 0,
      "fused seed bank drifted from transform(sequence…)")
    val folds = seeds.select(col("node"),
        graft.functions.HllOps.zFold(col("f"), m).as("zf"),
        aggregate(col("h"), lit(0.0),
          (acc, r) => acc + pow(lit(2.0), -r)).as("z"),
        aggregate(col("h"), lit(0),
          (acc, r) => acc + when(r === 0, 1).otherwise(0)).as("zeros"))
      .filter(not(col("zf").getField("z") <=> col("z")) ||
        not(col("zf").getField("zeros") <=> col("zeros")))
    assert(folds.count() == 0, "fused z-fold drifted from aggregate()")
  }
}
