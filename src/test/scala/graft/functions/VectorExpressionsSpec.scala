package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.similarity.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("a", ArrayType(FloatType, containsNull = true), nullable = false),
    StructField("b", ArrayType(FloatType, containsNull = true), nullable = false)))

  test("vec_dot is bit-identical to the sequential fold on harness vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.as("x").crossJoin(emb.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id")).limit(500)
      .select(
        VectorFunctions.vecDot(col("x.embedding"), col("y.embedding")).as("native"),
        Similarity.dotFold(col("x.embedding"), col("y.embedding")).as("fold"))
    // exact equality: same promotion, same accumulation order
    pairs.filter(col("native") =!= col("fold")).count() shouldBe 0L
  }

  test("null elements contribute zero; length mismatch stops at shorter") {
    val d = df(schema,
      Row(1L, Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](2f, 5f, 4f)),
      Row(2L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f, 5f)))
    val out = d.select(col("id"), VectorFunctions.vecDot(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    out(1L) shouldBe (1.0 * 2 + 3.0 * 4)
    out(2L) shouldBe (1.0 * 3 + 2.0 * 4)
  }

  test("interpreted eval (no codegen) matches codegen'd result") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    def run(): Array[Double] = emb
      .select(VectorFunctions.vecDot(col("embedding"), col("embedding")).as("d"))
      .orderBy(col("d")).as[Double].collect()
    val codegen = run()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
  }

  test("band-keys: interpreted eval matches codegen'd result") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    def run(): Array[Seq[Int]] = emb
      .select(col("vec_id"),
        VectorFunctions.vecBandKeys(col("embedding"), 8, 8, 64).as("k"))
      .orderBy(col("vec_id")).select("k").as[Seq[Int]].collect()
    val codegen = run()
    codegen.foreach(_.foreach(k => k should (be >= 0 and be < 256)))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      run() shouldBe codegen
    }
  }

  test("band-keys: null elements contribute zero, short vectors stop early") {
    val d = df(schema,
      Row(1L, Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](0f)),
      Row(2L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](0f)))
    // spec form over the same degenerate vectors: vec_dot defines the
    // null/length contract; band keys must inherit it exactly
    val spec = d.select(col("id"),
      array((0 until 4).map(b =>
        Similarity.bandKeySpec(col("a"), b, bits = 4, dim = 8)): _*).as("k"))
    val native = d.select(col("id"),
      VectorFunctions.vecBandKeys(col("a"), 4, 4, 8).as("k"))
    assertSameRows(native, spec)
  }

}
