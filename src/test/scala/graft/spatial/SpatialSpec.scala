package graft.spatial

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def pts(ts: (Long, Long, Long)*) =
    ts.toDF("id", "x_e6", "y_e6")

  test("proximityJoin: exact radius boundary — <= kept, just-over dropped") {
    val a = pts((1L, 0L, 0L))
    val b = pts((10L, 100L, 0L), (11L, 101L, 0L), (12L, 60L, 80L))
    val out = Spatial.proximityJoin(a, b, radius = 100L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    out.keySet shouldBe Set(10L, 12L)   // 100 on the dot and 3-4-5 at 100
    out(10L) shouldBe 10000L
    out(12L) shouldBe 10000L
  }

  test("proximityJoin: pairs straddling a cell boundary are found (the 9-key reason)") {
    // radius 100: x=99 is in cell 0, x=101 in cell 1; distance 2
    val a = pts((1L, 99L, 50L))
    val b = pts((2L, 101L, 50L))
    Spatial.proximityJoin(a, b, 100L).count() shouldBe 1L
  }

  test("proximityJoin: negative coordinates use uniform floor cells") {
    // straddling the origin: -40 (cell -1) vs 40 (cell 0), distance 80
    val a = pts((1L, -40L, -40L))
    val b = pts((2L, 40L, 40L), (3L, -240L, -40L))
    val found = Spatial.proximityJoin(a, b, 120L)
      .select("b_id").as[Long].collect().toSet
    found shouldBe Set(2L)   // id 3 at dx=200 is beyond radius
  }

  test("proximityJoin: coincident points pair at dist2 = 0; no duplicate candidates") {
    val a = pts((1L, 7L, -7L), (2L, 7L, -7L))
    val out = Spatial.proximityJoin(a, a, 50L)
      .filter(col("a_id") < col("b_id")).collect()
    out.length shouldBe 1
    out.head.getLong(2) shouldBe 0L
  }

  test("proximityJoin agrees with brute force on a pseudo-random field") {
    val field = pts((1 to 200).map(i =>
      (i.toLong, (i * 7919L % 2001) - 1000, (i * 104729L % 2001) - 1000)): _*)
    val brute = field.as("a").join(field.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        ((col("a.x_e6") - col("b.x_e6")) * (col("a.x_e6") - col("b.x_e6")) +
          (col("a.y_e6") - col("b.y_e6")) * (col("a.y_e6") - col("b.y_e6")))
          .as("dist2"))
      .filter(col("dist2") <= 150L * 150L)
    val cells = Spatial.proximityJoin(field, field, 150L)
      .filter(col("a_id") < col("b_id"))
    assertSameRows(cells, brute)
  }

  test("proximityJoin is invariant under input partitioning") {
    val field = pts((1 to 150).map(i =>
      (i.toLong, (i * 31L % 997) - 500, (i * 57L % 997) - 500)): _*)
    assertSameRows(
      Spatial.proximityJoin(field, field, 200L),
      Spatial.proximityJoin(field.repartition(7), field.repartition(5), 200L))
  }

  /** Reference DBSCAN: literal Ester 1996 semantics, quadratic. */
  private def bruteDbscan(ps: Seq[(Long, Long, Long)], eps: Long,
                          minPts: Int): Map[Long, (String, Option[Long])] = {
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      dx * dx + dy * dy <= eps * eps
    }
    val core = ps.filter(p => ps.count(q => near(p, q)) >= minPts)
      .map(_._1).toSet
    // components over core-core adjacency by fixpoint min-label
    var lab = core.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      for (a <- ps if core(a._1); b <- ps if core(b._1) && near(a, b)) {
        val m = math.min(lab(a._1), lab(b._1))
        if (lab(a._1) != m) { lab += a._1 -> m; changed = true }
        if (lab(b._1) != m) { lab += b._1 -> m; changed = true }
      }
    }
    ps.map { p =>
      if (core(p._1)) p._1 -> (("core", Some(lab(p._1))))
      else {
        val coreNbrs = ps.filter(q => core(q._1) && near(p, q))
        if (coreNbrs.nonEmpty)
          p._1 -> (("border", Some(coreNbrs.map(q => lab(q._1)).min)))
        else p._1 -> (("noise", None))
      }
    }.toMap
  }

  private def runDbscan(ps: Seq[(Long, Long, Long)], eps: Long, minPts: Int) =
    Spatial.dbscan(pts(ps: _*), eps, minPts).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  test("dbscan: hand line cluster — middle core, ends border, far point noise") {
    val ps = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 20L, 0L),
      (9L, 1000L, 1000L))
    val out = runDbscan(ps, eps = 15L, minPts = 3)
    out(2L) shouldBe (("core", Some(2L)))      // its own component min
    out(1L) shouldBe (("border", Some(2L)))
    out(3L) shouldBe (("border", Some(2L)))
    out(9L) shouldBe (("noise", None))
  }

  test("dbscan: two clusters get distinct component-min labels") {
    val a = (0 until 5).map(i => (10L + i, i * 10L, 0L))
    val b = (0 until 5).map(i => (20L + i, i * 10L, 5000L))
    val out = runDbscan(a ++ b, eps = 15L, minPts = 3)
    out.values.count(_._1 == "core") should be >= 6
    val labA = out(12L)._2.get; val labB = out(22L)._2.get
    labA should not be labB
    a.foreach(p => out(p._1)._2 shouldBe Some(labA))
    b.foreach(p => out(p._1)._2 shouldBe Some(labB))
  }

  test("dbscan: a border between two clusters takes the MIN cluster label") {
    // two 4-core columns; the mid point sees one core per side plus
    // itself = 3 < minPts 4, so it stays border and cannot bridge
    val left = (0 until 4).map(i => (1L + i, 0L, i * 10L))
    val right = (0 until 4).map(i => (11L + i, 60L, i * 10L))
    val mid = Seq((50L, 30L, 10L))
    val out = runDbscan(left ++ right ++ mid, eps = 30L, minPts = 4)
    out(50L) shouldBe (("border", Some(1L)))   // min(label L=1, label R=11)
    out shouldBe bruteDbscan(left ++ right ++ mid, 30L, 4)
  }

  test("dbscan: an isolated core (all neighbors within eps of itself) keeps a cluster") {
    // minPts = 1 makes every point core; singletons self-cluster
    val out = runDbscan(Seq((5L, 0L, 0L), (7L, 10000L, 0L)), 10L, 1)
    out(5L) shouldBe (("core", Some(5L)))
    out(7L) shouldBe (("core", Some(7L)))
  }

  test("clusterCompactness: Konig-Huygens scatter by hand, noise excluded") {
    import spark.implicits._
    val ps = pts((1L, 0L, 0L), (2L, 10L, 0L), (3L, 20L, 0L),
      (9L, 500L, 500L))
    val asg = Seq((1L, Some(7L)), (2L, Some(7L)), (3L, Some(7L)),
      (9L, None: Option[Long])).toDF("id", "cluster")
    val out = Spatial.clusterCompactness(ps, asg).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("n_points") shouldBe 3L
    // sum|p|^2 = 500, |sum p|^2 = 900: 3*500 - 900 = 600 = 3 * 200
    out.head.getAs[Long]("scatter_num") shouldBe 600L
    out.head.getAs[Long]("mean_radius2") shouldBe 66L   // 600 div 9
  }

  test("clusterCompactness composes with dbscan and is partition-invariant") {
    val ps = (1 to 120).map(i =>
      (i.toLong, (i * 7919 % 2001 - 1000).toLong,
        (i * 104729 % 2001 - 1000).toLong))
    val asg = Spatial.dbscan(pts(ps: _*), eps = 200L, minPts = 3)
    val a = Spatial.clusterCompactness(pts(ps: _*), asg)
      .orderBy("cluster").collect().map(_.toSeq)
    val b = Spatial.clusterCompactness(pts(ps: _*).repartition(7),
      Spatial.dbscan(pts(ps: _*).repartition(5), eps = 200L, minPts = 3))
      .orderBy("cluster").collect().map(_.toSeq)
    a should contain theSameElementsInOrderAs b
    a.foreach(r => r(3).asInstanceOf[Long] should be >= 0L)
  }

  test("dbscan matches brute-force Ester semantics on pseudo-random points") {
    val ps = (1 to 200).map(i =>
      (i.toLong, (i * 7919 % 2001 - 1000).toLong,
        (i * 104729 % 2001 - 1000).toLong))
    val expected = bruteDbscan(ps, eps = 150L, minPts = 4)
    runDbscan(ps, 150L, 4) shouldBe expected
    expected.values.map(_._1).toSet shouldBe Set("core", "border", "noise")
  }
}
