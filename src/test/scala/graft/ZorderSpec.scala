package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.Zorder

/** Z-order layout: correctness of the Morton key and a DIRECT
  * measurement of the scan-skipping payoff — the same 2-D box predicate
  * must decode far fewer rows from a z-ordered parquet file than from
  * an id-ordered one, purely via pushed-down row-group min/max stats. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala Morton mirror. */
  private def morton(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zkey matches the bit-interleave mirror, is monotone in box locality") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 20000L), (7L, 8L))
    val got = pts.toDF("x", "y")
      .select(Zorder.zkey($"x", $"y").as("z")).as[Long].collect()
    assert(got.toSeq === pts.map { case (x, y) => morton(x, y) })
    // interleave property: the 2x2 unit square occupies z 0..3
    assert(got.take(4).sorted === Seq(0L, 1L, 2L, 3L))
  }

  /** Rows the parquet reader actually DECODED for a filter — the scan
    * node's output rows metric (rows surviving row-group pruning). */
  private def rowsDecoded(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes a 2-D box to a fraction of the id-ordered scan") {
    val n = 200000
    // uniform grid points, written twice: id order (random w.r.t. the
    // plane) vs z order; small row groups so stats have resolution
    val base = spark.range(n.toLong).select(
      $"id",
      pmod($"id" * 48271L, lit(65536L)).as("x"),
      pmod($"id" * 16807L, lit(65536L)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    def write(df: DataFrame, sub: String): String = {
      val p = s"$dir/$sub"
      df.coalesce(1).write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(p)
      p
    }
    val plainPath = write(base.repartitionByRange(1, $"id").sortWithinPartitions($"id"), "plain")
    val zPath = write(Zorder.zorderLayout(base, "x", "y", 1), "z")
    def boxCount(path: String): (Long, Long) = {
      val scan = spark.read.parquet(path)
        .filter($"x".between(1000, 3000) && $"y".between(2000, 4000))
      val decoded = rowsDecoded(scan)
      (decoded, scan.count())
    }
    val (plainDecoded, plainCount) = boxCount(plainPath)
    val (zDecoded, zCount) = boxCount(zPath)
    // same answer from both layouts…
    assert(plainCount === zCount && zCount > 0)
    // …but the z layout decodes a small fraction of the id layout's rows
    // (row-group stats box both dimensions; id order is uncorrelated
    // with the plane, so its row groups all straddle the box)
    assert(plainDecoded > (n * 9) / 10,
      s"id-ordered layout unexpectedly pruned: $plainDecoded")
    assert(zDecoded * 5 < plainDecoded,
      s"z-ordered decode $zDecoded not <20% of id-ordered $plainDecoded")
  }
}
