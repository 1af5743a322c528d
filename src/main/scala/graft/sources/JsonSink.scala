package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Per-partition JSON sinks (reference O11: each reduce task persists its
  * partition as /data/out/reduce-<part>.json — worker/worker.py:27,34-36).
  *
  * Two shapes:
  *  - `writeJsonLines`: idiomatic Spark JSON-lines, one file per shuffle
  *    partition (the scalable default);
  *  - `writeReduceObjects`: byte-shape parity with the reference — ONE
  *    JSON object {word: count, ...} per partition file named
  *    reduce-<pid>.json, written by each task to shared storage.
  */
object JsonSink {

  def writeJsonLines(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").json(outDir)

  /** (word, cnt) rows → R hash partitions → reduce-<pid>.json objects.
    * Non-ASCII is preserved verbatim (reference ensure_ascii=False). */
  def writeReduceObjects(counts: DataFrame, outDir: String, numPartitions: Int): Unit = {
    Files.createDirectories(Paths.get(outDir))
    counts.select(col("word"), col("cnt"))
      .repartition(numPartitions, col("word"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val sb = new StringBuilder("{")
        var first = true
        rows.foreach { r =>
          if (!first) sb.append(", ")
          first = false
          sb.append(escape(r.getString(0))).append(": ").append(r.getLong(1))
        }
        sb.append("}")
        Files.write(Paths.get(outDir, s"reduce-$pid.json"),
          sb.toString.getBytes(StandardCharsets.UTF_8))
        ()
      }
  }

  private def escape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
