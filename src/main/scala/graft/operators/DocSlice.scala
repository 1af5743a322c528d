package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** MEASUREMENT-MODE doc-id slice for the two registry entries whose
  * DuckDB oracles are infeasible at sf1 (r13 verdict item 5):
  * `dedup_ensemble_clusters` (recursive transitive closure) and
  * `substring_dedup_clean` (span arithmetic) both time out at 50k sf1
  * docs, so the whole-registry sf1 sweep ran them engine-only.
  *
  * `GRAFT_DOC_SLICE=<n>` restricts BOTH the Spark plan and the oracle
  * SQL of those two entries to `documents.doc_id < n` — the slice is a
  * deterministic id range, the restricted pipelines are rebuilt from
  * the sliced corpus on both engines (including corpus-dependent knobs
  * like the frequent-band cap, which is part of the operator's
  * semantics and must see the same corpus on both sides), and the
  * hash compare is as strict as ever, just over a smaller world.
  *
  * UNSET (the driver's mode, and every other entry) this is inert:
  * the default pipelines and oracles are byte-identical to before.
  * Read once at class load — Verify dumps the oracle SQL in the same
  * JVM that builds the plans, so the two sides cannot disagree. */
object DocSlice {
  /** Parse with a nameable error: a bare .toLong here would surface a
    * typo'd env value as an opaque ExceptionInInitializerError at
    * registry load (review finding). */
  private def parsed(name: String): Option[Long] =
    sys.env.get(name).filter(_.nonEmpty).map { v =>
      try v.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$name must be a whole number of rows, got '$v'")
      }
    }

  val limit: Option[Long] = parsed("GRAFT_DOC_SLICE")

  /** Embedding-side slice (`GRAFT_VEC_SLICE`) — the ensemble closure's
    * actual sf1 killer is the ~486k embedding pairs at 8k vectors
    * (cosine 0.35 forms huge components; the recursive reachability
    * set is Σ size²), so the vec corpus needs its own bound. The LSH
    * plane count is corpus-count-derived on BOTH engines, so the
    * sliced pipelines re-derive it from the sliced count consistently. */
  val vecLimit: Option[Long] = parsed("GRAFT_VEC_SLICE")

  /** SQL predicate fragment for the oracle's base-documents CTE
    * (leading space; empty when the slice is off). */
  def docsWhere: String = limit.map(n => s" WHERE doc_id < $n").getOrElse("")

  /** Same for the embeddings base (planes count AND signature CTEs). */
  def vecsWhere: String =
    vecLimit.map(n => s" WHERE vec_id < $n").getOrElse("")

  /** Slice a documents-shaped DataFrame (no-op when off). */
  def docs(df: DataFrame): DataFrame =
    limit.map(n => df.filter(col("doc_id") < n)).getOrElse(df)

  /** Slice an embeddings-shaped DataFrame (no-op when off). */
  def vecs(df: DataFrame): DataFrame =
    vecLimit.map(n => df.filter(col("vec_id") < n)).getOrElse(df)
}
