package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** ID-space operators: dense renumbering and snapshot diffing — the
  * change-stream half of the reference's object model (an `.osc` file IS a
  * derived diff; `HistoryOps.mergeUpsert` applies one, `snapshotDiff`
  * produces one).
  */
object IdOps {

  /** Assign consecutive ids 1..n in the total order of `orderCols` —
    * WITHOUT a single-partition window (the classic distributed dense
    * renumbering). Plan: a range-partitioned sort, then zipWithIndex's
    * two-job per-partition-offset scheme (one lightweight count pass, one
    * map pass) — every stage is fully parallel, so it survives 10^12 rows
    * where `row_number() OVER (ORDER BY ...)` would serialize on one task.
    *
    * `orderCols` must be a TOTAL order (include a unique tiebreak column)
    * or the assignment within ties is partition-order-dependent.
    */
  def renumber(df: DataFrame, orderCols: String*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols.map(col): _*)
    val outSchema = sorted.schema.add("new_id", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Derive the change stream between two snapshots keyed by `keyCol`:
    * rows only in `newer` are creates, rows only in `older` are deletes,
    * rows in both with differing `hashCols` content are modifies;
    * unchanged rows are not emitted (the reference's .osc semantics,
    * reference/include/osmium/output/xml.hpp:205-227 — here produced
    * rather than parsed). One full-outer hash join on the key; content
    * compare via sha256 of the concatenated hash columns, so wide rows
    * diff without shuffling their payload twice.
    */
  def snapshotDiff(older: DataFrame, newer: DataFrame, keyCol: String,
                   hashCols: Seq[String]): DataFrame = {
    // \u0001-separated so ("ab","c") and ("a","bc") hash differently, and
    // nulls encoded explicitly (concat_ws SKIPS nulls, which would make
    // (x, null) and (null, x) collide and a null->value change invisible)
    def sig(df: DataFrame, as: String): DataFrame =
      df.select(col(keyCol),
        sha2(concat_ws("\u0001", hashCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0002"))): _*), 256).as(as))
    sig(older, "__old").join(sig(newer, "__new"), Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("__old").isNull, "create")
          .when(col("__new").isNull, "delete")
          .when(col("__old") =!= col("__new"), "modify"))
      .filter(col("op").isNotNull)
      .select(col(keyCol), col("op"))
  }

  /** Rendezvous (highest-random-weight) shard assignment: every key goes
    * to the shard maximizing the deterministic per-(key, shard) weight
    * mixId(key·31 + shard·1009 + 7) — the consistent-routing primitive
    * of a sharded ingest/serving tier. The property that makes it worth
    * an operator (and the spec): REMOVING a shard reassigns ONLY the
    * keys that lived on it (every other key's argmax is untouched),
    * unlike mod-N hashing where nearly all keys move.
    *
    * Scale posture: a pure map stage — the shard list is a LITERAL
    * struct array (compile-time constant, n_shards entries), the argmax
    * is array_max's struct ordering (max (w, shard), so weight ties
    * break to the larger shard id, mirrored in the oracle); no shuffle,
    * no join, no UDF. Output: (key, shard, w).
    */
  def rendezvousAssign(df: DataFrame, keyCol: String,
                       nShards: Int): DataFrame = {
    val shards = array((0 until nShards).map { s =>
      struct(
        graft.functions.Fns.mixId(
          col(keyCol) * 31 + lit(s.toLong) * 1009 + 7).as("w"),
        lit(s.toLong).as("shard"))
    }: _*)
    df.select(col(keyCol), array_max(shards).as("m"))
      .select(col(keyCol), col("m.shard").as("shard"), col("m.w").as("w"))
  }
}
