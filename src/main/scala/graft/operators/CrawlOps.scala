package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Crawl-scheduling operators over capture logs (url, warc_ts). */
object CrawlOps {

  /** RECRAWL FRONTIER scheduler with per-host politeness: canonicalize
    * every captured URL, keep its most recent capture time, and schedule
    * stalest-first WITHIN each host — the i-th URL of a host (ordered by
    * last capture ascending, then canonical url) fetches at
    * `baseUs + i·delayUs`, so no host is ever hit more than once per
    * politeness window no matter how the fetch fleet drains the queue.
    *
    * Shape: one groupBy on the canonical url (exact dedup of capture
    * history), one per-host window for the slot. The per-host sequence
    * is inherently sequential — a politeness queue IS a total order per
    * host — so the window partition is the honest minimum; a mega-host
    * (10^8 urls) makes one big sort partition, which Spark's external
    * sort spills rather than breaks, and every other host proceeds in
    * parallel. Output: (curl, host, slot, fetch_us).
    */
  def frontierSchedule(captures: DataFrame, baseUs: Long,
                       delayUs: Long): DataFrame = {
    val cand = captures
      .groupBy(Fns.canonicalizeUrl(col("url")).as("curl"))
      .agg(max(unix_micros(col("warc_ts"))).as("last_us"))
      .withColumn("host", Fns.urlNormHost(col("curl")))
    val w = Window.partitionBy("host").orderBy(col("last_us").asc, col("curl"))
    cand.withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .select(col("curl"), col("host"), col("slot"),
        (lit(baseUs) + col("slot") * delayUs).as("fetch_us"))
  }
}
