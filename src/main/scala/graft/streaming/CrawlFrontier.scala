package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental crawl frontier — the streaming form of q490's batch BFS:
  * real crawls don't run a fixed number of expansion rounds, they run
  * the frontier as a LOOP against durable state. Frontier waves land as
  * files in a landing directory; one `Trigger.AvailableNow` run per
  * round ingests exactly the newly-landed wave (the q136/q483
  * checkpointed landing-zone pattern), and `foreachBatch` does the
  * admission: dedup the wave, anti-join the VISITED table (a
  * [[graft.sources.ManifestCommit]] parquet table — the same on-disk
  * snapshot state the admission/near-dup tiers use), commit the
  * newly-visited rows as a manifest txn, expand them through the edge
  * list, and land the next wave. The loop converges when an expansion
  * discovers nothing new.
  *
  * Determinism + replay: each wave lands as part files under a
  * depth-derived unique prefix (`wave-DDDDD-part-*`) and completes by
  * writing a marker under `<root>/waves-done/`, so a re-run over the
  * same root lands nothing new (the marker exists), the file-source
  * checkpoint has already consumed every wave, and the visited table
  * is untouched — replay CONVERGES instead of duplicating (the
  * replay-convergence spec drives exactly this). A crash mid-landing
  * (marker absent) re-lands the whole wave under fresh part names;
  * duplicate rows wash out in the min-depth/anti-join admission.
  *
  * SCALE: per-round work is two distributed joins (wave×visited
  * anti-join, wave×edges expansion) plus one manifest commit — no
  * driver-side state beyond the round counter; the visited set lives
  * on disk and is read as a plain parquet union. Round count = graph
  * depth from the seeds (log-ish for web-shaped graphs), the same
  * bound every BFS pays. The edge list is localCheckpoint-materialized
  * once, not recomputed per round (in a real crawl it is a table on
  * disk). Wave landing is distributed: each wave writes as N part
  * files at the frame's own parallelism through Hadoop FileSystem on
  * the root's filesystem (executors write the shared store directly —
  * no driver-local staging, no single-task `coalesce(1)` bottleneck on
  * a million-URL production wave).
  */
object CrawlFrontier {

  private def visitedOrEmpty(spark: SparkSession, table: String): DataFrame =
    if (graft.sources.ManifestCommit.currentSnapshot(spark, table).isEmpty)
      spark.range(0).select(col("id").as("doc_id"), col("id").as("depth"))
    else graft.sources.ManifestCommit.readManifested(spark, table)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("depth").cast("long").as("depth"))

  /** Lands `df` as a MULTI-FILE parquet wave: every part file renames
    * to `<landing>/<name>-part-*.parquet` (the EventsStream `waveN-`
    * unique-prefix discipline — the file-source tracker keys by path,
    * so each landed file must be new; how MANY files a wave spans is
    * free). Writer parallelism = the frame's partitioning: a
    * million-URL production wave lands as N part files instead of
    * bottlenecking on one write task (the r19 `coalesce(1)` watch-item).
    *
    * All I/O goes through Hadoop FileSystem against the landing dir's
    * own filesystem — the stage dir is a dot-prefixed sibling (invisible
    * to Spark's file listing even mid-write) under the SAME root, never
    * driver-local java.io temp space, so executors on a cluster write
    * to the shared store directly.
    *
    * Completion protocol (a landed-prefix check alone would make a
    * crash between the first and last part rename PERMANENT — the
    * unmoved parts' subtrees would never be crawled): a wave counts as
    * landed only once its marker under `<root>/waves-done/` exists.
    * Replay with the marker → no-op; crash before the marker → the
    * whole wave re-stages under fresh part names and lands again
    * (duplicate rows are harmless — admission min-depth-groups the
    * batch and anti-joins the visited table). Every rename's result is
    * CHECKED: a false return aborts the round instead of letting the
    * stage-dir cleanup silently destroy the unmoved part. */
  private def land(df: DataFrame, landing: org.apache.hadoop.fs.Path,
      name: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val fs = landing.getFileSystem(conf)
    val doneDir = new org.apache.hadoop.fs.Path(
      landing.getParent, "waves-done")
    val marker = new org.apache.hadoop.fs.Path(doneDir, name)
    if (!fs.exists(marker)) {
      val stage =
        new org.apache.hadoop.fs.Path(landing.getParent, s".stage-$name")
      if (fs.exists(stage)) fs.delete(stage, true)
      df.write.parquet(stage.toString)
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(stage, "part-*")))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .foreach { st =>
          val dst = new org.apache.hadoop.fs.Path(
            landing, s"$name-${st.getPath.getName}")
          if (!fs.rename(st.getPath, dst)) throw new java.io.IOException(
            s"CrawlFrontier: rename ${st.getPath} -> $dst failed; " +
              "aborting the wave landing (stage dir preserved)")
        }
      fs.delete(stage, true)
      fs.mkdirs(doneDir)
      fs.create(marker, true).close()
    }
  }

  /** Runs the incremental frontier to convergence. `edges` is
    * (src, dst); `seeds` is (doc_id). Returns the visited table:
    * (doc_id, depth of first discovery) — BFS shortest-round depths,
    * read back from the ManifestCommit state under `root/visited`. */
  def run(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
      root: String, maxRounds: Int = 64): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val conf = spark.sessionState.newHadoopConf()
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(conf)
    val landing = new org.apache.hadoop.fs.Path(rootP, "landing")
    fs.mkdirs(landing)
    val ckpt = new org.apache.hadoop.fs.Path(rootP, "ckpt").toString
    val table = new org.apache.hadoop.fs.Path(rootP, "visited").toString
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    land(seeds.select(col("doc_id").cast("long").as("doc_id"))
      .withColumn("depth", lit(0L)), landing, "wave-00000", conf)
    val waveSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, depth BIGINT")
    var rounds = 0
    var prev = -1L
    var cur = 0L
    while (rounds < maxRounds && cur != prev) {
      prev = cur
      val q = spark.readStream.schema(waveSchema)
        .parquet(landing.toString)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val ss = batch.sparkSession
          // a backlog replay can deliver several waves in one batch:
          // keep each doc's smallest depth (BFS first-discovery)
          val wave = batch.groupBy("doc_id")
            .agg(min("depth").as("depth"))
          val fresh = wave
            .join(visitedOrEmpty(ss, table), Seq("doc_id"), "left_anti")
            .localCheckpoint()
          if (fresh.head(1).nonEmpty) {
            // PARTITION the commit by depth: ManifestCommit's upsert
            // keys entries by partition path, so an unpartitioned txn
            // would REPLACE the previous round's entry (root key "")
            // instead of accumulating — each round must land as a new
            // depth=D partition for the visited set to grow
            graft.sources.ManifestCommit
              .overwriteViaManifest(ss, table, Seq("depth"))(
                dir => fresh.write.partitionBy("depth").parquet(dir))
            val d = fresh.agg(max("depth")).head().getLong(0)
            val next = e
              .join(fresh.select(col("doc_id").as("src")), Seq("src"))
              .select(col("dst").as("doc_id")).distinct()
              .join(visitedOrEmpty(ss, table), Seq("doc_id"), "left_anti")
              .withColumn("depth", lit(d + 1L))
              .localCheckpoint()
            if (next.head(1).nonEmpty)
              land(next, landing, f"wave-${d + 1L}%05d", conf)
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      cur = graft.sources.ManifestCommit.currentSnapshot(spark, table)
        .map(_ => graft.sources.ManifestCommit
          .countManifested(spark, table)).getOrElse(0L)
      rounds += 1
    }
    visitedOrEmpty(spark, table)
  }
}
