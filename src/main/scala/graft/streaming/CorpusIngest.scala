package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous corpus ingestion with history-backed exact dedup — the
  * streaming face of [[graft.ops.Dedup.incrementalNew]]. Each micro-batch:
  *
  *   1. collapses in-batch duplicates to the lowest doc id (aggregate +
  *      join back on the fingerprint — never a window over a hot
  *      fingerprint);
  *   2. anti-joins against the PERSISTED fingerprint store, so re-crawled
  *      content already ingested in ANY earlier batch or run is dropped
  *      without ever re-reading historical text (the store is 16-byte md5
  *      rows; column pruning keeps the join that size);
  *   3. lands the surviving docs under `docs/batch_id=N` and appends their
  *      fingerprints under `fps/batch_id=N` — both keyed by the
  *      checkpointed batch id, so a retried batch OVERWRITES its own
  *      directories instead of duplicating (the [[EventsStream.landingSink]]
  *      exactly-once recipe, applied to two outputs atomically enough for
  *      an append-only store: the fingerprint read excludes the current
  *      and later batch ids, so a half-written retry batch can never drop
  *      its own docs).
  *
  * At 100 TB this is the production ingest loop: round N shuffles
  * |batch| + |history fingerprints| — the corpus text is written once and
  * never rescanned.
  */
object CorpusIngest {

  /** `blocklist` (non-empty) drops blocked documents per micro-batch
    * BEFORE fingerprinting ([[graft.ops.Corpus.blocklistFilter]]'s
    * broadcast semi-join — the term list ships with the task, no state):
    * a blocked doc must neither land nor claim a fingerprint, or a later
    * clean re-crawl of different content colliding with it would be
    * silently dropped against a doc that was never ingested.
    */
  def dedupIngest(
      stream: DataFrame,
      root: String,
      checkpoint: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      blocklist: Seq[String] = Nil): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: Dataset[Row], batchId: Long) =>
        val spark = batch0.sparkSession
        val batch =
          if (blocklist.isEmpty) batch0
          else graft.ops.Corpus.blocklistFilter(batch0.toDF(), blocklist, textCol, idCol)
        val seen = seenFingerprints(spark, s"$root/fps", batchId)
        val fp = batch.select(
          col(idCol),
          col(textCol),
          graft.ops.TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
        val firsts = fp.groupBy("fingerprint").agg(min(col(idCol)).as(idCol))
        val newDocs = fp
          .join(firsts, Seq("fingerprint", idCol))
          .join(seen, Seq("fingerprint"), "left_anti")
          .localCheckpoint() // two writes below; don't recompute the joins
        newDocs
          .select(col(idCol), col(textCol), col("fingerprint"))
          .write.mode(SaveMode.Overwrite).parquet(s"$root/docs/batch_id=$batchId")
        newDocs
          .select("fingerprint")
          .write.mode(SaveMode.Overwrite).parquet(s"$root/fps/batch_id=$batchId")
        ()
      }
      .start()

  /** The NEAR-dup complement of [[dedupIngest]]: each micro-batch
    * collapses its own near-dup clusters to one representative, drops
    * survivors that are near-dups of ANY earlier batch, and lands the
    * rest while growing a probeable LSH index as it goes — the
    * [[graft.ops.Dedup.ingestLshBatch]] contract (first non-empty batch
    * claims/replaces the store, history restricted to strictly-earlier
    * batch ids, batch-id-keyed overwrites for exactly-once). Exact
    * re-crawls are near-dups at Jaccard 1.0, so this subsumes
    * [[dedupIngest]] where the corpus can afford shingling every batch;
    * run both when the exact face's cheap md5 pass should shortcut the
    * bulk first. The landed corpus is `$path/docs`, probeable history is
    * `$path/bands`/`shingles` via [[graft.ops.Dedup.probeLshIndex]].
    */
  def nearDedupIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.8,
      shingle: Int = 3,
      maxBucket: Int = 50,
      textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Dedup.ingestLshBatch(
          batch.toDF(), path, batchId,
          numHashes, rowsPerBand, threshold, shingle, maxBucket, textCol, idCol)
        ()
      }
      .start()

  /** The SPAN-level complement of [[nearDedupIngest]]: each micro-batch is
    * probed for duplicated token runs against all earlier batches'
    * gram postings (plus in-batch duplication), lands REWRITTEN (spans
    * excised — the [[graft.ops.TextAnalysis.stripDupSpans]] policy applied
    * at ingest time, with per-doc `n_removed`), and grows the probeable
    * gram index with the ORIGINAL text's postings so future re-crawls
    * still match. The [[graft.ops.TextAnalysis.ingestGramBatch]] contract:
    * first non-empty batch claims/replaces the store, history restricted
    * to strictly-earlier batch ids, batch-id-keyed overwrites for
    * exactly-once. Landed corpus is `$path/docs`; probeable history is
    * `$path/postings` via [[graft.ops.TextAnalysis.probeDupSpans]].
    */
  def spanDedupIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      n: Int = 5,
      minTokens: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.TextAnalysis.ingestGramBatch(
          batch.toDF(), path, batchId, n, minTokens, textCol, idCol)
        ()
      }
      .start()

  /** The EXACT-join complement of [[nearDedupIngest]]: each micro-batch's
    * qualifying Jaccard pairs (against all earlier batches AND in-batch,
    * the [[graft.ops.Dedup.ingestSetJoinBatch]] contract) land under
    * `$path/pairs/batch_id=N` while the prefix index grows — no LSH
    * recall dial, every ≥-threshold pair, candidate-bounded by the
    * frozen-order prefix filter. Landed pairs are the review/keep-policy
    * feed; probeable history is `$path/docs`/`prefix` via
    * [[graft.ops.Dedup.probeSetJoinIndex]].
    */
  def setJoinDedupIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      thresholdMilli: Int = 800,
      shingle: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Dedup.ingestSetJoinBatch(
          batch.toDF(), path, batchId, thresholdMilli, shingle, textCol, idCol)
        ()
      }
      .start()

  /** [[setJoinDedupIngest]]'s sibling over the token-edit signature
    * index ([[graft.ops.Dedup.ingestTokenEditBatch]]): every ed≤1 pair
    * per batch lands under `$path/pairs/batch_id=N`, signatures grow
    * batch-keyed.
    */
  def tokenEditIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Dedup.ingestTokenEditBatch(batch.toDF(), path, batchId, textCol, idCol)
        ()
      }
      .start()

  /** Streaming eval DECONTAMINATION: every micro-batch is probed against
    * a PERSISTED benchmark gram index
    * ([[graft.ops.TextAnalysis.writeGramIndex]] over the eval suites —
    * built once, before the stream starts) and lands REWRITTEN with its
    * contaminated spans excised
    * ([[graft.ops.TextAnalysis.stripContamination]]'s policy at ingest
    * time). The index is static — batches never grow it — so retiring an
    * eval suite is a tombstone delete on the index, effective from the
    * next batch. Landed corpus is `$outRoot/docs` with per-doc
    * `n_removed`. Compose AFTER a dedup ingest (its landed corpus is
    * this stream's source) for the full clean.
    */
  def decontamIngest(
      stream: DataFrame,
      benchPath: String,
      outRoot: String,
      checkpoint: String,
      n: Int = 5,
      minTokens: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.TextAnalysis.decontamBatch(
          batch.toDF(), benchPath, outRoot, batchId, n, minTokens, textCol, idCol)
        ()
      }
      .start()

  /** The MEDIA complement of [[nearDedupIngest]]: each micro-batch of
    * media rows ([[graft.ops.Multimodal.asMedia]] contract) collapses its
    * own near-dup images/audio to one representative (banded perceptual-
    * hash pairs → connected components), drops survivors that near-match
    * ANY earlier batch's live fingerprints, and lands the rest while
    * growing a probeable fingerprint index — the
    * [[graft.ops.Multimodal.ingestMediaBatch]] contract (first non-empty
    * batch claims/replaces the store, history restricted to
    * strictly-earlier batch ids, batch-id-keyed overwrites for
    * exactly-once). Landed corpus is `$path/docs`; probeable history is
    * `$path/fps` via [[graft.ops.Multimodal.probeMediaIndex]]. Raw media
    * bytes are decoded once per batch and never enter the index — history
    * rounds shuffle 4 longs + a tag per item.
    */
  def mediaDedupIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Multimodal.ingestMediaBatch(batch.toDF(), path, batchId, maxHamming, maxBucket)
        ()
      }
      .start()

  /** The fingerprint store restricted to batches strictly BEFORE
    * `batchId`: partition pruning on the `batch_id` directory key makes
    * the exclusion free, and it is what makes a retried batch safe — its
    * own half-written fingerprints are never read back against it.
    * An absent store (first ever batch) reads as empty.
    */
  private def seenFingerprints(spark: SparkSession, fpRoot: String, batchId: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(fpRoot)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.parquet(fpRoot).filter(col("batch_id") < batchId).select("fingerprint")
    else {
      import spark.implicits._
      Seq.empty[String].toDF("fingerprint")
    }
  }
}
