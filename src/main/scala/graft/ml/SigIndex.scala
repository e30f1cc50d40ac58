package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STORED form of bit-signature near-dup screening (r12) — the
  * fourth member of the persistent-index family ([[BandIndex]] for
  * minhash text dedup, [[LexIndex]] for lexical retrieval,
  * [[IvfIndex]] for vectors): a bucketed banded-hamming index over
  * fixed-length bit-string signatures, serving the incremental probe
  * path for ANY signature source — perceptual image hashes
  * ([[Multimodal.PerceptualHash]]) and simhash text fingerprints
  * flow through unchanged. The batch form
  * ([[Multimodal.hammingNearDupPairs]]) re-bands the corpus per
  * call; at 100 TB the signatures are the thing you band ONCE and
  * probe forever — the exact argument that produced the other three
  * indexes.
  *
  * Layout, ONE catalog table (simpler than BandIndex's pair): `(band,
  * key, id, sig)` bucketed+sorted by `(band, key)` — a probe's
  * band-key equi-join streams the corpus side straight from its
  * buckets with no exchange, and the full signature RIDES the band
  * row (64 bits ≈ 64 chars; `bands`× duplication of a tiny column),
  * so the hamming verify needs no second table and no second join.
  * That is the deliberate trade against BandIndex's two-table shape:
  * minhash verify keys are unbounded shingle SETS (must live in their
  * own doc-bucketed table); a signature is fixed-width, so inlining
  * it buys a one-table crash story — a single `saveAsTable(Append)`
  * either commits or doesn't, there is no inter-table window, and
  * id-idempotence alone makes at-least-once replay exact.
  *
  * Pigeonhole exactness carries over from the batch form: two
  * signatures within hamming distance `bands`-1 must agree on at
  * least one whole band, so for `maxDist < bands` the candidate join
  * generates every qualifying pair — [[probe]] `require`s it rather
  * than silently under-recalling.
  *
  * Reference behavior spec: the dedup screen of blq-cli's ingest path
  * (bird.py:775-919, continuously maintained corpus state), applied
  * to the multimodal/simhash signature family. */
object SigIndex {

  /** Per-row banding precondition (r12 advice): a signature whose
    * length is not a positive multiple of `bands` would silently
    * degrade — floor-truncated bandLen leaves the tail bits out of
    * every band key (weaker blocking), and len < bands yields
    * bandLen 0 so every key is the empty string and the candidate
    * join degenerates to all-pairs. The module's contract elsewhere
    * is enforce-don't-degrade ([[probe]]'s pigeonhole `require`), so
    * the sig column is routed through a codegen'd CASE that
    * `raise_error`s on the first offending ROW — stronger than a
    * driver-side first-row sample (mixed-length batches fail too)
    * and free of an extra driver action on this lazily-composed
    * path. */
  private[ml] def checkedSig(sig: Column, bands: Int): Column =
    when(length(sig) >= bands && length(sig) % bands === 0, sig)
      .otherwise(raise_error(concat(
        lit(s"signature length must be a positive multiple of bands=$bands, got "),
        length(sig).cast("string"))))

  /** `(band, key, id, sig)` rows for equal-length bit-string
    * signatures: `bands` equal substrings per signature. Shared by
    * write/append/probe so the banding rule can never diverge
    * between the stored and probe sides. */
  def bandRows(sigs: DataFrame, idCol: String, sigCol: String,
      bands: Int): DataFrame = {
    require(bands > 0, s"bands must be positive, got $bands")
    val s = sigs.select(col(idCol).as("id"),
      checkedSig(col(sigCol), bands).as("sig"))
    val bandLen = (length(col("sig")) / bands).cast("int")
    s.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          i => col("sig").substr(i * bandLen + 1, bandLen))))
      .select(col("pos").as("band"), col("col").as("key"),
        col("id"), col("sig"))
  }

  /** Build the index over `sigs` (`idCol` long, `sigCol` equal-length
    * bit strings). `bands` fixes the banding for the table's life —
    * probes must use the same value (and enforce their `maxDist`
    * against it). */
  def write(sigs: DataFrame, idCol: String, sigCol: String,
      table: String, bands: Int, buckets: Int): Unit =
    bandRows(sigs, idCol, sigCol, bands)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("compression", "zstd")
      .bucketBy(buckets, "band", "key")
      .sortBy("band", "key")
      .saveAsTable(table)

  /** Fold NEW signatures in — additive, batch-sized, id-IDEMPOTENT
    * (already-indexed ids are dropped, so an at-least-once replay is
    * a no-op; the gate is a columnar id scan, the price the other
    * indexes pay for the same guarantee). One table, one append: a
    * crash either commits the batch or leaves the index untouched —
    * no recover procedure needed. */
  def append(spark: SparkSession, table: String, sigs: DataFrame,
      idCol: String, sigCol: String, bands: Int): Unit = {
    if (sigs.isEmpty) return // no-op, no empty bucket files
    val buckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$table is not a bucketed signature index table"))
    // resurrection guard FIRST, on the raw batch (the shared rule)
    Tombstones.requireNoResurrection(spark, table, sigs, idCol)
    val fresh = sigs.select(col(idCol).as(idCol), col(sigCol).as(sigCol))
      .join(spark.table(table).select(col("id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
    if (fresh.isEmpty) return // pure replay
    bandRows(fresh, idCol, sigCol, bands)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .option("compression", "zstd")
      .bucketBy(buckets, "band", "key")
      .sortBy("band", "key")
      .saveAsTable(table)
  }

  /** Near-dup pairs for a NEW batch against the stored corpus (plus
    * within-batch pairs, so a batch containing its own duplicates
    * screens completely): banded candidates from the co-located
    * (band, key) join, codegen [[graft.plans.BitHamming]] verify,
    * `(id_a, id_b, hamming)` with id_a < id_b. EXACT for
    * `maxDist < bands` by pigeonhole — enforced. The batch must be
    * id-disjoint from the indexed corpus (it is the data that arrived
    * after the index was written — the [[BandIndex.probe]] contract). */
  def probe(spark: SparkSession, table: String, sigs: DataFrame,
      idCol: String, sigCol: String, maxDist: Int, bands: Int): DataFrame = {
    require(bands > maxDist,
      s"pigeonhole exactness needs bands > maxDist, got $bands <= $maxDist")
    val batch = bandRows(sigs, idCol, sigCol, bands)
    // tombstoned ids never pair (the shared immediate-forget protocol)
    val corpus = Tombstones.live(spark, table, spark.table(table), "id")
    val cross = corpus.as("c")
      .join(batch.as("b"),
        col("c.band") === col("b.band") && col("c.key") === col("b.key"))
      .select(
        least(col("c.id"), col("b.id")).as("id_a"),
        greatest(col("c.id"), col("b.id")).as("id_b"),
        when(col("c.id") < col("b.id"), col("c.sig")).otherwise(col("b.sig")).as("sig_a"),
        when(col("c.id") < col("b.id"), col("b.sig")).otherwise(col("c.sig")).as("sig_b"))
    val within = batch.as("a")
      .join(batch.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
    cross.union(within).distinct()
      .withColumn("hamming",
        graft.plans.BitHamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
  /** Shared tombstone protocol (see [[Tombstones]]): immediate forget
    * on the banded screen, physical cleanup at compaction. */
  def addTombstones(spark: SparkSession, table: String,
      ids: DataFrame): Unit =
    Tombstones.add(spark, table, ids)

  def compactTombstones(spark: SparkSession, table: String): Unit = {
    if (!Tombstones.exists(spark, table)) return
    Tombstones.compactBucketedTable(spark, table, table,
      "id", Seq("band", "key"))
    Tombstones.clear(spark, table)
  }
}
