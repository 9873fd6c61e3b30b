package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, each designed
  * around ONE banding/bucket shuffle instead of any O(n²) comparison —
  * the only shape that survives 10^12 documents:
  *
  *  - exact:   hash-groupBy on content (full shuffle of keys only)
  *  - minhash: shingle → minhash signature → LSH bands → bucket join →
  *             verify exact Jaccard on candidates only
  *  - simhash: 64-bit weighted token hash → 4×16-bit block banding
  *             (pigeonhole: hamming ≤ 3 ⇒ one block equal) → verify
  *  - embedding: random-hyperplane sign LSH → bucket → verify cosine
  *
  * Every step is deterministic (seeded hash families) so resumed runs and
  * oracle checks see identical pairs.
  */
object DedupOps {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  // ----------------------------------------------------------------- exact

  /** Keep the lowest id per distinct content; adds n_dupes. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dupes"))
      .select(col(idCol), col("n_dupes"))

  // --------------------------------------------------------------- minhash

  /** Character shingles of length k as a long-hash set. */
  def shingles(text: String, k: Int): Array[Long] = {
    if (text.length < k) return Array(mix64(text.hashCode.toLong))
    val set = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i + k <= text.length) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h = (h ^ text.charAt(i + j)) * 0x100000001b3L; j += 1 }
      set.add(mix64(h))
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  /** numHashes-minhash signature via the one-permutation trick family
    * h_i(x) = mix(x ^ seed_i) (distinct seeded functions). The per-function
    * seed mixes are hoisted out of the shingle loop — they are shingle-
    * invariant, and recomputing them inside it doubled the mix64 count of
    * the signature pass (shingles × numHashes extra mixes; the signature
    * pass dominates dedup_minhash CPU).
    */
  def minhashSignature(sh: Array[Long], numHashes: Int, seed: Long): Array[Long] = {
    val seedMix = new Array[Long](numHashes)
    var f0 = 0
    while (f0 < numHashes) { seedMix(f0) = mix64(seed + f0); f0 += 1 }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val shv = sh(i)
      var f = 0
      while (f < numHashes) {
        val h = mix64(shv ^ seedMix(f))
        if (h < sig(f)) sig(f) = h
        f += 1
      }
      i += 1
    }
    sig
  }

  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    val sa = new java.util.HashSet[java.lang.Long]()
    a.foreach(sa.add(_))
    var inter = 0
    val sb = new java.util.HashSet[java.lang.Long]()
    b.foreach { x => if (sb.add(x) && sa.contains(x)) inter += 1 }
    val union = sa.size() + sb.size() - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Hot-bucket defenses shared by the LSH dedups (crawl corpora have
    * millions of identical/boilerplate docs; an unbounded bucket self-join
    * is O(bucket²) and 10⁶ identical docs would make 10¹² candidates):
    *
    *  1. exact-duplicate PRE-COLLAPSE — group by content hash, keep the
    *     min-id representative, emit the (rep, dup) pairs directly
    *     (similarity 1.0 / hamming 0 by definition — no LSH needed);
    *     identical docs never enter the banded join at all. Dup-group
    *     members inherit their representative's near-dup matches.
    *  2. per-bucket size CAP — buckets larger than `maxBucket` (boilerplate
    *     black holes) are dropped from candidate generation, bounding the
    *     self-join at O(maxBucket × buckets). One window over the banding
    *     shuffle, no extra pass.
    */
  /** Returns (representatives with text, (rep, member) dup pairs).
    * Deliberately hot-key-proof: the content-hash shuffles touch only the
    * NARROW (id, hash) projection — 10⁶ identical docs funnel 16 MB of ids
    * into one task, not 10⁶ full texts — and the text rows are fetched back
    * by a semi-join on the UNIQUE id (uniform distribution, no hot task).
    * Emitted pair set: (rep, member, sim=1) per dup member plus LSH pairs
    * between representatives; pairs among two members of the same or
    * related groups are implied via their representative, not re-emitted.
    */
  private def collapseExact(df: DataFrame, idCol: String, textCol: String)
    : (DataFrame, DataFrame) = {
    // sha256 (not md5): engineered md5 collisions exist in real crawl
    // corpora and would merge two distinct documents into one dup group
    val withH = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .withColumn("__h", sha2(col("text"), 256))
    val slim = withH.select("id", "__h")
    val repIds = slim.groupBy(col("__h")).agg(min(col("id")).as("rep"))
    val dupPairs = slim.join(repIds, "__h")
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"))
    val reps = withH
      .join(repIds.select(col("rep").as("id")), Seq("id"), "left_semi")
      .select("id", "text")
    (reps, dupPairs)
  }

  /** Drop over-full LSH buckets from candidate generation. This TRADES
    * recall for boundedness (a genuinely-near pair sharing only a hot
    * bucket is never emitted) — the count of dropped rows is observable:
    * pass an `Observation` and read its `dropped_bucket_rows` metric after
    * the action (zero-cost plan-level metric, no extra pass).
    */
  private def capBuckets(
      banded: DataFrame,
      maxBucket: Int,
      dropped: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val w = Window.partitionBy(col("band"), col("bkey"))
    val sized = banded.withColumn("__bsz", count(lit(1)).over(w))
    val observed = dropped match {
      case Some(obs) => sized.observe(obs,
        sum(when(col("__bsz") > maxBucket, 1L).otherwise(0L)).as("dropped_bucket_rows"))
      case None => sized
    }
    observed
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
  }

  /** Near-duplicate pairs by MinHash+LSH: `bands` bands of `rows` hashes;
    * a pair collides if any band matches; collisions are verified with the
    * exact shingle Jaccard (no false positives leave this operator).
    * Exact duplicates are pre-collapsed (emitted with jaccard 1.0) and
    * buckets larger than `maxBucket` are dropped — see the hot-bucket note.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 5,
      bands: Int = 16,
      rowsPerBand: Int = 8,
      threshold: Double = 0.7,
      seed: Long = 42L,
      maxBucket: Int = 1000,
      droppedObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val numHashes = bands * rowsPerBand
    val spark = df.sparkSession
    import spark.implicits._
    val (reps, dupPairs) = collapseExact(df, idCol, textCol)
    val sigs = reps
      .as[(Long, String)]
      .map { case (id, text) =>
        val sh = shingles(text, shingleK)
        (id, minhashSignature(sh, numHashes, seed))
      }
      .toDF("id", "sig")

    // band key = hash of the band's slice of the signature. Cache sits on
    // the BANDED rows (id, band, bkey — the skinniest point), not the
    // signatures: the self-join below consumes banded twice, and an
    // uncached banded re-ran the whole shingle→signature→window lineage on
    // both sides (duplicated Window subtrees in the physical plan).
    val banded = capBuckets(sigs.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bkey"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey")),
      maxBucket, droppedObs)
      .cache()

    val cand = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    // verify candidates with exact jaccard over shingles (recompute on the
    // candidate set only — avoids shipping full shingle sets through LSH)
    val texts = df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    val verified = cand
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
      .select("id_a", "id_b", "text_a", "text_b") // joins reorder join keys first
      .as[(Long, Long, String, String)]
      .map { case (a, b, ta, tb) =>
        (a, b, jaccard(shingles(ta, shingleK), shingles(tb, shingleK)))
      }
      .toDF("id_a", "id_b", "jaccard")
      .filter(col("jaccard") >= threshold)
    verified
      .unionAll(dupPairs.withColumn("jaccard", lit(1.0)))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs (id_a,id_b). */
  def ngramJaccard(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val texts = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    pairs
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
      .select("id_a", "id_b", "text_a", "text_b")
      .as[(Long, Long, String, String)]
      .map { case (a, b, ta, tb) =>
        (a, b, jaccard(shingles(ta, shingleK), shingles(tb, shingleK)))
      }
      .toDF("id_a", "id_b", "jaccard")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens (unit weights). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          var h = 0xcbf29ce484222325L
          var j = start
          while (j < i) { h = (h ^ text.charAt(j)) * 0x100000001b3L; j += 1 }
          h = mix64(h)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  /** Near-duplicate pairs with hamming(simhash) <= maxHamming (< 4): band
    * the 64-bit hash into 4×16-bit blocks; pigeonhole guarantees one equal
    * block, so the bucket join finds all such pairs; verify exact hamming.
    * Exact duplicates are pre-collapsed (emitted with hamming 0) and hot
    * buckets capped — see the hot-bucket note above.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      droppedObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxHamming < 4, "4×16-bit banding covers hamming <= 3")
    val spark = df.sparkSession
    import spark.implicits._
    val (reps, dupPairs) = collapseExact(df, idCol, textCol)
    val hashed = reps
      .as[(Long, String)]
      .map { case (id, t) => (id, simhash64(t)) }
      .toDF("id", "sh")
    // cache on the banded rows (see minhashPairs): the self-join reads them
    // twice, and caching upstream of the banding window left the window +
    // simhash lineage duplicated across both sides
    val banded = capBuckets(hashed.select(
      col("id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xffffL)).as("bkey"))
      }: _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.bkey").as("bkey")),
      maxBucket, droppedObs)
      .cache()
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .unionAll(dupPairs.withColumn("hamming", lit(0)))
  }

  // ------------------------------------------------------------- embedding

  /** Near-duplicate vector pairs by cosine >= threshold, candidates from
    * random-hyperplane sign LSH (`planes` bits, bucket join), verified
    * exactly. Embeddings are Array[Float] columns.
    *
    * Same hot-bucket defenses as the text dedups: identical vectors are
    * pre-collapsed on a 64-bit content hash (candidate pairs verified by
    * exact vector equality so a hash collision cannot forge a dup), only
    * unique representatives enter the sign-LSH join, and over-full sign
    * buckets are capped — an embedding corpus full of one boilerplate
    * vector would otherwise make O(bucket²) candidates carrying full
    * Array[Float]s on both sides.
    */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 12,
      seed: Long = 7L,
      maxBucket: Int = 1000,
      droppedObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))

    // exact pre-collapse on a NARROW (id, hash) projection; the (rep, dup)
    // candidates are then verified with full-vector equality (kills 64-bit
    // collisions), emitted with cosine 1.0 by definition
    val withH = vecs.withColumn("__h", xxhash64(col("v")))
    val slim = withH.select("id", "__h")
    val repIds = slim.groupBy(col("__h")).agg(min(col("id")).as("rep"))
    val dupCand = slim.join(repIds, "__h").filter(col("id") =!= col("rep"))
    val dupPairs = dupCand
      .join(vecs.select(col("id").as("rep"), col("v").as("va")), "rep")
      .join(vecs.select(col("id"), col("v").as("vb")), "id")
      .filter(col("va") === col("vb"))
      .select(col("rep").as("id_a"), col("id").as("id_b"), lit(1.0).as("cosine"))
    // reps stays cached too: the dim probe (head) and the sig build both
    // consume it, and the collapse lineage (hash + groupBy + semi-join)
    // re-ran for each without it
    val reps = withH
      .join(repIds.select(col("rep").as("id")), Seq("id"), "left_semi")
      .select("id", "v")
      .as[(Long, Array[Float])]
      .cache()

    val dim = reps.head()._2.length
    val rnd = new scala.util.Random(seed)
    val hyper = Array.fill(planes, dim)(rnd.nextGaussian())
    val hyperB = spark.sparkContext.broadcast(hyper)

    // cache on the signed buckets (see minhashPairs): the self-join reads
    // them twice; caching upstream (reps) still re-ran the hyperplane dot
    // products and the capping window on both sides
    val sigDf = capBuckets(
      reps.map { case (id, v) =>
        val h = hyperB.value
        var sig = 0
        var p = 0
        while (p < planes) {
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += h(p)(i) * v(i); i += 1 }
          if (dot >= 0) sig |= 1 << p
          p += 1
        }
        (id, v, sig)
      }.toDF("id", "v", "sig")
        .withColumn("band", lit(0)).withColumnRenamed("sig", "bkey"),
      maxBucket, droppedObs)
      .cache()

    val cand = sigDf.as("l")
      .join(sigDf.as("r"), col("l.bkey") === col("r.bkey") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("l.v").as("va"),
        col("r.id").as("id_b"), col("r.v").as("vb"))

    cand.as[(Long, Array[Float], Long, Array[Float])]
      .map { case (a, va, b, vb) => (a, b, SimilarityOps.cosine(va, vb)) }
      .toDF("id_a", "id_b", "cosine")
      .filter(col("cosine") >= threshold)
      .unionAll(dupPairs)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
