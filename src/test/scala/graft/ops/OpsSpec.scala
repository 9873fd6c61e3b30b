package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data pipeline operators: dedup family, ANN, text analysis,
  * multimodal plumbing.
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val baseText =
    "def compute(index (value)) = buffer.stream(count) { result => parser.handle(result) }"

  test("exactDedup keeps min id with dupe counts") {
    val df = Seq((10L, "aaa"), (3L, "aaa"), (5L, "bbb"), (7L, "aaa"))
      .toDF("doc_id", "text")
    val out = DedupOps.exactDedup(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((3L, 3L), (5L, 1L)))
  }

  test("minhashPairs finds planted near-dups, skips dissimilar") {
    val near = baseText + " trailing change"
    val docs = Seq(
      (1L, baseText), (2L, near), // near-dup pair
      (3L, "completely different content about cooking recipes and pasta sauce"),
      (4L, baseText)) // exact dup of 1
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), s"exact dup must collide: $pairs")
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L)), s"near dup: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"no false pair with 3: $pairs")
  }

  test("jaccard + shingles basics") {
    val a = DedupOps.shingles("abcdefgh", 5)
    assert(DedupOps.jaccard(a, a) == 1.0)
    val b = DedupOps.shingles("zzzzzzzz", 5)
    assert(DedupOps.jaccard(a, b) == 0.0)
  }

  test("simhash: identical => 0 hamming; pairs found via banding") {
    val h1 = DedupOps.simhash64(baseText)
    val h2 = DedupOps.simhash64(baseText)
    assert(h1 == h2)
    val edited = baseText.replace("compute", "computa")
    val hd = java.lang.Long.bitCount(h1 ^ DedupOps.simhash64(edited))
    assert(hd <= 16, s"small edit should move few bits, got $hd")

    val docs = Seq((1L, baseText), (2L, baseText), (3L, "xyz " * 50)).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embeddingPairs finds near-identical vectors") {
    val rnd = new scala.util.Random(3)
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(16)(r.nextGaussian().toFloat)
    }
    val v1 = vec(1)
    val v1b = v1.clone(); v1b(0) = v1b(0) + 0.01f
    val rows = Seq((1L, v1), (2L, v1b)) ++ (3L to 30L).map(i => (i, vec(i.toInt)))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = DedupOps.embeddingPairs(df, "vec_id", "embedding", threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted pair missing: $pairs")
  }

  test("bruteForceTopK matches naive exact computation") {
    val rnd = new scala.util.Random(11)
    val corpus = (1L to 200L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val queries = corpus.take(3).map { case (id, v) => (id + 1000, v) }
    val corpusDf = corpus.toDF("vec_id", "embedding").repartition(4)
    val queryDf = queries.toDF("vec_id", "embedding")
    val got = SimilarityOps.bruteForceTopK(corpusDf, queryDf, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)]
      .collect().groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // naive check
    queries.foreach { case (qid, qv) =>
      val expect = corpus
        .map { case (cid, cv) => (cid, SimilarityOps.cosine(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(5).map(_._1)
      assert(got(qid) == expect, s"query $qid: ${got(qid)} vs $expect")
      assert(got(qid).head == qid - 1000, "self vector must be rank 1")
    }
  }

  test("lshTopK: self-match is rank 1; results are a plausible subset") {
    val rnd = new scala.util.Random(13)
    val corpus = (1L to 500L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val corpusDf = corpus.toDF("vec_id", "embedding").repartition(4)
    val queryDf = corpus.take(2).toDF("vec_id", "embedding")
    val got = SimilarityOps.lshTopK(corpusDf, queryDf, "vec_id", "embedding", k = 3)
      .filter(col("rank") === 1)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 2L, s"self must be rank1: $got")
  }

  test("ivfTopK: self-match is rank 1, recall overlaps brute force") {
    val rnd = new scala.util.Random(17)
    val corpus = (1L to 400L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val corpusDf = corpus.toDF("vec_id", "embedding").repartition(4)
    val queryDf = corpus.take(3).toDF("vec_id", "embedding")
    val ivf = SimilarityOps.ivfTopK(corpusDf, queryDf, "vec_id", "embedding", k = 5,
      nCentroids = 8, nProbe = 4)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect()
    val self = ivf.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    assert(self == Map(1L -> 1L, 2L -> 2L, 3L -> 3L), s"self must be rank1: $self")
    // with half the buckets probed, expect reasonable overlap with exact
    val brute = SimilarityOps.bruteForceTopK(corpusDf, queryDf, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().groupBy(_._1)
    val overlap = ivf.groupBy(_._1).map { case (q, rows) =>
      rows.map(_._2).toSet.intersect(brute(q).map(_._2).toSet).size
    }
    assert(overlap.forall(_ >= 2), s"ivf should recall >=2/5 exact neighbors: $overlap")
  }

  test("text ops: tokens, quality, langid, fingerprint") {
    val df = Seq(
      (1L, "The cat and the dog are in the house."),
      (2L, "Der Hund und die Katze sind nicht mit der Maus."),
      (3L, ""),
      (4L, "x")).toDF("doc_id", "text")
    val out = TextOps.quality(df, "text")
      .withColumn("lang_pred", TextOps.languageId(col("text")))
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") == 9)
    assert(out(3L).getAs[Long]("n_tokens") == 0)
    assert(out(1L).getAs[String]("lang_pred") == "en")
    assert(out(2L).getAs[String]("lang_pred") == "de")
    assert(out(1L).getAs[Double]("stopword_ratio") > 0.3)
    // fingerprint: equal content => equal fp
    val fp1 = out(1L).getAs[Long]("fp")
    val again = Seq((9L, "The cat and the dog are in the house.")).toDF("doc_id", "text")
      .select(TextOps.fingerprint(col("text"))).head().getLong(0)
    assert(fp1 == again)
  }

  test("multimodal: binary plumbing, stub decode features, frame sampling") {
    val docs = Seq((1L, "hello media"), (2L, "second payload longer"), (3L, "video doc"))
      .toDF("doc_id", "text")
    val media = MultimodalOps.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = MultimodalOps.extractFeatures(media).collect()
    assert(feats.length == 3)
    feats.foreach { r =>
      assert(r.getAs[Long]("payload_bytes") > 0)
      assert(r.getAs[Double]("entropy") >= 0.0)
    }
    val frames = MultimodalOps.sampleFrames(media, maxFrames = 4)
    val byId = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    byId.values.foreach(n => assert(n <= 5, s"frame sampling must bound frames: $byId"))
  }
}
