package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DedupFunctions, SimilarityFunctions, TextFunctions}

/** Behavior tests for the dedup/similarity operators whose production variants
  * have no SQL oracle (simhash64/xxhash64, SRP-bucketed ANN): planted
  * near-duplicates must be found; the ANN scale path must agree with the
  * brute-force baseline on most of the top-k.
  */
class DedupSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def docsWithPlants = {
    import spark.implicits._
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars")
    // plant: 9001 = exact copy of doc 0; 9002 = doc 0 with one word changed
    val d0 = base.filter(col("doc_id") === 0).head
    val t0 = d0.getString(1)
    val t0mut = {
      val ws = t0.split(" "); ws(ws.length / 2) = "zzzmutantzzz"; ws.mkString(" ")
    }
    val plants = Seq(
      (9001L, t0, d0.getString(2), t0.length.toLong),
      (9002L, t0mut, d0.getString(2), t0mut.length.toLong)
    ).toDF("doc_id", "text", "lang", "n_chars")
    base.union(plants)
  }

  test("simhash64: near-dup has small hamming distance, unrelated docs large") {
    val sig = DedupFunctions.simhash64(docsWithPlants)
    val m = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(0L), m(9001L)) == 0, "identical docs must have identical simhash")
    assert(ham(m(0L), m(9002L)) <= 8, "one-word mutation must stay hamming-close")
    val far = (1L to 20L).map(i => ham(m(0L), m(i)))
    assert(far.count(_ > 12) >= 15, s"unrelated docs should be hamming-far, got $far")
  }

  test("simhashPairs finds the planted near-duplicates") {
    val pairs = DedupFunctions.simhashPairs(docsWithPlants, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 9001L)))
    assert(pairs.contains((0L, 9002L)))
  }

  test("minhash LSH finds exact and near duplicates as candidates") {
    val pairs = DedupFunctions.lshCandidatePairs(docsWithPlants, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 9001L)), "exact dup must collide on every band")
    assert(pairs.contains((0L, 9002L)), "near dup should collide on some band")
  }

  test("jaccardPairs scores the planted near-dup above 0.9") {
    val pairs = DedupFunctions.jaccardPairs(docsWithPlants, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((0L, 9001L)).exists(_ == 1.0), s"exact dup jaccard: ${pairs.get((0L, 9001L))}")
    assert(pairs.get((0L, 9002L)).exists(_ >= 0.85), s"near-dup jaccard: ${pairs.get((0L, 9002L))}")
  }

  test("ANN bucketed recall vs brute force is reasonable for its bucket size") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val brute = SimilarityFunctions.knnBrute(emb, 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = SimilarityFunctions.annBucketed(emb, 10, 5, nPlanes = 2, dim = 64,
      nTables = 4).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.count(ann.contains).toDouble / brute.size
    // this corpus is near-uniform on the sphere (top-5 neighbor cosine ~0.3),
    // so per-table collision ~0.37; 4-table OR-amplification → ~0.8 expected.
    assert(recall >= 0.5, s"ANN recall too low: $recall")
    // every ANN hit must score identically to the brute computation (same dot)
    val bruteScores = SimilarityFunctions.knnBrute(emb, 10, 500)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    SimilarityFunctions.annBucketed(emb, 10, 5, 2, 64, 4).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(bruteScores(key) == r.getDouble(3), s"score mismatch at $key")
    }
  }

  test("exact dedup groups identical texts under min doc_id") {
    val g = DedupFunctions.exactGroups(docsWithPlants)
      .filter(col("group_size") > 1).collect()
    assert(g.length == 1)
    assert(g(0).getLong(1) == 0L && g(0).getLong(2) == 2L)
  }

  test("minhash signature is null for docs with fewer than 3 tokens") {
    import spark.implicits._
    val tiny = Seq((1L, "one two"), (2L, "one two three")).toDF("doc_id", "text")
    val sig = TextFunctions.minhashSignature(tiny, 2).collect()
    assert(sig(0).isNullAt(1) && sig(0).isNullAt(2))
    assert(!sig(1).isNullAt(1))
  }
}
