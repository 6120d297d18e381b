package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.9 LLM-pipeline invariants. */
class LlmSpec extends AnyFunSuite {
  import TestSpark._

  test("embed_quantize: codes in [-127,127], error within half a step, " +
      "extremes reconstruct exactly") {
    // the op dumps codes as a CSV string (pandas-sortable); the
    // properties check the recovered int array
    val df = q("llm_embed_quantize")
      .withColumn("q", transform(split(col("q_csv"), ","),
        x => x.cast("int")))
      .persist()
    assert(df.count() > 0)
    // int8 range and full dimensionality (a non-numeric token would
    // cast to null — exists() treats null as false, so pin those too)
    assert(df.where(exists(col("q"),
      qi => qi.isNull || qi < -127 || qi > 127)).count() === 0)
    assert(df.where(col("dim") =!= 64 ||
      size(col("q")) =!= col("dim")).count() === 0)
    // round-to-nearest bound: |x - reconstruct(x)| <= step/2; max_err
    // is reported rounded to 6 dp (and mn/mx likewise), so the slack
    // must cover that reporting granularity, not just float noise
    assert(df.where(col("max_err") >
      (col("mx") - col("mn")) / 254.0 / 2.0 + 2e-6).count() === 0)
    // the extremes map to the end codes, so they reconstruct exactly:
    // min -> -127, max -> +127 must both be present in every vector
    // with a nonzero range
    assert(df.where(col("mx") > col("mn") &&
      (!array_contains(col("q"), -127) ||
        !array_contains(col("q"), 127))).count() === 0)
    df.unpersist(blocking = false)
  }

  test("embed_norm: norms positive, first_unit within [-1, 1]") {
    val df = q("llm_embed_norm")
    assert(df.where(col("l2_norm") <= 0).count() === 0)
    assert(df.where(abs(col("first_unit")) > 1.0001).count() === 0)
  }

  test("knn: cosine in [-1, 1], 5 neighbors per query, no self-match") {
    val df = q("llm_similarity_knn")
    assert(df.where(abs(col("cos")) > 1.0001).count() === 0)
    assert(df.groupBy("q_id").count().where(col("count") =!= 5).count() === 0)
    assert(df.where(col("q_id") === col("vec_id")).count() === 0)
  }

  test("knn: neighbor list is sorted by descending similarity") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id").orderBy("rk")
    val bad = q("llm_similarity_knn")
      .withColumn("prev", lag(col("cos"), 1).over(w))
      .where(col("prev").isNotNull && col("cos") > col("prev"))
    assert(bad.count() === 0)
  }

  test("minhash candidates contain every exact-duplicate pair") {
    // Identical texts share all shingles, hence all minhashes and every
    // band — exact dups MUST surface as LSH candidates.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), trim(col("text")).as("tx"))
    val exactPairs = docs.as("a").join(docs.as("b"),
        col("a.tx") === col("b.tx") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cands = q("llm_dedup_minhash")
    val missed = exactPairs.join(cands, Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() === 0)
  }

  test("minhash_score: pairs = candidates; scores agree with exact op") {
    val scored = q("llm_dedup_minhash_score")
    val cands = q("llm_dedup_minhash")
    // same pair set as the candidate op (scoring drops nothing)
    assert(scored.count() === cands.count())
    assert(scored.join(cands, Seq("doc_a", "doc_b")).count() === cands.count())
    // on pairs both ops emit, the exact inverted-index op computed the
    // same Jaccard (same-source pairs above threshold overlap)
    val exact = q("llm_dedup_ngram_jaccard")
      .withColumnRenamed("jac", "jac_exact")
    assert(scored.join(exact, Seq("doc_a", "doc_b"))
      .where(col("jac") =!= col("jac_exact")).count() === 0)
    // scores are valid Jaccards
    assert(scored.where(col("jac") < 0 || col("jac") > 1).count() === 0)
  }

  test("minhash candidate pairs are plausibly similar (>= 1/3 token overlap)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val withToks = q("llm_dedup_minhash")
      .join(docs.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
    val loose = withToks.where(col("jac") < 1.0 / 3).count()
    val all = withToks.count()
    // banded LSH admits some false positives; most candidates must be real
    assert(all === 0 || loose.toDouble / all < 0.5)
  }

  test("text stats: token counts positive, avg token length sane") {
    val df = q("llm_text_stats")
    assert(df.where(col("n_toks") <= 0).count() === 0)
    assert(df.where(col("avg_tok_len") <= 0 || col("avg_tok_len") > 40).count() === 0)
  }

  test("exact dedup partitions all docs") {
    assert(q("llm_dedup_exact").agg(sum("n_copies")).first().getLong(0) ===
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("weighted dedup: group weights sum to 1, mass equals group count") {
    val df = q("llm_dedup_weighted").cache()
    try {
      // every doc keeps a weight in (0, 1]
      assert(df.where(col("weight") <= 0 || col("weight") > 1).count() === 0)
      // all docs survive (soft dedup drops nothing)
      assert(df.count() ===
        spark.read.parquet(s"$sf/documents.parquet").count())
      // total training mass == number of distinct contents: each digest
      // group contributes n_copies * (1/n_copies) = 1 (rounding slack
      // 1e-4 over the whole corpus)
      val groups = q("llm_dedup_exact").count()
      val mass = df.agg(sum("weight")).first().getDouble(0)
      assert(math.abs(mass - groups) < 1e-4, s"mass $mass vs $groups")
    } finally df.unpersist()
  }

  test("canonical dedup folds every noisy twin onto its original") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val canonForms = docs.select(
      trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " +", " ")).as("ct")).distinct().count()
    val df = q("llm_dedup_canonical").cache()
    try {
      // one group per distinct canonical form: the uppercased/punctuated
      // twins never mint their own group
      assert(df.count() === canonForms)
      // every group holds at least its original + twin, and the keeper
      // is always a real doc, never a twin (twin ids start past
      // max(doc_id), so any keeper above it would be a twin win)
      val maxId = docs.agg(max("doc_id")).first().getLong(0)
      assert(df.where(col("n_copies") < 2).count() === 0)
      assert(df.where(col("keep_id") > maxId).count() === 0)
      // partition check: originals + twins all land somewhere
      assert(df.agg(sum("n_copies")).first().getLong(0) === 2 * docs.count())
    } finally df.unpersist()
  }
}
