package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 — LLM-training-data pipeline operators (north-star
  * additions): text stats, exact + MinHash/LSH near-dedup, embedding
  * vector math, brute-force top-k cosine KNN, multimodal record assembly.
  *
  * Scale notes (the whole point of these ops):
  *  - minhash dedup is banded LSH: signatures per doc (one shuffle keyed
  *    by doc), band keys exploded, candidates found by an equi self-join
  *    on (band, band_hash) — never an all-pairs O(n²) comparison;
  *  - knn broadcasts the (small) query set so the corpus streams through
  *    map-side only — one pass, no shuffle of the 100 TB side;
  *  - vector math and minhash signatures run in native codegen
  *    expressions (graft.functions) — single fused loops, no per-row
  *    JVM UDFs or interpreted lambda dispatch.
  */
object Llm {
  import Tables._

  import graft.functions.VectorFunctions

  private def toDouble(a: Column): Column = a.cast("array<double>")

  // shingle hashing is the native graft_shingle_hashes3 one-pass kernel

  val queries: Map[String, Q] = Map(
    // Text analysis: token counts, avg token length, vowel density,
    // declared-vs-actual length QA flag (quality scoring primitives).
    "llm_text_stats" -> ((s, d) => {
      val toks = split(col("text"), " ")
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("n_chars_actual"),
          size(toks).as("n_toks"),
          round((length(col("text")) - size(toks) + 1).cast("double")
            / size(toks), 4).as("avg_tok_len"),
          length(regexp_replace(col("text"), "[^aeiou]", "")).as("n_vowels"),
          (col("n_chars") === length(col("text"))).as("len_ok"))
        .orderBy("doc_id")
    }),

    // Exact dedup on normalized text: canonical keeper + duplicate count
    // per distinct content. The groupBy key is the 128-bit MD5 DIGEST of
    // the normalized text, not the text itself — at 100 TB the dedup
    // shuffle then carries 32-byte digests instead of the entire corpus
    // (collision probability is cryptographically negligible, and the
    // digest is computable in DuckDB too, so the oracle still matches
    // bit-for-bit). Within a digest group all texts are equal, so
    // min(length) is THE group's length.
    "llm_dedup_exact" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), trim(col("text")).as("nt"))
        .groupBy(md5(col("nt")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
          min(length(col("nt"))).as("text_len"))
        .select(col("keep_id"), col("n_copies"), col("text_len"))
        .orderBy("keep_id")),

    // CANONICALIZED exact dedup (the C4/RefinedWeb normalize-then-dedup
    // pass): lowercase, fold punctuation to spaces, collapse runs,
    // trim — then dedup on the md5 digest of the canonical form, so
    // case/punctuation/whitespace variants of the same content collapse
    // into one group where trim-only exact dedup keeps them apart. The
    // fixture corpus is already lowercase, so the variant space is
    // exercised by unioning in a per-doc noisy twin: leading blanks,
    // ASCII-uppercased (translate, not upper — Unicode case folding
    // isn't roundtrippable, 'ß'.upper = "SS", and ICU vs JVM may
    // disagree cross-engine), trailing punctuation. Twin ids start at
    // max(doc_id)+1 — derived from a broadcast 1-row aggregate, never a
    // driver collect — so they are collision-free at ANY corpus size.
    // Every canonical group then provably contains >= 2 members and the
    // keeper (min id) is the original doc. Same 100 TB shape as
    // llm_dedup_exact: the shuffle carries digests, never text.
    "llm_dedup_canonical" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val mx = docs.agg(max(col("doc_id")).as("mx"))
      val noisy = docs.crossJoin(broadcast(mx))
        .select((col("doc_id") + col("mx") + 1).as("doc_id"),
          concat(lit("  "),
            translate(col("text"), "abcdefghijklmnopqrstuvwxyz",
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ"), lit(" !!")).as("text"))
      val canon = trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " +", " "))
      docs.unionByName(noisy)
        .select(col("doc_id"), canon.as("ct"))
        .groupBy(md5(col("ct")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
          min(length(col("ct"))).as("canon_len"))
        .select(col("keep_id"), col("n_copies"), col("canon_len"))
        .orderBy("keep_id")
    }),

    // SoftDeDup-style duplicate REWEIGHTING (the soft alternative to
    // dropping): keep every doc but weight it 1/n_copies of its
    // exact-dedup group, so duplicated mass trains once in expectation
    // while tail phrasing variants survive. The group count is a window
    // over the md5 digest — ONE digest-keyed shuffle (a groupBy + join
    // back would be two), text never shuffles, and window partitioning
    // groups NULL keys like groupBy does, so a NULL-text doc keeps its
    // weight instead of vanishing through an inner join on a NULL key.
    "llm_dedup_weighted" -> ((s, d) => {
      val w = Window.partitionBy("h")
      t(s, d, "documents")
        .select(col("doc_id"), md5(trim(col("text"))).as("h"))
        .select(col("doc_id"), count(lit(1)).over(w).as("n_copies"))
        .select(col("doc_id"), col("n_copies"),
          round(lit(1.0) / col("n_copies"), 6).as("weight"))
        .orderBy("doc_id")
    }),

    // Near-dup candidates via banded MinHash LSH. Oracle-exempt (depends
    // on hash seeds); property-tested instead. Emits candidate pairs
    // (a < b) that share at least one of 4 bands of 2 minhashes.
    "llm_dedup_minhash" -> ((s, d) => {
      // Signatures are computed MAP-SIDE by the native graft_minhash8
      // expression — no shingle explode + groupBy shuffle (the thing
      // that ships |corpus|×|shingles| rows at 100 TB). The only
      // shuffles left are the band-key self-join and the final distinct.
      val sigs = t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.VectorFunctions.minhash8(s,
            graft.functions.VectorFunctions.shingleHashes3(s, col("text")))
            .as("sig"))
      val bands = sigs.select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(3)), b =>
          xxhash64(element_at(col("sig"), b * 2 + 1),
            element_at(col("sig"), b * 2 + 2)))))
        .toDF("doc_id", "band", "band_hash")
      bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    }),

    // The LSH-candidates → exact-score composition (the 100 TB near-dup
    // pipeline): candidate pairs from the banded MinHash join, then ONLY
    // those pairs scored with the native O(n+m) sorted-set intersect —
    // exact Jaccard on a candidate set that grows with true duplication,
    // not with corpus size. Oracle-exempt (candidates depend on hash
    // seeds); property-tested: scores agree with the exact
    // inverted-index op on every overlapping pair.
    "llm_dedup_minhash_score" -> ((s, d) => {
      // Lazy-persist the shingle table: it feeds the band pipeline AND
      // both sides of the candidate re-join — without the cache the
      // native shingle kernel runs 3× per doc and the full hash arrays
      // rebuild through every branch (18.8 s in the round-3 bench; the
      // same fix simhash carries). persist() is lazy, so constructing
      // this DataFrame still does no I/O.
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.VectorFunctions.shingleHashes3(s, col("text"))
            .as("sh"))
        .persist()
      val bands = docs
        .select(col("doc_id"),
          graft.functions.VectorFunctions.minhash8(s, col("sh")).as("sig"))
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0), lit(3)), b =>
            xxhash64(element_at(col("sig"), b * 2 + 1),
              element_at(col("sig"), b * 2 + 2)))))
        .toDF("doc_id", "band", "band_hash")
      val cands = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val inter = graft.functions.VectorFunctions
        .sortedIntersectCount(s, col("a_sh"), col("b_sh"))
      cands
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("a_sh")),
          "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("b_sh")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(inter.cast("double") /
            (size(col("a_sh")) + size(col("b_sh")) - inter), 4).as("jac"))
        .orderBy("doc_a", "doc_b")
    }),

    // Vector column family: L2 norm, first normalized component, dim —
    // via the native codegen'd graft_l2norm expression.
    // Per-vector INT8 min-max quantization — the storage/bandwidth
    // path a 100 TB embedding store actually serves from (IVF cell +
    // quantized codes; the exact-float column stays only for rerank):
    // q_i = round((x_i - mn)·254/(mx - mn)) - 127 ∈ [-127, 127], plus
    // the reconstruction error bound that makes the trade auditable.
    // Pure map-side HOFs. Oracle-exempt: the q values are double
    // round-to-int ties, where Spark (HALF_UP) and DuckDB can disagree
    // on one-ulp boundaries; the properties that matter — error bound
    // ≤ scale/2, exact reconstruction at the extremes, determinism —
    // are pinned in LlmSpec instead. The codes dump as ONE deterministic
    // CSV string (`q_csv`) rather than an int array: the driver's
    // verification sorts the dumped frame in pandas, and an ndarray
    // cell in the sort path is unhashable — the round-10 artifact crash
    // (LlmSpec splits the string back to ints for its properties; a
    // consumer wanting the array applies the same one-line split).
    "llm_embed_quantize" -> ((s, d) => {
      val e = toDouble(col("embedding"))
      val mn = array_min(col("v")); val mx = array_max(col("v"))
      val scale = (mx - mn) / 254.0
      val q = transform(col("v"), x =>
        when(mx === mn, lit(0))
          .otherwise((round((x - mn) / scale) - 127).cast("int")))
      val recon = transform(col("q"), qi =>
        col("mn") + (qi + 127).cast("double") * col("scale"))
      t(s, d, "embeddings")
        .select(col("vec_id"), e.as("v"))
        .select(col("vec_id"), col("v"), mn.as("mn"), mx.as("mx"),
          scale.as("scale"))
        .select(col("vec_id"), col("v"), col("mn"), col("mx"),
          col("scale"), q.as("q"))
        .select(col("vec_id"), size(col("q")).as("dim"),
          concat_ws(",", col("q")).as("q_csv"),
          round(col("mn"), 6).as("mn"), round(col("mx"), 6).as("mx"),
          round(aggregate(zip_with(col("v"), recon, (a, b) =>
            abs(a - b)), lit(0.0), (acc, x) => greatest(acc, x)), 6)
            .as("max_err"))
        .orderBy("vec_id")
    }),

    "llm_embed_norm" -> ((s, d) => {
      val e = toDouble(col("embedding"))
      t(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(VectorFunctions.l2norm(s, e), 4).as("l2_norm"),
          round(element_at(e, 1) / VectorFunctions.l2norm(s, e), 4)
            .as("first_unit"))
        .orderBy("vec_id")
    }),

    // Top-5 cosine neighbors for query vectors (vec_id < 5): broadcast
    // query set × streamed corpus, HOF dot product, Top-N window. Ranking
    // uses the rounded similarity so Spark and the oracle agree on ties.
    "llm_similarity_knn" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      val q = broadcast(emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("e").as("qe")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id")
        .orderBy(col("cos").desc, col("vec_id"))
      q.join(emb, col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id"),
          round(VectorFunctions.cosine(s, col("qe"), col("e")), 4).as("cos"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
        .orderBy("q_id", "rk")
    }),

    // Multimodal record assembly: text ↔ embedding lineage in one nested
    // struct, exported as JSON (binary media columns would ride alongside
    // as opaque `binary` + this same metadata struct).
    "llm_multimodal_cols" -> ((s, d) =>
      t(s, d, "documents")
        .join(t(s, d, "embeddings"),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("source"),
            col("label"), size(col("embedding")).as("dim"))).as("record_json"))
        .orderBy("doc_id"))
  )

  val oracleSql: Map[String, String] = Map(
    "llm_text_stats" ->
      """SELECT doc_id, lang,
        | CAST(length(text) AS INT) AS n_chars_actual,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
        | round(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
        |   / len(string_split(text, ' ')), 4) AS avg_tok_len,
        | CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS INT) AS n_vowels,
        | n_chars = length(text) AS len_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | CAST(min(length(trim(text))) AS INT) AS text_len
        |FROM documents GROUP BY md5(trim(text)) ORDER BY keep_id""".stripMargin,
    "llm_dedup_weighted" ->
      """SELECT doc_id,
        | count(*) OVER (PARTITION BY md5(trim(text))) AS n_copies,
        | round(1.0::DOUBLE / count(*) OVER (PARTITION BY md5(trim(text))),
        |   6) AS weight
        |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_dedup_canonical" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
        |    '  ' || translate(text, 'abcdefghijklmnopqrstuvwxyz',
        |      'ABCDEFGHIJKLMNOPQRSTUVWXYZ') || ' !!'
        |  FROM documents),
        |c AS (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text),
        |          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS ct
        |      FROM u)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | CAST(min(length(ct)) AS INT) AS canon_len
        |FROM c GROUP BY md5(ct) ORDER BY keep_id""".stripMargin,
    "llm_embed_norm" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        | round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |   CAST(embedding AS DOUBLE[]))), 4) AS l2_norm,
        | round(embedding[1] / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |   CAST(embedding AS DOUBLE[]))), 4) AS first_unit
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "llm_similarity_knn" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |pairs AS (
        | SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |  round(list_dot_product(q.e, c.e)
        |    / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 4) AS cos
        | FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |ranked AS (
        | SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        |   ORDER BY cos DESC, vec_id) AS INT) AS rk FROM pairs)
        |SELECT q_id, rk, vec_id, cos FROM ranked WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin,
    "llm_multimodal_cols" ->
      """SELECT doc_id,
        | CAST(to_json(struct_pack(doc_id := doc_id, lang := lang,
        |   source := source, label := label,
        |   dim := len(embedding))) AS VARCHAR) AS record_json
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin
  )
}
