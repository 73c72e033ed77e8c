package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extension injection accepts the full function list") {
    // a fresh SparkSessionExtensions must accept every injected tuple
    // (session-creation-order makes an end-to-end --conf test flaky in a
    // shared-context suite; SQL execution of the same builders is below)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    assert(GraftExtensions.functions.map(_._1.funcName).toSet === Set(
      "cosine_sim", "l2_dist", "dot_product", "max_sim", "fnv64", "simhash64",
      "minhash_sig", "minhash_bands", "winnow_fingerprint", "ac_count",
      "word_shingles",
      "top_ngram_run", "unicode_norm", "strip_accents", "bpe_encode",
      "jaro_sim", "jaro_winkler", "z_value", "token_entropy",
      "int8_encode", "int8_dot",
      "kll_sketch_agg", "kll_union_agg", "kll_quantile", "kll_rank", "kll_n",
      "theta_sketch_agg", "theta_union_agg", "theta_intersect",
      "theta_a_not_b", "theta_estimate", "sorted_intersect_count"))
  }

  test("every registered SQL function is runnable on a fresh session registry") {
    val s = spark.newSession()
    graft.functions.GraftFunctions.registerAll(s)
    val r = s.sql(
      """SELECT round(cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS c,
        |  l2_dist(array(0.0F, 3.0F), array(4.0F, 0.0F)) AS d,
        |  dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS p,
        |  fnv64('abc') AS h,
        |  simhash64(array('a','b')) AS sh,
        |  size(minhash_sig(array('a','b'), 16)) AS ms,
        |  size(minhash_bands(array('a','b'), 16, 4)) AS mb,
        |  size(winnow_fingerprint('abcdefgh', 3, 2)) AS wf,
        |  ac_count('ushers', 'he|she|his|hers').hits AS ac,
        |  size(word_shingles(array('a','b','c'), 2)) AS n2,
        |  top_ngram_run(array('a','b','a','b','a'), 2) AS tr,
        |  int8_encode(array(0.5F, -1.0F)) AS i8,
        |  int8_dot(array(2, -3), array(4, 5)) AS i8d
        |""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 11.0)
    assert(r.getLong(3) === graft.functions.TextHashing.fnv64("abc"))
    assert(r.getInt(5) === 16)
    assert(r.getInt(6) === 4)
    assert(r.getInt(7) >= 1)
    assert(r.getLong(8) === 3L)                   // ushers: she, he, hers
    assert(r.getInt(9) === 2)
    // [a b, b a, a b, b a] → "a b" twice
    assert(r.getLong(10) === 2L)
    assert(r.getSeq[Int](11) === Seq(64, -127))   // 0.5·127 = 63.5 → 64
    assert(r.getLong(12) === 2L * 4 + (-3L) * 5)
  }

  test("ac_count lexicon defects fail EAGERLY at plan time with specific messages") {
    // ADVICE r18: a duplicate phrase after the '|' split used to surface
    // only at executor eval time as an opaque task-failure require; a NULL
    // lexicon fell into the misleading 'must be a string literal' message.
    val s = spark.newSession()
    graft.functions.GraftFunctions.registerAll(s)
    def planFail(sql: String): String =
      intercept[Exception](s.sql(sql).queryExecution.analyzed).getMessage
    assert(planFail("SELECT ac_count('x', 'he|he')").contains("duplicate phrase"))
    assert(planFail("SELECT ac_count('x', NULL)").contains("must not be NULL"))
    assert(planFail("SELECT ac_count('x', '||')").contains("empty after"))
    assert(planFail("SELECT ac_count('x', lower('HE'))")
      .contains("string literal"))
  }

  test("pure-SQL surface end-to-end: registered views + graft functions ≡ DataFrame API") {
    // the way a SQL-first user consumes the engine: tables as views, graft
    // expressions by name, the whole query in one spark.sql — results must
    // be identical to the DataFrame formulation of the same dedup query
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.documents(spark, TestSpark.sf).createOrReplaceTempView("v_documents")
    try {
      val sql = spark.sql(
        """SELECT fnv64(concat_ws(' ', filter(
          |         split(lower(trim(text)), '\\s+'), t -> t != ''))) AS content_hash,
          |  count(*) AS n_dups, min(doc_id) AS keeper_id
          |FROM v_documents
          |GROUP BY 1 HAVING count(*) > 1""".stripMargin)
      val api = graft.ops.Dedup.exact(
          Tables.documents(spark, TestSpark.sf), "text", "doc_id")
        .select("content_hash", "n_dups", "keeper_id")
      assert(sql.collect().map(_.toString).sorted.toSeq ===
        api.collect().map(_.toString).sorted.toSeq)
    } finally spark.catalog.dropTempView("v_documents")
  }
}
