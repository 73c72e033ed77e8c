package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Deduplication suite for a 100 TB training-data corpus.
  *
  * The reference leaks duplicates by design (uuid identity + at-least-once
  * sink, SURVEY §2a O2/O5); these operators are the fix, each with a
  * different cost/recall point:
  *
  *  - [[exact]] — content-hash groupBy. One shuffle on a 64-bit hash key;
  *    hash first so the shuffle carries 8 bytes, not document bodies.
  *  - [[minhashCandidates]] / [[minhashNearDups]] — MinHash + banded LSH.
  *    Shuffle cost is rows × bands small (band-hash, id) pairs; candidate
  *    verification joins back only the candidate ids. Standard web-scale
  *    near-dup (the GPT-3/C4 recipe).
  *  - [[simhashNearDups]] — 64-bit SimHash, block on 16-bit chunks
  *    (Hamming ≤ 3 ⇒ some chunk equal, pigeonhole), verify Hamming.
  *  - [[jaccardPairs]] — exact n-gram Jaccard via inverted-index join:
  *    explode tokens, pair docs sharing a token, count intersections —
  *    no cross join anywhere, so it scales with corpus token mass, not
  *    rows².
  *  - [[embeddingNearDups]] — cosine near-dup over embedding vectors via
  *    the same banded LSH idea on random hyperplanes.
  */
object Dedup {

  /** Tokenize to lowercase whitespace-separated words (deterministic;
    * matches the DuckDB oracle's tokenization). */
  def tokens(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")

  /** Word n-gram shingles of the token array (n ≥ 1; n=1 → tokens). */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = tokens(textCol)
    if (n == 1) array_distinct(toks)
    else array_distinct(
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact duplicate groups by normalized content hash. Returns one row per
    * duplicated content: (content_hash, n_dups, keeper_id, dup_ids). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(fnv64(concat_ws(" ", tokens(col(textCol)))).as("content_hash"),
        col(idCol))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_dups"),
        min(col(idCol)).as("keeper_id"),
        sort_array(collect_list(col(idCol))).as("dup_ids"))
      .filter(col("n_dups") > 1)

  /** Keep one row per distinct normalized content (smallest id wins) —
    * the "dedup the corpus" action. Implemented as a window-free
    * aggregate-then-semi-join so the document bodies shuffle only once. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keepers = df
      .select(fnv64(concat_ws(" ", tokens(col(textCol)))).as("content_hash"), col(idCol))
      .groupBy("content_hash").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** (id, band_idx, band_hash) tuples: LSH bucket keys. numHashes minhash
    * values split into `bands` bands of numHashes/bands rows each; a band's
    * hash is fnv-combined. Docs agreeing on any band are candidates. */
  def minhashBands(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = minhash_sig(shingles(col(textCol), shingleN), numHashes)
    df.select(col(idCol), sig.as("_sig"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => fnv64(to_json(slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate near-dup pairs (id_a < id_b) from banded MinHash LSH. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val b1 = minhashBands(df, textCol, idCol, shingleN, numHashes, bands)
    val b2 = b1.select(col("band_idx"), col("band_hash"), col(idCol).as("_id_b"))
    b1.join(b2, Seq("band_idx", "band_hash"))
      .filter(col(idCol) < col("_id_b"))
      .select(col(idCol).as("id_a"), col("_id_b").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over shingle sets for a pair DataFrame (id_a, id_b). */
  def verifyJaccard(pairs: DataFrame, df: DataFrame, textCol: String,
                    idCol: String, shingleN: Int): DataFrame = {
    val sh = df.select(col(idCol), shingles(col(textCol), shingleN).as("_sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("_sh").as("_sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("_sh").as("_sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("_sh_a"), col("_sh_b"))))
      .withColumn("uni", size(col("_sh_a")) + size(col("_sh_b")) - col("inter"))
      .withColumn("jaccard",
        when(col("uni") === 0, lit(1.0)).otherwise(col("inter") / col("uni")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash LSH candidates, verified with exact Jaccard ≥ threshold. */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double, shingleN: Int = 3,
                      numHashes: Int = 128, bands: Int = 32): DataFrame =
    verifyJaccard(minhashCandidates(df, textCol, idCol, shingleN, numHashes, bands),
      df, textCol, idCol, shingleN)
      .filter(col("jaccard") >= threshold)

  /** SimHash near-dups: block on each of the four 16-bit chunks of the
    * 64-bit simhash (any pair with Hamming ≤ 3 shares at least one chunk),
    * verify Hamming distance ≤ maxHamming. */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), simhash64(tokens(col(textCol))).as("_sh"))
    val chunked = sh.select(col(idCol), col("_sh"), posexplode(
      array(Seq.tabulate(4)(i =>
        shiftrightunsigned(col("_sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk")
    val other = chunked.select(col("chunk_idx"), col("chunk"),
      col(idCol).as("_id_b"), col("_sh").as("_sh_b"))
    chunked.join(other, Seq("chunk_idx", "chunk"))
      .filter(col(idCol) < col("_id_b"))
      .select(col(idCol).as("id_a"), col("_id_b").as("id_b"),
        bit_count(col("_sh").bitwiseXOR(col("_sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity join via inverted index (no LSH, no
    * cross join): explode shingles, self-join on shingle, count shared
    * shingles per pair, compute |A∩B| / (|A|+|B|−|A∩B|). Exactly
    * oracle-able in SQL. */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol), explode(shingles(col(textCol), shingleN)).as("_s"))
    val sizes = df.select(col(idCol),
      size(shingles(col(textCol), shingleN)).as("_n"))
    val pairs = sh.join(sh.select(col("_s"), col(idCol).as("_id_b")), "_s")
      .filter(col(idCol) < col("_id_b"))
      .groupBy(col(idCol).as("id_a"), col("_id_b").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col(idCol).as("id_a"), col("_n").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("_n").as("n_b")), "id_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding-cosine near-dups, exact within LSH candidate buckets. */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        dim: Int, threshold: Double,
                        bands: Int = 8, bitsPerBand: Int = 12): DataFrame = {
    val sig = Knn.hyperplaneSignature(col(vecCol), dim, bands, bitsPerBand)
    val banded = df.select(col(idCol), col(vecCol), posexplode(sig))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
    val other = banded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("_id_b"), col(vecCol).as("_v_b"))
    banded.join(other, Seq("band_idx", "band_hash"))
      .filter(col(idCol) < col("_id_b"))
      .select(col(idCol).as("id_a"), col("_id_b").as("id_b"),
        graft.functions.GraftFunctions.cosine_sim(col(vecCol), col("_v_b")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /** Exact all-pairs cosine ≥ threshold (the oracle-able exact variant;
    * O(n²) — bounded corpora only, LSH variant is the scale path). */
  def embeddingNearDupsExact(df: DataFrame, vecCol: String, idCol: String,
                             threshold: Double): DataFrame = {
    val other = df.select(col(idCol).as("_id_b"), col(vecCol).as("_v_b"))
    df.join(other, col(idCol) < col("_id_b"))
      .select(col(idCol).as("id_a"), col("_id_b").as("id_b"),
        graft.functions.GraftFunctions.cosine_sim(col(vecCol), col("_v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
