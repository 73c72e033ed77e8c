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
    * hash is FNV-folded inside the [[graft.functions.MinHashBands]]
    * expression (single codegen'd pass, no intermediate signature array in
    * the plan). Docs agreeing on any band are candidates. */
  def minhashBands(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame =
    df.select(col(idCol),
        posexplode(minhash_bands(shingles(col(textCol), shingleN), numHashes, bands)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")

  /** Expand each bucket row's sorted element array into ordered (a < b)
    * pairs WITHOUT materializing the n² pair array in one value: explode
    * elements with their index, then pair each with its strict successors.
    * Output columns `_a`, `_b` (same type as the array elements). */
  private def bucketPairs(buckets: DataFrame, elemsCol: String): DataFrame =
    buckets
      .filter(size(col(elemsCol)) > 1)
      .select(col(elemsCol), posexplode(col(elemsCol)))
      .select(col("col").as("_a"),
        explode(slice(col(elemsCol), col("pos") + 2, size(col(elemsCol)))).as("_b"))

  /** Group a banded (bucket-key, …) frame into per-bucket sorted element
    * arrays. One shuffle, signatures computed ONCE (a band self-join would
    * recompute the whole signature projection on both sides — the rename
    * breaks exchange reuse). `maxBucket` caps pathological buckets (n²
    * pair blowup): sorted ids, keep-first truncation — buckets that large
    * are near-certain exact duplicates, which [[exactDedup]] handles in
    * O(n); run it first on raw web corpora. */
  private def bucketed(banded: DataFrame, elem: Column, maxBucket: Int): DataFrame =
    banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(slice(sort_array(collect_set(elem)), 1, maxBucket).as("_elems"))

  /** Candidate near-dup pairs (id_a < id_b) from banded MinHash LSH. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                        maxBucket: Int = 4096): DataFrame = {
    val banded = minhashBands(df, textCol, idCol, shingleN, numHashes, bands)
    bucketPairs(bucketed(banded, col(idCol), maxBucket), "_elems")
      .select(col("_a").as("id_a"), col("_b").as("id_b"))
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
    val banded = sh.select(col(idCol), col("_sh"), posexplode(
      array(Seq.tabulate(4)(i =>
        shiftrightunsigned(col("_sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
    // bucket elements carry (id, simhash) so verification needs no join back
    bucketPairs(bucketed(banded, struct(col(idCol), col("_sh")), maxBucket = 65536),
        "_elems")
      .select(col("_a").getField(idCol).as("id_a"),
        col("_b").getField(idCol).as("id_b"),
        bit_count(col("_a").getField("_sh")
          .bitwiseXOR(col("_b").getField("_sh"))).as("hamming"))
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

  /** Embedding-cosine near-dups, exact within LSH candidate buckets.
    * Buckets hold ids only (vectors are wide — shuffling them through the
    * band exchange would dominate); candidate pairs are deduplicated FIRST,
    * then the two vectors join back per surviving pair. */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        dim: Int, threshold: Double,
                        bands: Int = 8, bitsPerBand: Int = 12,
                        maxBucket: Int = 4096): DataFrame = {
    val sig = Knn.hyperplaneSignature(col(vecCol), dim, bands, bitsPerBand)
    val banded = df.select(col(idCol), posexplode(sig))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
    val pairs = bucketPairs(bucketed(banded, col(idCol), maxBucket), "_elems")
      .select(col("_a").as("id_a"), col("_b").as("id_b"))
      .distinct()
    val vecs = df.select(col(idCol), col(vecCol))
    pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("_v_a")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("_v_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.GraftFunctions.cosine_sim(col("_v_a"), col("_v_b")).as("cosine"))
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
