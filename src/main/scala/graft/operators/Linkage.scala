package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage / entity resolution over a keyed-name table — the
  * dedup family's SMALL-EDIT sibling: x1/x106 catch identical or
  * token-overlapping content, this catches records whose KEY STRING itself
  * drifted by a typo (misspelled names, OCR'd ids, hand-keyed codes), the
  * classic blocking + verify shape of record-linkage systems.
  *
  * The blocking index is the DELETION NEIGHBORHOOD (the symmetric-delete
  * idea behind SymSpell): each string emits itself plus every
  * single-character deletion. Two strings at Levenshtein distance ≤ 1 are
  * either equal (share the original), one a deletion of the other (the
  * longer's deletion set contains the shorter), or a substitution at
  * position i (both deletion sets contain the string with position i
  * removed) — so an equi-join on shared variants is LOSSLESS for
  * distance ≤ 1, with no all-pairs comparison anywhere. The expensive
  * exact `levenshtein` runs only on candidates the join surfaces.
  *
  * Scale shape: variants are a narrow per-row explode (|s|+1 rows per
  * record, codegen'd array expressions, no UDF), the candidate join is one
  * hash shuffle on (block, variant), and the verify filter is per-row.
  * Per-variant fanout is bounded when names within a block are near-unique;
  * EXACT-duplicate names make hot variant buckets, so run exact dedup
  * (x1's shape on the name column) first — the same discipline every
  * blocking scheme needs.
  */
object Linkage {

  /** The string plus each single-character deletion, deduplicated.
    * `substr` is 1-based: deleting position i keeps `[1, i-1] ++ [i+1, …]`.
    */
  def deleteVariants(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_union(
      array(c),
      transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - lit(1)), c.substr(i + lit(1), length(c)))))

  /** All unordered record pairs within a block at Levenshtein distance
    * ≤ 1 on `nameCol` (excluding self-pairs; `idCol` must be unique).
    * Output: blockCols ++ (id_a, name_a, id_b, name_b) with id_a < id_b.
    *
    * `maxDist` is pinned to 1: deletion-neighborhood depth 1 is provably
    * complete exactly for distance ≤ 1 (greater radii need deeper variant
    * sets, which grow as |s|^d — a different cost class).
    *
    * `maxBucketSize` is the hot-variant guard (the Dedup LSH discipline):
    * a variant shared by b records yields O(b²) candidates, and b is
    * unbounded when EXACT-duplicate names flood a block — those want
    * exact dedup (x1's shape on the name column), not an edit-distance
    * join. Buckets above the cap are dropped (count them with
    * `droppedVariantBuckets` when auditing); buckets at or under it are
    * processed in full, so results on exact-deduped names are unchanged.
    * 0 disables the guard.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDist: Int = 1,
      maxBucketSize: Long = 10000L): DataFrame = {
    require(maxDist == 1,
      s"fuzzyPairs: deletion-neighborhood blocking is lossless only for maxDist = 1, got $maxDist")
    val block = blockCols.map(col)
    val vars = df.select(block :+ col(idCol) :+ col(nameCol): _*)
      .select(block :+ col(idCol) :+ col(nameCol) :+
        explode(deleteVariants(col(nameCol))).as("__v"): _*)
    val kept =
      if (maxBucketSize <= 0) vars
      else vars.join(
        // groupBy + semi-join, not a count-over window: the hot bucket
        // this guard exists for is exactly what a window would pin into
        // one task — the count partial-aggs map-side instead
        vars.groupBy(block :+ col("__v"): _*)
          .agg(count(lit(1)).as("__b"))
          .where(col("__b") <= maxBucketSize)
          .select(block :+ col("__v"): _*),
        blockCols :+ "__v", "left_semi")
    val left = kept.select(block :+ col("__v") :+
      col(idCol).as("id_a") :+ col(nameCol).as("name_a"): _*)
    val right = kept.select(block :+ col("__v") :+
      col(idCol).as("id_b") :+ col(nameCol).as("name_b"): _*)
    left.join(right, blockCols :+ "__v")
      .where(col("id_a") < col("id_b"))
      // a pair can meet through several shared variants — dedup BEFORE the
      // per-pair levenshtein so the verify runs once per candidate pair
      .select(block :+ col("id_a") :+ col("name_a") :+
        col("id_b") :+ col("name_b"): _*)
      .distinct()
      .where(levenshtein(col("name_a"), col("name_b")) <= maxDist)
  }

  /** Variant buckets the `maxBucketSize` guard would drop — the audit
    * companion to `fuzzyPairs` (run it when a linkage pass might be
    * silently skipping a flooded name). Output: blockCols ++ (__v, __b).
    */
  def droppedVariantBuckets(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxBucketSize: Long = 10000L): DataFrame = {
    val block = blockCols.map(col)
    df.select(block :+ col(idCol) :+ col(nameCol): _*)
      .select(block :+ explode(deleteVariants(col(nameCol))).as("__v"): _*)
      .groupBy(block :+ col("__v"): _*)
      .agg(count(lit(1)).as("__b"))
      .where(col("__b") > maxBucketSize)
  }
}
