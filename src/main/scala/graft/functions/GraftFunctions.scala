package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftx.GraftExpr

/** Public Column API for graft's native Catalyst expressions (codegen'd
  * kernels for dedup / similarity search hot paths). */
object GraftFunctions {
  /** Exact BIGINT-array dot product (order-free integer sum). */
  def dot_long(a: Column, b: Column): Column = GraftExpr.dotLong(a, b)
  /** Jaccard of two sorted, distinct string arrays (single merge pass). */
  def sorted_jaccard(a: Column, b: Column): Column = GraftExpr.sortedJaccard(a, b)
  /** Jaccard of two sorted, distinct BIGINT (hash) arrays. */
  def sorted_jaccard_long(a: Column, b: Column): Column = GraftExpr.sortedJaccardLong(a, b)
  /** Bit-population distance of two BIGINTs (SimHash compare kernel). */
  def hamming_dist(a: Column, b: Column): Column = GraftExpr.hammingDist(a, b)
  /** 60-bit md5 hashes of word n-grams, one pass, document order. */
  def ngram_hashes(text: Column, n: Int): Column =
    GraftExpr.ngramHashes(text, n, sortedDistinct = false)
  /** Sorted distinct 60-bit md5 word-n-gram hashes (shingle set). */
  def shingle_hashes(text: Column, n: Int): Column =
    GraftExpr.ngramHashes(text, n, sortedDistinct = true)
  /** Register `dot_long`/`sorted_jaccard`/`hamming_dist` for SQL use. */
  def register(spark: SparkSession): Unit = GraftExpr.register(spark)
}
