package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Facet helpers beyond flat value counts. */
object Facets {

  /** Arbitrary-depth taxonomy rollup — the re-expression of the reference's
    * taxonomy facet counting
    * (`/root/reference/lucene/facet/src/java/org/apache/lucene/facet/taxonomy/TaxonomyFacetIntAssociations.java`
    * + `FacetsConfig` path handling): each document carries a category path
    * (array of components, any depth, possibly ragged across docs), and
    * every prefix of the path counts the document — `dim`, `dim/a`,
    * `dim/a/b`, ... The rollup is one generated-prefix explode + a single
    * groupBy: no per-level passes, no driver loop, shuffle keyed by path —
    * the shape that survives a 100 TB corpus (path cardinality, not corpus
    * size, bounds the agg state).
    *
    * @param df      one row per matching document
    * @param pathCol `array<string>` category path
    * @param sep     path component separator in the emitted `path` column
    * @return (path, n_docs), one row per distinct prefix
    */
  def taxonomyRollup(df: DataFrame, pathCol: Column, sep: String = "/"): DataFrame =
    df.select(explode(
        transform(pathCol, (_, i) => array_join(slice(pathCol, lit(1), i + 1), sep)))
      .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_docs"))

  /** Association facets — the reference's
    * `facet/taxonomy/TaxonomyFacetIntAssociations.java` /
    * `TaxonomyFacetFloatAssociations.java`: each matching document carries a
    * per-category association value (a confidence, a weight, a revenue
    * figure) and the facet aggregates the VALUE per label instead of just
    * counting documents. Same one-explode one-groupBy shape as
    * [[taxonomyRollup]]; agg state is still bounded by path cardinality.
    *
    * @param valueCol numeric association value carried by each doc
    * @return (path, sum_assoc, n_docs) per distinct path prefix
    */
  def taxonomyAssociations(df: DataFrame, pathCol: Column, valueCol: Column,
                           sep: String = "/"): DataFrame =
    df.select(
        explode(transform(pathCol,
          (_, i) => array_join(slice(pathCol, lit(1), i + 1), sep))).as("path"),
        valueCol.as("assoc"))
      .groupBy(col("path"))
      .agg(sum(col("assoc")).as("sum_assoc"), count(lit(1)).as("n_docs"))
}
