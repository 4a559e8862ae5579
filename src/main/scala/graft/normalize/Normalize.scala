package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalization scalar ops (SURVEY.md §2.B6-B7, §2.G) as codegen'd
  * column expressions.
  */
object Normalize {

  /** AWS account-id normalization (reference: cmd/graph-vulcan-assets/
    * main.go:245-262): a bare 12-digit account id is wrapped as
    * `arn:aws:iam::<id>:root`; an already-long ARN passes through; anything
    * else is invalid (null here; the reference errors).
    */
  def normalizeAwsAccountId(id: Column): Column =
    when(id.rlike("^arn:aws:iam::[0-9]{12}:root$"), id)
      .when(id.rlike("^[0-9]{12}$"),
        concat(lit("arn:aws:iam::"), id, lit(":root")))
      .otherwise(lit(null).cast("string"))

  /** Annotation selection (reference: cmd/graph-vulcan-assets/main.go:131-138):
    * explode the `Annotations ARRAY<STRUCT<Key,Value>>` bag and keep entries
    * for one key. Uses `explode` + filter so Catalyst can prune the rest.
    */
  def matchingAnnotations(df: DataFrame, annotationsCol: String, key: String): DataFrame =
    df.select(col("*"), explode(col(annotationsCol)).as("annotation"))
      .filter(col("annotation.Key") === lit(key))
      .withColumn("annotation_value", col("annotation.Value"))
      .drop("annotation")

  /** Rolfp bitfield parse, e.g. "R:0/O:1/L:0/F:1/P:0+S:1" → typed columns.
    * (Reference carries it opaque — vulcan/vulcan.go:34; parsing is the
    * natural relational extension.)
    */
  def parseRolfp(rolfp: Column): Column = {
    def flag(name: String) =
      regexp_extract(rolfp, name + ":(\\d)", 1).cast("int").as(name.toLowerCase)
    struct(flag("R"), flag("O"), flag("L"), flag("F"), flag("P"), flag("S"))
  }
}
