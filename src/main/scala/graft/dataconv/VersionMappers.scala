package graft.dataconv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-version mapping v1/v2/v3 ⇄ canonical as pure Catalyst column
  * expressions (no UDFs — a whole mapping chain folds into one
  * whole-stage-codegen'd Project).
  *
  * Semantics mirror the reference mappers
  * (/root/reference/versionMappers.js:26-103, server copy
  * /root/reference/server.py:156-219):
  *   canonical = (firstName, lastName, email, createdAt, active:boolean)
  *   v1 = flat snake_case;  v2 = fullName/emailAddress/status;
  *   v3 = nested name{first,last} contact{email} meta{createdAt,active}.
  */
object VersionMappers {

  /** Boolean coercion (/root/reference/versionMappers.js:1-11): bool
    * passthrough; string in {'1','true','yes','active'} after trim+lower →
    * true; any other string → false. */
  def normalizeBoolean(c: Column): Column =
    when(lower(trim(c.cast("string"))).isin("1", "true", "yes", "active"), lit(true))
      .otherwise(lit(false))

  /** splitFullName (/root/reference/versionMappers.js:13-24): trim, split on
    * whitespace runs; first token vs rest re-joined with single spaces. */
  def splitFirst(fullName: Column): Column =
    coalesce(element_at(split(trim(coalesce(fullName, lit(""))), "\\s+"), 1), lit(""))

  def splitLast(fullName: Column): Column = {
    val parts = split(trim(coalesce(fullName, lit(""))), "\\s+")
    array_join(slice(parts, lit(2), greatest(size(parts) - 1, lit(0))), " ")
  }

  /** `${first} ${last}`.trim() (/root/reference/versionMappers.js:74). */
  def joinFullName(first: Column, last: Column): Column =
    trim(concat_ws(" ", coalesce(first, lit("")), coalesce(last, lit(""))))

  /** active → 'active' | 'inactive' (/root/reference/versionMappers.js:77). */
  def statusEncode(active: Column): Column =
    when(active, lit("active")).otherwise(lit("inactive"))

  /** toCanonical as one struct expression over the external-version columns
    * of the input row (null-safe defaulting per the reference's `?? ''`). */
  def toCanonical(version: String): Column = version match {
    case "v1" => struct(
      coalesce(col("first_name"), lit("")).as("firstName"),
      coalesce(col("last_name"), lit("")).as("lastName"),
      coalesce(col("email"), lit("")).as("email"),
      coalesce(col("created_at"), lit("")).as("createdAt"),
      normalizeBoolean(coalesce(col("active").cast("string"), lit("false"))).as("active"))
    case "v2" => struct(
      splitFirst(col("fullName")).as("firstName"),
      splitLast(col("fullName")).as("lastName"),
      coalesce(col("emailAddress"), lit("")).as("email"),
      coalesce(col("createdAt"), lit("")).as("createdAt"),
      normalizeBoolean(coalesce(col("status"), lit("false"))).as("active"))
    case "v3" => struct(
      coalesce(col("name.first"), lit("")).as("firstName"),
      coalesce(col("name.last"), lit("")).as("lastName"),
      coalesce(col("contact.email"), lit("")).as("email"),
      coalesce(col("meta.createdAt"), lit("")).as("createdAt"),
      normalizeBoolean(coalesce(col("meta.active").cast("string"), lit("false"))).as("active"))
    case v => throw new IllegalArgumentException(s"Unsupported input version: $v")
  }

  /** fromCanonical: columns of the target external version, computed from a
    * canonical struct column `c`. */
  def fromCanonical(c: Column, version: String): Seq[Column] = version match {
    case "v1" => Seq(
      c.getField("firstName").as("first_name"),
      c.getField("lastName").as("last_name"),
      c.getField("email").as("email"),
      c.getField("createdAt").as("created_at"),
      c.getField("active").as("active"))
    case "v2" => Seq(
      joinFullName(c.getField("firstName"), c.getField("lastName")).as("fullName"),
      c.getField("email").as("emailAddress"),
      c.getField("createdAt").as("createdAt"),
      statusEncode(c.getField("active")).as("status"))
    case "v3" => Seq(
      struct(c.getField("firstName").as("first"), c.getField("lastName").as("last")).as("name"),
      struct(c.getField("email").as("email")).as("contact"),
      struct(c.getField("createdAt").as("createdAt"), c.getField("active").as("active")).as("meta"))
    case v => throw new IllegalArgumentException(s"Unsupported output version: $v")
  }

  /** mapVersion (/root/reference/versionMappers.js:100-103): one Project.
    * Columns named in `keep` are carried through untouched. */
  def mapVersion(df: DataFrame, from: String, to: String, keep: Seq[String] = Nil): DataFrame =
    df.select(keep.map(col) ++ fromCanonical(toCanonical(from), to): _*)
}
