package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Cleaners, ReferenceQueries}
import graft.schemas.Schemas

/** The reference's batch entry point (`CLEAN`, daily via Airflow) as one
  * callable: raw JSON dirs → declared-schema reads → the three cleaners →
  * materialized cleaned tables (temp views; at scale `saveAsTable`) → the
  * 9 analytics results.
  *
  * Differences from the reference, by design (SURVEY.md §1.4, §4.2):
  *  - schemas are DECLARED, never inferred — batch and streaming share the
  *    same StructType constants, eliminating the reference's
  *    inference drift (age: long in batch, string in streaming);
  *  - the year filter is a timestamp range (stat-prunable);
  *  - cleaned outputs are also returned, so callers can persist them once
  *    and fan the 9 queries out over the materialization (the reference's
  *    one manual physical optimization, `CLEAN:108-109,174,190`).
  */
object BatchPipeline {

  case class Cleaned(pin: DataFrame, geo: DataFrame, user: DataFrame)

  /** Read one topic's JSON dump with its declared schema
    * (`CLEAN:40-52` minus inference).
    */
  def readTopic(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).json(path)

  def clean(rawPin: DataFrame, rawGeo: DataFrame, rawUser: DataFrame): Cleaned =
    Cleaned(
      rawPin.transform(Cleaners.pinClean),
      rawGeo.transform(Cleaners.geoClean),
      rawUser.transform(Cleaners.userClean))

  /** Full run from JSON directories. Registers pin_table/geo_table/
    * user_table views (the reference's `saveAsTable` names) and returns
    * the 9 query results keyed q1..q9.
    */
  def run(s: SparkSession, pinDir: String, geoDir: String,
      userDir: String): Map[String, DataFrame] = {
    val c = clean(
      readTopic(s, pinDir, Schemas.pinRaw),
      readTopic(s, geoDir, Schemas.geoRaw),
      readTopic(s, userDir, Schemas.userRaw))
    c.pin.createOrReplaceTempView("pin_table")
    c.geo.createOrReplaceTempView("geo_table")
    c.user.createOrReplaceTempView("user_table")
    queriesOver(c)
  }

  /** The 9 analytics results over already-cleaned tables. */
  def queriesOver(c: Cleaned): Map[String, DataFrame] = Map(
    "q1" -> ReferenceQueries.q1(c.geo, c.pin),
    "q2" -> ReferenceQueries.q2(c.geo, c.pin),
    "q3" -> ReferenceQueries.q3(c.geo, c.pin),
    "q4" -> ReferenceQueries.q4(c.geo, c.pin),
    "q5" -> ReferenceQueries.q5(c.user, c.pin),
    "q6" -> ReferenceQueries.q6(c.user, c.pin),
    "q7" -> ReferenceQueries.q7(c.user),
    "q8" -> ReferenceQueries.q8(c.user, c.pin),
    "q9" -> ReferenceQueries.q9(c.user, c.pin))
}
