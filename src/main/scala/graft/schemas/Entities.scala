package graft.schemas

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed `Dataset[T]` views of the three cleaned entities (SURVEY.md §1.1:
  * untyped `DataFrame` as the standard representation, case-class views
  * where compile-time field safety helps — pipeline code that maps/filters
  * on fields, not ad-hoc analytics).
  *
  * Every field that can legally be NULL after cleaning (sentinel
  * nullification, null-on-error casts) is an `Option`; `ind` stays
  * required — a row with no key is malformed at ingest, and the encoder
  * surfaces that as an error instead of a silent null. The case-class
  * shapes mirror `Schemas.pinClean/geoClean/userClean` exactly (spec
  * round-trips a cleaned frame through the typed view and back).
  */
object Entities {

  /** Cleaned pin (`CLEAN:60-74`). */
  case class Pin(
      ind: Int,
      unique_id: Option[String],
      title: Option[String],
      description: Option[String],
      follower_count: Option[Int],
      poster_name: Option[String],
      tag_list: Option[String],
      is_image_or_video: Option[String],
      image_src: Option[String],
      save_location: Option[String],
      category: Option[String])

  /** Cleaned geo (`CLEAN:82-88`). */
  case class Geo(
      ind: Int,
      country: Option[String],
      coordinates: Option[Array[Float]],
      timestamp: Option[Timestamp])

  /** Cleaned user (`CLEAN:95-101`). */
  case class User(
      ind: Int,
      user_name: Option[String],
      age: Option[Int],
      date_joined: Option[Timestamp])

  def pins(df: DataFrame): Dataset[Pin] = {
    import df.sparkSession.implicits._
    df.as[Pin]
  }

  def geos(df: DataFrame): Dataset[Geo] = {
    import df.sparkSession.implicits._
    df.as[Geo]
  }

  def users(df: DataFrame): Dataset[User] = {
    import df.sparkSession.implicits._
    df.as[User]
  }
}
