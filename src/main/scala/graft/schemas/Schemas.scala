package graft.schemas

import org.apache.spark.sql.types._

/** Single-source-of-truth schemas for the three reference entities.
  *
  * The reference declares these explicitly on its streaming path
  * (`(Clone) Kinesis Data Stream.py:22-35,59-65,88-94`) and re-infers them
  * on its batch path (`(Clone) Pinterest Data Cleaning and Queries.py:44-47`)
  * — inference is nondeterministic across files (e.g. `age` infers long in
  * batch but is declared string in streaming), so this engine always applies
  * the declared schema and never infers (SURVEY.md §1.4).
  */
object Schemas {

  /** Raw pin record — `(Clone) Kinesis Data Stream.py:22-35`. Everything is
    * a string on the wire except the index; `follower_count` carries
    * human-suffixed values like "25k" / "2M".
    */
  val pinRaw: StructType = StructType(Seq(
    StructField("index", IntegerType),
    StructField("unique_id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("poster_name", StringType),
    StructField("follower_count", StringType),
    StructField("tag_list", StringType),
    StructField("is_image_or_video", StringType),
    StructField("image_src", StringType),
    StructField("downloaded", StringType),
    StructField("save_location", StringType),
    StructField("category", StringType)))

  /** Raw geo record — `(Clone) Kinesis Data Stream.py:59-65`. */
  val geoRaw: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("country", StringType),
    StructField("latitude", FloatType),
    StructField("longitude", FloatType),
    StructField("timestamp", TimestampType)))

  /** Raw user record — `(Clone) Kinesis Data Stream.py:88-94`. */
  val userRaw: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("age", IntegerType),
    StructField("date_joined", TimestampType)))

  /** Cleaned pin — column order fixed by the `select` at
    * `(Clone) Pinterest Data Cleaning and Queries.py:72`.
    */
  val pinClean: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("unique_id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("follower_count", IntegerType),
    StructField("poster_name", StringType),
    StructField("tag_list", StringType),
    StructField("is_image_or_video", StringType),
    StructField("image_src", StringType),
    StructField("save_location", StringType),
    StructField("category", StringType)))

  /** Cleaned geo — `(Clone) Pinterest Data Cleaning and Queries.py:82-88`;
    * `coordinates` is the system's only non-primitive stored type.
    */
  val geoClean: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("country", StringType),
    StructField("coordinates", ArrayType(FloatType)),
    StructField("timestamp", TimestampType)))

  /** Cleaned user — `(Clone) Pinterest Data Cleaning and Queries.py:95-101`. */
  val userClean: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("user_name", StringType),
    StructField("age", IntegerType),
    StructField("date_joined", TimestampType)))
}
