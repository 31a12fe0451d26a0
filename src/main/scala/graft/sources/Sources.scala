package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY.md §2.1). The reference infers JSON schemas per
  * run (`(Clone) Pinterest Data Cleaning and Queries.py:44-47`) —
  * nondeterministic across files and an extra file-listing+sampling job at
  * 100 TB. This engine always APPLIES a declared schema and can verify a
  * source against it instead (one footer/header read, no data scan).
  */
object Sources {

  /** JSON-lines directory scan with declared schema (S2). Glob paths
    * (dir/partition=0/star.json-style patterns) are supported natively.
    */
  def json(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** Opt-in inference fallback completing the reference's dual-mode story
    * (`CLEAN:44-47` infers per run; streaming declares, `KINESIS:22-35`).
    * Infers the schema by sampling, then returns the frame plus its drift
    * against the declared contract ([[schemaMismatches]]), so a caller can
    * choose to fail, log, or adopt. Inference costs an extra
    * file-listing + sampling pass and is nondeterministic across files —
    * that is why it is the fallback, never the default (SURVEY.md §1.4).
    */
  def jsonInferred(s: SparkSession, path: String, declared: StructType)
      : (DataFrame, Seq[String]) = {
    // A schema-less JSON read always infers by sampling; there is no
    // inferSchema option for JSON (that's a CSV option).
    val df = s.read.json(path)
    (df, schemaMismatches(df.schema, declared))
  }

  /** JSON read that CAPTURES malformed records instead of nulling them
    * silently (the declared-schema read's PERMISSIVE default) or failing
    * the job (FAILFAST): bad lines land intact in `_corrupt_record` for
    * quarantine/inspection — the ingest-hygiene path a production
    * pipeline runs, since a nulled-out record is indistinguishable from
    * a legitimately-null one downstream.
    */
  def jsonWithCorruptCapture(s: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType))
    s.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** CSV with header+separator options — the reference's credentials-read
    * shape (S1, `CLEAN:14-17`), schema declared not inferred.
    */
  def csv(s: SparkSession, path: String, schema: StructType,
      sep: String = ","): DataFrame =
    s.read.schema(schema).option("header", "true").option("sep", sep)
      .csv(path)

  /** Parquet scan; schema comes from footers (already deterministic). */
  def parquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Parquet scan with schema evolution: union the footers of ALL files
    * (`mergeSchema`) so directories written across schema versions read
    * as one table — new columns are NULL for old files. Costs a footer
    * read per file (not per row); off by default in Spark because of
    * that listing cost, which is why it's an explicit entry point here.
    */
  def parquetMergedSchema(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(path)

  /** ORC scan — the other columnar format Spark bundles natively; same
    * footer-driven schema determinism as parquet. Completes the format
    * matrix (CSV/JSON/parquet/ORC) so a reference user can point the
    * engine at whichever layout their lake already has.
    */
  def orc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Validate that a source's actual schema matches the declared one by
    * name and type (nullability ignored: parquet writers vary it freely).
    * Returns the mismatches; empty = compatible.
    */
  def schemaMismatches(actual: StructType, declared: StructType): Seq[String] = {
    val a = actual.fields.map(f => f.name -> f.dataType).toMap
    declared.fields.flatMap { f =>
      a.get(f.name) match {
        case None => Some(s"missing column ${f.name}")
        case Some(t) if t != f.dataType =>
          Some(s"${f.name}: expected ${f.dataType.simpleString}, found ${t.simpleString}")
        case _ => None
      }
    }.toSeq ++ a.keys.filterNot(declared.fieldNames.contains)
      .map(n => s"unexpected column $n")
  }
}
