package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (JSON string) column handling — event payloads, crawler
  * metadata, API dumps: the columns a training-data pipeline receives as
  * opaque JSON text next to the typed columns.
  *
  * Scale notes:
  *  - [[parseJson]] takes an EXPLICIT schema: `from_json` with a schema is a
  *    single scan-stage projection (and the optimizer prunes unaccessed
  *    struct fields from the parse); `spark.read.json`-style inference would
  *    scan the data twice and can flip types between runs — never infer on
  *    the hot path.
  *  - [[extractPath]] (`get_json_object`) re-parses the document per call —
  *    fine for ONE field; for several fields one [[parseJson]] struct is one
  *    parse instead of N (SemiStructuredSpec pins the equivalence).
  *  - malformed documents parse to a struct of NULL fields (PERMISSIVE), so
  *    bad rows degrade instead of failing the job. To QUARANTINE them, add
  *    a `_corrupt_record` string field to the schema: it stays NULL on good
  *    rows and carries the raw text on malformed ones — all-null fields
  *    alone cannot distinguish `{"k": null}` from garbage.
  */
object SemiStructured {

  /** Parse a JSON string column into a typed struct column `as` with an
    * explicit schema. */
  def parseJson(df: DataFrame, jsonCol: String, schema: StructType,
                as: String = "j"): DataFrame =
    df.withColumn(as, from_json(col(jsonCol), schema))

  /** Single-field JSONPath extraction (string-typed; cast at the call
    * site). One parse per CALL — prefer [[parseJson]] when reading more
    * than one field from the same document. */
  def extractPath(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, path)
}
