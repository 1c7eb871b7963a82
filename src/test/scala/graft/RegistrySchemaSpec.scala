package graft

import org.apache.spark.sql.types._

/** Registry-wide output-schema audit.
  *
  * The driver's correctness gate hashes each query's parquet output
  * through pandas and the DuckDB oracle's `.df()` — two stacks whose
  * materializations only agree for types with a single faithful
  * representation. Two rounds produced the same failure genre: an
  * output column whose VALUES were identical but whose TYPE broke the
  * hash (r8 `emb_pca_project` ndarray, r9 `twap_user` DECIMAL(38,2)
  * vs float64 coercion — 17 significant digits can't round-trip).
  *
  * This spec outlaws the class: no registered query may emit a
  * DecimalType column, at any nesting depth. Exact non-double math
  * stays internal (decimal/long accumulation is fine — and used);
  * the exposed surface is integers (exact) plus at most one final
  * double. Schema inspection only — no query is executed, so eager
  * builders (ML training, index construction) are the only cost.
  */
class RegistrySchemaSpec extends SparkSpec {

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType     => Seq(path)
    case s: StructType      => s.fields.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}")).toSeq
    case a: ArrayType       => decimalPaths(a.elementType, s"$path[]")
    case m: MapType         => decimalPaths(m.keyType, s"$path.key") ++
                               decimalPaths(m.valueType, s"$path.value")
    case _                  => Nil
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name output schema carries no DecimalType") {
      val bad = fn(spark, sf).schema.fields
        .flatMap(f => decimalPaths(f.dataType, f.name))
      assert(bad.isEmpty,
        s"$name emits decimal columns ${bad.mkString(", ")}: emit exact " +
          "integers (e.g. cents) or a final double instead")
    }
  }
}
