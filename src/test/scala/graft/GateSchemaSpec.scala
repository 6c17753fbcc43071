package graft

import org.apache.spark.sql.types._

/** Gate-output contract: every `SparkEntry.queries` entry must emit a
  * scalar-only schema. The driver's oracle harness canonicalizes rows
  * by sorting/hashing column VALUES; non-scalar columns (array, map,
  * struct, binary) are unhashable there and silently void the
  * correctness row (this is exactly how `q_vocab_encode` shipped red
  * in round 9 while the local Scala/DuckDB gate stayed green).
  *
  * Schema resolution only requires analysis, not execution, so this
  * asserts the contract over the entire 100+ query surface cheaply.
  */
class GateSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every declared query emits a scalar-only, harness-canonicalizable schema") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val fields = q(spark, sf).schema.fields
      val nonScalar = fields.filterNot { f =>
        f.dataType match {
          case _: StringType | _: LongType | _: IntegerType | _: DoubleType |
               _: FloatType | _: DecimalType | _: BooleanType | _: DateType |
               _: TimestampType | _: TimestampNTZType | _: ShortType | _: ByteType => true
          case _ => false
        }
      }
      if (nonScalar.isEmpty) None
      else Some(s"$name: ${nonScalar.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(bad.isEmpty, s"non-scalar gate outputs:\n${bad.mkString("\n")}")
  }
}
