package graft

import org.apache.spark.sql.types._

/** The r8 lesson generalized past the events `ts` column: every loader
  * column the engine depends on, pinned with its loaded Spark type, for all
  * ten driver tables. A testdata regeneration that drops, renames, or
  * re-types a depended-on column now fails HERE, in one suite with one
  * obvious message — not as a registration-time exception that silently
  * deregisters a query family (round 8 shipped a 105-query "all green"
  * report with 8 queries missing for exactly that reason).
  *
  * The contract is `required ⊆ actual`: ADDITIVE testdata evolution (new
  * columns) is allowed, the columns queries actually read are not allowed
  * to drift. Timestamp-bearing columns assert their LOADED type, so the
  * loader's encoding normalization (TablesLoaderMatrixSpec) composes with
  * this check.
  */
class TablesSchemaContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val contract: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    // o_orderdate / l_shipdate surface as NTZ from the raw read (no
    // loader normalization — every consumer immediately to_date()s them,
    // which is NTZ-safe); pinning NTZ means a drift to a DIFFERENT
    // encoding (raw nanos longs, say) still fails loudly here
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts asserts the LOADED type: whatever physical encoding the parquet
    // carries (nanos / NTZ / adjusted micros), Tables.loadEvents must
    // surface a plain TimestampType column
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every depended-on column loads with its contracted type") {
    val problems = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val actual = Tables.load(spark, dir, table).schema
        .map(f => f.name -> f.dataType).toMap
      cols.toSeq.sortBy(_._1).flatMap { case (name, tpe) =>
        actual.get(name) match {
          case None => Seq(s"$table.$name: MISSING (testdata drift?)")
          case Some(got) if got != tpe =>
            Seq(s"$table.$name: $got, contract $tpe")
          case _ => Nil
        }
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("the contract covers every table the loader knows") {
    assert(contract.keySet === Tables.names.toSet)
  }
}
