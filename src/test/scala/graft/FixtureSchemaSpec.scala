package graft

/** Fixture schema-drift canary. The driver REGENERATES /root/testdata
  * between rounds and has already changed encodings silently (round 9:
  * `events.ts` went int64 TIMESTAMP(NANOS) → native timestamp[us]; the
  * engine adapted in `Tables.nanosToTimestamp` only after downstream
  * queries misbehaved). This spec reads each table's RAW parquet schema
  * (no Tables adapters) at sf0.001 — metadata-only, milliseconds — and
  * fails with an explicit expected-vs-found message, so the NEXT encoding
  * change surfaces as one named assertion instead of a smear of
  * downstream hash mismatches.
  *
  * `events.ts` accepts both known generations (timestamp[us], and the
  * legacy TIMESTAMP(NANOS) which `spark.sql.legacy.parquet.nanosAsLong`
  * surfaces as bigint) because [[graft.core.Tables]] adapts both; any
  * OTHER type there, or any drift elsewhere, fails.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** (table, accepted schema variants); first variant = current fixtures. */
  private val expected: Seq[(String, Seq[Seq[(String, String)]])] = Seq(
    "region" -> Seq(Seq("r_regionkey" -> "int", "r_name" -> "string")),
    "nation" -> Seq(
      Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int")
    ),
    "customer" -> Seq(
      Seq(
        "c_custkey"    -> "bigint",
        "c_name"       -> "string",
        "c_nationkey"  -> "int",
        "c_acctbal"    -> "double",
        "c_mktsegment" -> "string"
      )
    ),
    "supplier" -> Seq(
      Seq(
        "s_suppkey"   -> "bigint",
        "s_name"      -> "string",
        "s_nationkey" -> "int",
        "s_acctbal"   -> "double"
      )
    ),
    "part" -> Seq(
      Seq(
        "p_partkey"     -> "bigint",
        "p_name"        -> "string",
        "p_brand"       -> "string",
        "p_type"        -> "string",
        "p_size"        -> "int",
        "p_retailprice" -> "double"
      )
    ),
    "orders" -> Seq(
      Seq(
        "o_orderkey"      -> "bigint",
        "o_custkey"       -> "bigint",
        "o_orderstatus"   -> "string",
        "o_totalprice"    -> "double",
        "o_orderdate"     -> "timestamp_ntz",
        "o_orderpriority" -> "string"
      )
    ),
    "lineitem" -> Seq(
      Seq(
        "l_orderkey"      -> "bigint",
        "l_partkey"       -> "bigint",
        "l_suppkey"       -> "bigint",
        "l_linenumber"    -> "int",
        "l_quantity"      -> "double",
        "l_extendedprice" -> "double",
        "l_discount"      -> "double",
        "l_tax"           -> "double",
        "l_returnflag"    -> "string",
        "l_linestatus"    -> "string",
        "l_shipdate"      -> "timestamp_ntz"
      )
    ),
    "events" -> {
      def v(ts: String) = Seq(
        "event_id"   -> "bigint",
        "ts"         -> ts,
        "user_id"    -> "bigint",
        "event_type" -> "string",
        "value"      -> "double",
        "props"      -> "string"
      )
      Seq(v("timestamp_ntz"), v("bigint")) // bigint = legacy nanos generation
    },
    "documents" -> Seq(
      Seq(
        "doc_id"  -> "bigint",
        "text"    -> "string",
        "lang"    -> "string",
        "source"  -> "string",
        "n_chars" -> "bigint"
      )
    ),
    "embeddings" -> Seq(
      Seq("vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int")
    )
  )

  expected.foreach { case (table, variants) =>
    test(s"$table: fixture parquet schema matches the pinned contract") {
      val found = spark.read
        .parquet(s"$sf/$table.parquet")
        .schema
        .map(f => (f.name, f.dataType.simpleString))
        .toSeq
      assert(
        variants.contains(found),
        s"""
           |FIXTURE SCHEMA DRIFT in $table.parquet — the driver regenerated
           |the testdata with a new schema. Adapt graft.core.Tables (and any
           |oracle SQL touching the changed columns) BEFORE chasing hash
           |mismatches; see FIXTURES.md.
           |  expected: ${variants.head.map { case (n, t) => s"$n:$t" }.mkString(", ")}
           |  found:    ${found.map { case (n, t) => s"$n:$t" }.mkString(", ")}
           |""".stripMargin
      )
    }
  }
}
