package graft.schema

import org.apache.spark.sql.types._

/** Explicit ingest schemas (SURVEY §2.1 S3) — the Spark analog of the
  * reference's hand-written bronze DDL (`aact_bronze_layer.sql:13-85`:
  * every COPY target is a fully-typed table, never schema-inferred).
  *
  * Explicit StructTypes are also the only scalable option: `inferSchema`
  * re-reads the whole input once per load, which at 100 TB doubles ingest
  * cost and races against source drift.
  */
object Schemas {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** The reference's complete bronze `studies` DDL re-expressed as a Spark
    * StructType — all 71 columns in declaration order
    * (`aact_bronze_layer.sql:13-85`), with PG→Spark type mapping:
    * VARCHAR(n)/TEXT → StringType (Spark strings are unbounded; the length
    * caps are PG storage hints, not semantics), DATE → DateType,
    * INT → IntegerType, TIMESTAMPTZ → TimestampType (Spark's TIMESTAMP is
    * session-TZ-aware — the same instant semantics). Paired with
    * [[graft.sources.Csv.read]] this is the reference's
    * `COPY bronze.studies FROM studies.txt (FORMAT csv, DELIMITER '|',
    * HEADER true)` ingest, typed end-to-end with zero inference passes. */
  val studies: StructType = {
    def s(n: String) = StructField(n, StringType)
    def d(n: String) = StructField(n, DateType)
    def i(n: String) = StructField(n, IntegerType)
    def ts(n: String) = StructField(n, TimestampType)
    StructType(Seq(
      s("nct_id"), s("nlm_download_date_description"),
      d("study_first_submitted_date"), d("results_first_submitted_date"),
      d("disposition_first_submitted_date"), d("last_update_submitted_date"),
      d("study_first_submitted_qc_date"), d("study_first_posted_date"),
      s("study_first_posted_date_type"), d("results_first_submitted_qc_date"),
      d("results_first_posted_date"), s("results_first_posted_date_type"),
      d("disposition_first_submitted_qc_date"), d("disposition_first_posted_date"),
      s("disposition_first_posted_date_type"), d("last_update_submitted_qc_date"),
      d("last_update_posted_date"), s("last_update_posted_date_type"),
      s("start_month_year"), s("start_date_type"), d("start_date"),
      s("verification_month_year"), d("verification_date"),
      s("completion_month_year"), s("completion_date_type"), d("completion_date"),
      s("primary_completion_month_year"), s("primary_completion_date_type"),
      d("primary_completion_date"), s("target_duration"), s("study_type"),
      s("acronym"), s("baseline_population"), s("brief_title"),
      s("official_title"), s("overall_status"), s("last_known_status"),
      s("phase"), i("enrollment"), s("enrollment_type"), s("source"),
      s("limitations_and_caveats"), i("number_of_arms"), i("number_of_groups"),
      s("why_stopped"), s("has_expanded_access"),
      s("expanded_access_type_individual"), s("expanded_access_type_intermediate"),
      s("expanded_access_type_treatment"), s("has_dmc"),
      s("is_fda_regulated_drug"), s("is_fda_regulated_device"),
      s("is_unapproved_device"), s("is_ppsd"), s("is_us_export"),
      s("biospec_retention"), s("biospec_description"), s("ipd_time_frame"),
      s("ipd_access_criteria"), s("ipd_url"), s("plan_to_share_ipd"),
      s("plan_to_share_ipd_description"), ts("created_at"), ts("updated_at"),
      s("source_class"), s("delayed_posting"), s("expanded_access_nctid"),
      s("expanded_access_status_for_nctid"), s("fdaaa801_violation"),
      s("baseline_type_units_analyzed"), s("patient_registry")))
  }

  val all: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)
}
