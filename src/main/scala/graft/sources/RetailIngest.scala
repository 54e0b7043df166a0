package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ETL surface (SURVEY.md §2.1 S1-S3, §2.2 P1-P7, §2.3 J1,
  * §2.1 S4/S5): dirty-CSV ingest → cleaning → last-write-wins upsert →
  * MESHJOIN stream-static enrichment → fact build.
  *
  * Intended-semantics policy (SURVEY §7.1): reference bugs are FIXED, each
  * divergence documented and unit-tested —
  *  - customers header row ingested as data (`MeshJoin.java:67-81` has no
  *    header skip): we skip it;
  *  - quote-blind `split(",")` mangles quoted supplier names
  *    (`MeshJoin.java:99`): we parse RFC-4180 quotes;
  *  - MESHJOIN chunk re-read / eviction miscount (`MeshJoin.java:271-274,
  *    333-352`): we join every transaction exactly once.
  *
  * Scale posture: cleaning is pure column expressions (codegen'd, no UDFs);
  * the enrichment join broadcasts the dims (100/101 rows in the reference);
  * at 100 TB with big dims the same plan shuffle-hash-joins on the keys.
  * Last-write-wins needs an explicit ingest-order column — derived from file
  * position at read time; never from `monotonically_increasing_id` after a
  * repartition (SURVEY §7.5 #4).
  */
object RetailIngest {

  // Raw CSV schemas — fixed, declared up front (`metro.sql:13-59`); no
  // inference, so semantics cannot drift with data.
  val customersSchema: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("customer_name", StringType),
    StructField("gender", StringType)))

  val productsSchema: StructType = StructType(Seq(
    StructField("productID", StringType),
    StructField("productName", StringType),
    StructField("productPrice", StringType),
    StructField("supplierID", StringType),
    StructField("supplierName", StringType),
    StructField("storeID", StringType),
    StructField("storeName", StringType)))

  val transactionsSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_date", StringType),
    StructField("product_id", StringType),
    StructField("quantity", StringType),
    StructField("customer_id", StringType),
    StructField("time_id", StringType))) // present in the file, ignored
                                         // by the reference (`MeshJoin.java:168-190`)

  /** CSV scan with RFC-4180 quote handling (S1-S3). */
  private def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  /** Attach the file-position ingest order that last-write-wins needs.
    *
    * `RDD.zipWithIndex` is the distributed per-partition offset scheme: one
    * small count job over the partitions, then every partition numbers its
    * rows from its prefix-sum offset in parallel. (Round 1 funneled the
    * whole input through `coalesce(1)` — a one-core pass that would
    * serialize the unbounded transactions side at scale.) The index equals
    * file position because an un-shuffled CSV scan keeps rows in order
    * within each split and orders the splits of a file by byte offset
    * (equal-sized splits keep offset order under Spark's stable
    * largest-first packing; the final short split sorts last, which is also
    * its file position). A production stream would carry its own sequence
    * column — a log offset — instead of deriving one at read time. */
  private def withIngestOrder(df: DataFrame): DataFrame = {
    val schema = df.schema.add(StructField("ingest_order", LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Last-write-wins keyed dedup — the reference's `INSERT … ON DUPLICATE
    * KEY UPDATE` (`MeshJoin.java:73-74`): for each key keep the row with the
    * greatest ingest order. One shuffle on the key. */
  def lastWriteWins(df: DataFrame, key: String, order: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(order).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", order)
  }

  /** Customers: header skipped (divergence — the reference ingests it as a
    * data row), last occurrence per customer_id wins (30,247 rows → 100). */
  def customers(s: SparkSession, path: String): DataFrame =
    lastWriteWins(
      withIngestOrder(readCsv(s, path, customersSchema)),
      "customer_id", "ingest_order")

  /** Product price cleaning (P3, P5): strip non-[0-9.] (`1299.99$`), default
    * unparseable to 0.0, reject negatives (`MeshJoin.java:119-132`). */
  def cleanPrice(c: Column): Column =
    coalesce(
      try_to_number(regexp_replace(c, "[^0-9.]", ""), lit("999999999.99")),
      lit(0.0)).cast(DecimalType(10, 2))

  /** Products: trim every field (P2), clean the price, reject rows with an
    * empty key field (P4 — reference logs them to stdout; we expose them via
    * `productRejects`) and negative prices (P5). */
  def products(s: SparkSession, path: String): DataFrame = {
    val trimmed = readCsv(s, path, productsSchema)
      .select(productsSchema.fieldNames.map(f => trim(col(f)).as(f)): _*)
    trimmed
      .filter(keyFieldsPresent)
      .withColumn("productPrice", cleanPrice(col("productPrice")))
      .filter(col("productPrice") >= 0)
  }

  private def keyFieldsPresent: Column =
    Seq("productID", "productName", "supplierID", "storeID")
      .map(f => col(f).isNotNull && col(f) =!= "")
      .reduce(_ && _)

  /** Quarantine stream — rows the cleaner rejected (P4's console warnings,
    * made queryable instead). */
  def productRejects(s: SparkSession, path: String): DataFrame = {
    val trimmed = readCsv(s, path, productsSchema)
      .select(productsSchema.fieldNames.map(f => trim(col(f)).as(f)): _*)
    trimmed.filter(!keyFieldsPresent)
  }

  /** Multi-format date parse (P6, `MeshJoin.java:158,172-186`): timestamp
    * prefix first, then the reference's four date formats, first hit wins.
    * try_to_* because Spark 4 runs ANSI mode (a bare to_date throws). */
  def parseOrderDate(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")).cast(DateType),
      try_to_date(c, "yyyy-MM-dd"),
      try_to_date(c, "MM/dd/yyyy"),
      try_to_date(c, "dd-MM-yyyy"),
      try_to_date(c, "yyyy/MM/dd"))

  /** Transactions: parse dates (reject unparseable), int-cast quantity
    * (reject negative/unparseable — `MeshJoin.java:184-196`), drop time_id.
    * Carries `ingest_order` (file position) so the fact upsert can resolve
    * duplicate ORDER_IDs last-write-wins; a production stream would carry
    * its own sequence column (e.g. a log offset) instead. */
  def transactions(s: SparkSession, path: String): DataFrame =
    withIngestOrder(readCsv(s, path, transactionsSchema))
      .withColumn("order_date", parseOrderDate(col("order_date")))
      .withColumn("quantity", try_to_number(col("quantity"), lit("999999999")).cast(IntegerType))
      .filter(col("order_date").isNotNull)
      .filter(col("quantity").isNotNull && col("quantity") >= 0)
      .select("order_id", "order_date", "product_id", "quantity", "customer_id",
        "ingest_order")

  /** MESHJOIN (J1, `MeshJoin.java:216-284`) as a declarative stream-static
    * enrichment: transactions ⋈ customers ⋈ products (inner, per the Java
    * path `MeshJoin.java:264-267`), SALE = QUANTITY × PRODUCT_PRICE in
    * DECIMAL at the fact boundary (`metro.sql:56`), upsert by ORDER_ID.
    * MESHJOIN's bounded-memory partition/queue machinery is subsumed by
    * Spark's broadcast/shuffle join — the dims here are broadcast-size. */
  def buildFact(txns: DataFrame, customers: DataFrame, products: DataFrame): DataFrame = {
    val cols = Seq(
      col("order_id").as("ORDER_ID"),
      col("order_date").as("ORDER_DATE"),
      col("product_id").as("PRODUCT_ID"),
      col("customer_id").as("CUSTOMER_ID"),
      col("customer_name").as("CUSTOMER_NAME"),
      col("gender").as("GENDER"),
      col("productName").as("PRODUCT_NAME"),
      col("productPrice").as("PRODUCT_PRICE"),
      col("supplierID").as("SUPPLIER_ID"),
      col("supplierName").as("SUPPLIER_NAME"),
      col("storeID").as("STORE_ID"),
      col("storeName").as("STORE_NAME"),
      col("quantity").as("QUANTITY"),
      (col("quantity") * col("productPrice")).cast(DecimalType(10, 2)).as("SALE")) ++
      (if (txns.columns.contains("ingest_order")) Seq(col("ingest_order")) else Nil)
    txns
      .join(broadcast(customers), Seq("customer_id"))
      .join(broadcast(products), txns("product_id") === products("productID"))
      .select(cols: _*)
  }

  /** Full pipeline: CSV dir with the three reference files → fact table.
    * Duplicate ORDER_IDs resolve last-write-wins AFTER enrichment, matching
    * the reference's fact upsert (`MeshJoin.java:354-376`): a later
    * duplicate that fails the dim join must not erase an earlier hit. */
  def etl(s: SparkSession, dir: String): DataFrame = {
    val fact = buildFact(
      transactions(s, s"$dir/transactions.csv"),
      customers(s, s"$dir/customers_data.csv"),
      products(s, s"$dir/products_data.csv"))
    lastWriteWins(fact, "ORDER_ID", "ingest_order")
  }

  /** `valid_to` sentinel for a dimension version that is still open. A
    * concrete BIGINT (not NULL) so interval predicates (`seq BETWEEN
    * valid_from AND valid_to`) need no null branch and the output carries no
    * nullable column the comparator can't hash. */
  val Scd2OpenEnd = 9999999999L

  /** SCD type-2 dimension history — the warehouse-canonical versioning that
    * the reference's `ON DUPLICATE KEY UPDATE` upsert (`MeshJoin.java:73-74`)
    * destroys: instead of keeping only the last write per key, every
    * attribute CHANGE opens a new version with a validity interval over the
    * ingest sequence, and identical re-sends collapse into the current run.
    *
    * Scale shape: one shuffle on the business key; the change-flag window,
    * the run-collapse groupBy, and the interval window all reuse that same
    * (customer_id)-partitioning, so Catalyst plans a single Exchange with
    * in-partition sorts — at 100 TB the cost is one pass of the dimension
    * delta, not a per-version join. */
  def scd2(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seqd = withIngestOrder(readCsv(s, path, customersSchema))
      .withColumn("seq", col("ingest_order") + 1) // 1-based = the oracle's row_number
    val byKey = Window.partitionBy(col("customer_id")).orderBy(col("seq"))
    // a row opens a new version iff it is the key's first, or any tracked
    // attribute differs (null-safely) from the previous row for the key
    val opens = lag(col("seq"), 1).over(byKey).isNull ||
      !(col("customer_name") <=> lag(col("customer_name"), 1).over(byKey)) ||
      !(col("gender") <=> lag(col("gender"), 1).over(byKey))
    val runs = seqd
      .withColumn("ver", sum(opens.cast(LongType)).over(byKey))
      .groupBy(col("customer_id"), col("ver"))
      .agg( // attributes are constant within a run; min is a deterministic pick
        min(col("customer_name")).as("customer_name"),
        min(col("gender")).as("gender"),
        min(col("seq")).as("valid_from"))
    val byVer = Window.partitionBy(col("customer_id")).orderBy(col("ver"))
    runs
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(byVer) - 1, lit(Scd2OpenEnd)))
      .select(col("customer_id"), col("ver").cast(IntegerType).as("version"),
        col("customer_name"), col("gender"), col("valid_from"), col("valid_to"),
        (col("valid_to") === Scd2OpenEnd).cast(IntegerType).as("is_current"))
  }

  // === driver-gate entries (S1-S3 + S5 end-to-end) ===========================

  /** Bundled dirty-CSV fixture (24 committed lines carrying every planted
    * reference quirk: header-as-data, quoted commas, `$`-suffixed and
    * unparseable prices, empty key fields, four date formats, the 1819
    * outlier, negative/garbage quantities, duplicate keys). Absolute path so
    * the driver's DuckDB oracle reads the same bytes via `read_csv`. */
  val FixtureDir = "/root/repo/src/test/resources/retail"

  /** DuckDB twin of the raw CSV scan: explicit VARCHAR columns (the Spark
    * side declares its schema too), `parallel=false` so `row_number() OVER
    * ()` is file-line order where an oracle needs ingest order. Every
    * dialect knob is pinned explicitly (quote/escape/delim/nullstr/
    * quoted-null handling) so a DuckDB upgrade changing a `read_csv`
    * default can't silently re-type or re-value the scan — the v1.0
    * defaults are the contract. */
  private def readCsvSql(file: String, cols: Seq[String], withRn: Boolean): String = {
    val colSpec = cols.map(c => s"'$c':'VARCHAR'").mkString("{", ",", "}")
    val rn = if (withRn) "row_number() OVER () AS rn, " else ""
    s"""SELECT $rn* FROM read_csv('$FixtureDir/$file',
       |  header=true, parallel=false, auto_detect=false,
       |  delim=',', quote='"', escape='"', nullstr='',
       |  allow_quoted_nulls=true, ignore_errors=false, columns=$colSpec)""".stripMargin
  }

  val s01Sql: String =
    s"""WITH raw AS (
       |  ${readCsvSql("customers_data.csv", customersSchema.fieldNames, withRn = true)})
       |SELECT customer_id, customer_name, gender FROM raw
       |QUALIFY row_number() OVER (PARTITION BY customer_id ORDER BY rn DESC) = 1
       |ORDER BY customer_id""".stripMargin

  /** The products fixture is 6 committed rows; its cleaned output is a
    * constant. After two rounds of the driver's DuckDB `read_csv` re-typing
    * the scan differently from every local DuckDB (bit-identical values,
    * red hash), the oracle stops parsing CSV altogether: the expected
    * cleaned rows are inlined as a typed VALUES literal — row 3's `abc$` →
    * 0.00, row 4's `-5.00$` → 5.00 (sign stripped by the `[^0-9.]` cleaner,
    * mirroring `MeshJoin.java:119-132`), row 5 rejected (empty productName).
    * The Spark side still exercises the real CSV cleaning pipeline; only
    * the oracle's statement of the right answer is constant.
    *
    * Round 6: after THREE rounds of the driver hash-failing this entry with
    * bit-identical local compares (values, order, DuckDB-native types all
    * matched — so the drift is the driver environment's physical
    * representation of a DECIMAL column that only this entry surfaces), the
    * price is exported as `price_cents BIGINT` on both sides — the
    * integer-cents discipline every other money-hashing entry (a27/a29/w18)
    * already uses. The Spark side still runs the full DECIMAL(10,2) cleaning
    * pipeline and converts at the boundary. */
  val s02Sql: String =
    """SELECT CAST(c1 AS VARCHAR) AS productID,
      |  CAST(c2 AS VARCHAR) AS productName,
      |  CAST(c3 AS BIGINT) AS price_cents,
      |  CAST(c4 AS VARCHAR) AS supplierID,
      |  CAST(c5 AS VARCHAR) AS supplierName,
      |  CAST(c6 AS VARCHAR) AS storeID,
      |  CAST(c7 AS VARCHAR) AS storeName
      |FROM (VALUES
      |  ('1', 'UltraBook Pro', 129999, '10', 'TechSupply Ltd', '1', 'Electro Mart'),
      |  ('101', 'Red Tomatoes', 189999, '51', 'Pakistan', '51', 'Pakistan'),
      |  ('2', 'Streaming Stick', 4999, '11', 'Streambox, Inc.', '1', 'Electro Mart'),
      |  ('3', 'Mystery Gadget', 0, '12', 'Gadget World', '2', 'Gizmo House'),
      |  ('4', 'Discount Cable', 500, '13', 'Cheap Supplies', '2', 'Gizmo House')
      |) AS v(c1, c2, c3, c4, c5, c6, c7)
      |ORDER BY productID""".stripMargin

  /** Date/quantity cleaning twin: the same five formats first-hit-wins;
    * quantity must be bare digits (Spark's `to_number(…, '999999999')` —
    * a plain TRY_CAST would accept '-4' and round '3.7'). */
  private val txnCleanSql: String =
    s"""SELECT rn, order_id,
       |  COALESCE(
       |    CAST(try_strptime(order_date, '%Y-%m-%d %H:%M:%S') AS DATE),
       |    CAST(try_strptime(order_date, '%Y-%m-%d') AS DATE),
       |    CAST(try_strptime(order_date, '%m/%d/%Y') AS DATE),
       |    CAST(try_strptime(order_date, '%d-%m-%Y') AS DATE),
       |    CAST(try_strptime(order_date, '%Y/%m/%d') AS DATE)) AS order_date,
       |  product_id,
       |  CASE WHEN regexp_matches(quantity, '^[0-9]{1,9}$$')
       |       THEN CAST(quantity AS INTEGER) END AS quantity,
       |  customer_id
       |FROM (${readCsvSql("transactions.csv", transactionsSchema.fieldNames, withRn = true)})""".stripMargin

  val s03Sql: String =
    s"""WITH clean AS ($txnCleanSql)
       |SELECT order_id, order_date, product_id, quantity, customer_id
       |FROM clean
       |WHERE order_date IS NOT NULL AND quantity IS NOT NULL AND quantity >= 0
       |ORDER BY order_id, order_date""".stripMargin

  /** End-to-end ETL twin: cleaned txns ⋈ upserted customers ⋈ cleaned
    * products, SALE in DECIMAL(10,2), duplicate ORDER_IDs resolved
    * last-write-wins by file position AFTER enrichment (`MeshJoin.java:
    * 354-376` — a later duplicate that failed the dim join must not erase
    * an earlier hit). */
  val s05Sql: String =
    s"""WITH clean AS ($txnCleanSql),
       |txn AS (
       |  SELECT * FROM clean
       |  WHERE order_date IS NOT NULL AND quantity IS NOT NULL AND quantity >= 0),
       |cust AS ($s01Sql),
       |prod AS (
       |  SELECT productID, productName,
       |    CAST(price_cents / 100.0 AS DECIMAL(10,2)) AS productPrice,
       |    supplierID, supplierName, storeID, storeName
       |  FROM ($s02Sql))
       |SELECT t.order_id AS "ORDER_ID", t.order_date AS "ORDER_DATE",
       |  t.product_id AS "PRODUCT_ID", t.customer_id AS "CUSTOMER_ID",
       |  c.customer_name AS "CUSTOMER_NAME", c.gender AS "GENDER",
       |  p.productName AS "PRODUCT_NAME", p.productPrice AS "PRODUCT_PRICE",
       |  p.supplierID AS "SUPPLIER_ID", p.supplierName AS "SUPPLIER_NAME",
       |  p.storeID AS "STORE_ID", p.storeName AS "STORE_NAME",
       |  t.quantity AS "QUANTITY",
       |  CAST(t.quantity * p.productPrice AS DECIMAL(10,2)) AS "SALE"
       |FROM txn t
       |JOIN cust c ON t.customer_id = c.customer_id
       |JOIN prod p ON t.product_id = p.productID
       |QUALIFY row_number() OVER (PARTITION BY t.order_id ORDER BY t.rn DESC) = 1
       |ORDER BY "ORDER_ID"""".stripMargin

  /** SCD2 twin: same change-flag → running version → run-collapse → interval
    * derivation in DuckDB SQL. `SUM(...) OVER` widens to HUGEINT in DuckDB,
    * so the version counter is cast back to BIGINT before grouping. */
  val s11Sql: String =
    s"""WITH raw AS (
       |  ${readCsvSql("customers_data.csv", customersSchema.fieldNames, withRn = true)}),
       |flagged AS (
       |  SELECT customer_id, customer_name, gender, rn,
       |    CASE WHEN lag(rn) OVER w IS NULL
       |           OR customer_name IS DISTINCT FROM lag(customer_name) OVER w
       |           OR gender IS DISTINCT FROM lag(gender) OVER w
       |         THEN 1 ELSE 0 END AS opens
       |  FROM raw
       |  WINDOW w AS (PARTITION BY customer_id ORDER BY rn)),
       |versioned AS (
       |  SELECT customer_id, customer_name, gender, rn,
       |    CAST(SUM(opens) OVER (PARTITION BY customer_id ORDER BY rn) AS BIGINT) AS ver
       |  FROM flagged),
       |runs AS (
       |  SELECT customer_id, ver, min(customer_name) AS customer_name,
       |         min(gender) AS gender, min(rn) AS valid_from
       |  FROM versioned GROUP BY customer_id, ver)
       |SELECT customer_id, CAST(ver AS INTEGER) AS version, customer_name, gender,
       |  valid_from,
       |  COALESCE(lead(valid_from) OVER (PARTITION BY customer_id ORDER BY ver) - 1,
       |           $Scd2OpenEnd) AS valid_to,
       |  CASE WHEN lead(valid_from) OVER (PARTITION BY customer_id ORDER BY ver) IS NULL
       |       THEN 1 ELSE 0 END AS is_current
       |FROM runs
       |ORDER BY customer_id, version""".stripMargin

  /** Gate entries ignore the sfDir argument: the operator's semantic input
    * is the reference-shaped dirty CSV, not the TPC-H parquet. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_csv_customers" -> ((s, _) =>
      customers(s, s"$FixtureDir/customers_data.csv").orderBy(col("customer_id"))),
    "s02_csv_products" -> ((s, _) =>
      products(s, s"$FixtureDir/products_data.csv")
        // DECIMAL(10,2) → integer cents at the gate boundary only: the full
        // decimal cleaning pipeline still runs (and s05 consumes it as
        // DECIMAL); exporting BIGINT removes the one DECIMAL-from-VALUES
        // hash surface the driver diverged on for three rounds.
        .withColumn("price_cents", (col("productPrice") * 100).cast(LongType))
        .drop("productPrice")
        .select(col("productID"), col("productName"), col("price_cents"),
          col("supplierID"), col("supplierName"), col("storeID"), col("storeName"))
        .orderBy(col("productID"))),
    "s03_csv_transactions" -> ((s, _) =>
      transactions(s, s"$FixtureDir/transactions.csv")
        .drop("ingest_order") // file position is not SQL-derivable for the oracle
        .orderBy(col("order_id"), col("order_date"))),
    "s05_fact_etl" -> ((s, _) =>
      etl(s, FixtureDir).orderBy(col("ORDER_ID"))),
    "s11_scd2_history" -> ((s, _) =>
      scd2(s, s"$FixtureDir/customers_data.csv")
        .orderBy(col("customer_id"), col("version"))))

  val oracles: Map[String, String] = Map(
    "s01_csv_customers"    -> s01Sql,
    "s02_csv_products"     -> s02Sql,
    "s03_csv_transactions" -> s03Sql,
    "s05_fact_etl"         -> s05Sql,
    "s11_scd2_history"     -> s11Sql)
}
