package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.GridNearestJoin
import graft.functions.Geo
import graft.sources.Tables
import XDet._

/** Geo operator coverage (SURVEY.md §2: J1 nearest-neighbor join, F1
  * haversine, P7/P8 pair canonicalization + radius predicate, F8 midpoint),
  * re-expressed over the synthetic tables by deriving deterministic
  * coordinates from integer keys — identical integer arithmetic runs in the
  * DuckDB oracle, so both engines see the same points.
  *
  * Scale shape: the "city" dimension is tiny (nation, 25 rows) and is
  * broadcast in q18/q20; q19 (pair radius search) and q24 (nearest over a
  * ~2000-row dimension) run on [[graft.ext.GridNearestJoin]]'s band/cell
  * equi-joins — the plans that survive a 100× scale-up.
  */
object GeoQueries extends Catalog {

  /** customers → points on a 0.1° grid (exact in double: int/10.0).
    * Widened ([[Tables.wide]]): customer.parquet is one row group, so the
    * scan is one task and the grid joins' neighbor-cell explode (q24) and
    * the zone cross joins (q20) serialized on it — measured 6.0 s / 4.7 s
    * single-task stages at sf1.
    */
  private def customerPoints(s: SparkSession, d: String): DataFrame =
    Tables.wide(Tables.customer(s, d), hashKey = "c_custkey").select(
      col("c_custkey"), col("c_nationkey"),
      (lit(-60) + (col("c_custkey") * 67 % 1200) / lit(10.0)).as("lat"),
      (lit(-170) + (col("c_custkey") * 131 % 3400) / lit(10.0)).as("lon"))

  private val customerPointsSql =
    """SELECT c_custkey, c_nationkey,
      |  -60 + (c_custkey*67 % 1200) / 10.0 AS lat,
      |  -170 + (c_custkey*131 % 3400) / 10.0 AS lon
      |FROM customer""".stripMargin

  /** nations → "cities" on an integer grid */
  private def nationCities(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).select(
      col("n_nationkey"), col("n_name"),
      (lit(-60) + col("n_nationkey") * 137 % 120).as("city_lat"),
      (lit(-170) + col("n_nationkey") * 211 % 340).as("city_lon"))

  private val nationCitiesSql =
    """SELECT n_nationkey, n_name,
      |  -60 + n_nationkey*137 % 120 AS city_lat,
      |  -170 + n_nationkey*211 % 340 AS city_lon
      |FROM nation""".stripMargin

  /** parts → a dimension of "sites" large enough that broadcast cross join is
    * the wrong plan (~2000 rows at sf0.01, scales with sf) */
  private def partSites(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      (lit(-60) + (col("p_partkey") * 73 % 1200) / lit(10.0)).as("site_lat"),
      (lit(-170) + (col("p_partkey") * 179 % 3400) / lit(10.0)).as("site_lon"))

  private val partSitesSql =
    """SELECT p_partkey,
      |  -60 + (p_partkey*73 % 1200) / 10.0 AS site_lat,
      |  -170 + (p_partkey*179 % 3400) / 10.0 AS site_lon
      |FROM part""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- J1: nearest-neighbor join (cross join + windowed argmin) ---------
    "q18_nearest_city" -> ((s, d) => {
      val pts = customerPoints(s, d)
      val cities = nationCities(s, d)
      // argmin ordered on the quantized distance: JVM and DuckDB libm may
      // differ by ≤1 ulp in sin/cos/asin, and a raw-double ORDER BY would let
      // a near-tie pick different cities per engine. At 1e-9 km both engines
      // agree; genuine ties fall to the n_nationkey tiebreak.
      val w = Window.partitionBy("c_custkey")
        .orderBy(round(col("distance"), 9), col("n_nationkey"))
      pts.crossJoin(broadcast(cities))
        .withColumn("distance",
          Geo.haversineKmDet(col("lat"), col("city_lat"), col("lon"), col("city_lon")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_custkey"), col("n_nationkey").as("city_key"),
          col("n_name").as("city_name"), round(col("distance"), 4).as("dist_km"))
    }),

    // ---- P7/P8/F8: canonical pairs within radius + midpoint ----------------
    // Round 1 joined per nation (quadratic in group size); now the same-nation
    // constraint rides along as an extra equi-key on the band join, so the
    // candidate set is bounded by band geometry, not nation cardinality.
    "q19_radius_pairs" -> ((s, d) => {
      GridNearestJoin.radiusPairs(customerPoints(s, d),
          key = "c_custkey", lat = "lat", lon = "lon",
          radiusKm = 1500.0, maxAbsLatDeg = 60.0, extraKeys = Seq("c_nationkey"))
        .select(
          col("c_custkey").as("cust_a"), col("c_custkey_b").as("cust_b"),
          ((col("lat") + col("lat_b")) / lit(2)).as("mid_lat"),
          ((col("lon") + col("lon_b")) / lit(2)).as("mid_lon"),
          round(col("distance"), 4).as("dist_km"))
    }),

    // ---- zone rollup: pre-aggregate per key, then nearest-zone join --------
    "q20_orders_by_zone" -> ((s, d) => {
      // pre-aggregate orders per customer per month BEFORE the geo join —
      // the reference's "предрасчет" shape (project_step_2.py:54): at scale
      // the cross join sees |customers|, not |orders|.
      val perCustomer = Tables.orders(s, d)
        .groupBy(col("o_custkey"), month(col("o_orderdate")).cast("long").as("month"))
        .agg(count(lit(1)).as("orders"), moneySum(col("o_totalprice"), 2).as("spend"))
      val pts = customerPoints(s, d)
      val cities = nationCities(s, d)
      val w = Window.partitionBy("c_custkey")
        .orderBy(round(col("distance"), 9), col("n_nationkey"))
      val zoneOf = pts.crossJoin(broadcast(cities))
        .withColumn("distance",
          Geo.haversineKmDet(col("lat"), col("city_lat"), col("lon"), col("city_lon")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_custkey").as("o_custkey"), col("n_name").as("zone"))
      perCustomer.join(zoneOf, Seq("o_custkey"))
        .groupBy("zone", "month")
        .agg(sum("orders").as("orders"), moneySum(col("spend"), 2).as("spend"))
    }),

    // ---- grid-bucketed nearest-neighbor join (J1 scale path) ---------------
    // Spark runs the cell equi-join + certified-argmin + exact fallback; the
    // oracle brute-forces the same argmin, proving the grid path is exact.
    "q24_grid_nearest" -> ((s, d) => {
      GridNearestJoin.nearest(
          customerPoints(s, d), partSites(s, d),
          srcLat = "lat", dimLat = "site_lat",
          srcLon = "lon", dimLon = "site_lon",
          // cellDeg auto-tuned from the site density (GridNearestJoin
          // .autoCellDeg): at sf0.1 it lands on ~2.9°, matching the 3°
          // hand-sweep optimum (2/3/4/6/9/12° → 3.1/2.6/3.2/3.6/6.4/8.8 s);
          // at sf1 it shrinks to ~0.9° and holds ring-1 fan-in at ~4
          // sites/cell where the fixed 3° grew candidates 100× on 10× data
          srcKey = Seq("c_custkey"), tieBreak = Seq(col("p_partkey")),
          cellDeg = 0.0, maxAbsLatDeg = 60.0)
        .select(col("c_custkey"), col("p_partkey").as("site_key"),
          round(col("distance"), 4).as("dist_km"))
    }),
  )

  private val havCity =
    Geo.haversineSqlText("lat", "city_lat", "lon", "city_lon")
  override def oracles: Map[String, String] = Map(
    "q18_nearest_city" ->
      s"""WITH pts AS ($customerPointsSql),
         |cities AS ($nationCitiesSql)
         |SELECT c_custkey, n_nationkey AS city_key, n_name AS city_name,
         |  round($havCity, 4) AS dist_km
         |FROM pts CROSS JOIN cities
         |QUALIFY row_number() OVER (PARTITION BY c_custkey
         |  ORDER BY round($havCity, 9), n_nationkey) = 1""".stripMargin,

    "q19_radius_pairs" ->
      s"""WITH pts AS ($customerPointsSql)
         |SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
         |  (a.lat + b.lat) / 2 AS mid_lat,
         |  (a.lon + b.lon) / 2 AS mid_lon,
         |  round(${Geo.haversineSqlText("a.lat", "b.lat", "a.lon", "b.lon")}, 4)
         |    AS dist_km
         |FROM pts a JOIN pts b
         |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
         |WHERE ${Geo.haversineSqlText("a.lat", "b.lat", "a.lon", "b.lon")} < 1500.0""".stripMargin,

    "q20_orders_by_zone" ->
      s"""WITH pts AS ($customerPointsSql),
         |cities AS ($nationCitiesSql),
         |per_customer AS (
         |  SELECT o_custkey, CAST(month(o_orderdate) AS BIGINT) AS month,
         |    count(*) AS orders,
         |    ${moneySumSql("o_totalprice", 2)} AS spend
         |  FROM orders GROUP BY 1, 2),
         |zone_of AS (
         |  SELECT c_custkey AS o_custkey, n_name AS zone
         |  FROM pts CROSS JOIN cities
         |  QUALIFY row_number() OVER (PARTITION BY c_custkey
         |    ORDER BY round($havCity, 9), n_nationkey) = 1)
         |SELECT zone, month, CAST(sum(orders) AS BIGINT) AS orders,
         |  ${moneySumSql("spend", 2)} AS spend
         |FROM per_customer JOIN zone_of USING (o_custkey)
         |GROUP BY zone, month""".stripMargin,

    "q24_grid_nearest" ->
      s"""WITH pts AS ($customerPointsSql),
         |sites AS ($partSitesSql)
         |SELECT c_custkey, p_partkey AS site_key,
         |  round(${Geo.haversineSqlText("lat", "site_lat", "lon", "site_lon")}, 4)
         |    AS dist_km
         |FROM pts CROSS JOIN sites
         |QUALIFY row_number() OVER (PARTITION BY c_custkey
         |  ORDER BY round(${Geo.haversineSqlText("lat", "site_lat", "lon", "site_lon")}, 9),
         |    p_partkey) = 1""".stripMargin,
  )
}
