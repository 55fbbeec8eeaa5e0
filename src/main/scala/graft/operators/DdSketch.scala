package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DDSketch percentile estimation, bit-exact with the reference's search
  * path: quickwit's `percentiles` aggregation delegates to tantivy, which
  * feeds values into a `sketches_ddsketch::DDSketch` with the default
  * config (relative accuracy α = 0.01). The golden response values in
  * rest-api-tests/scenarii/aggregations/0001-aggregations.yaml:148-170
  * (85th percentile 100.49456770856702 over {100,120,20} and
  * 30.26717133872237 over {30,130}) are reproduced EXACTLY by:
  *
  *   gamma    = 1 + 2α/(1−α)
  *   gamma_ln = ln_1p(2α/(1−α))        // NOT ln(gamma): the crate uses
  *                                     // ln_1p, and the last 4 decimal
  *                                     // digits of the goldens differ
  *                                     // under plain ln((1+α)/(1−α))
  *   key(v)   = ceil(ln(v) / gamma_ln)           (positive store)
  *   value(k) = 2·exp(k·gamma_ln) / (1 + gamma)
  *   rank(q)  = floor(q·(n−1)); walk bins in ascending value order,
  *              return value(k) of the first bin where cum_count > rank.
  *
  * The sketch state is a tiny (store, key) → count histogram (≤ ~2048 bins
  * per group at α=0.01 across 18 orders of magnitude), which makes it
  * MERGEABLE by plain count-sum — so on Spark the whole sketch is an
  * ordinary `groupBy(group, store, key).count()`: partial aggregation
  * map-side, only (key, count) pairs shuffle, never values. The quantile
  * walk over the ≤2048-bin histogram is a bounded per-group window (or a
  * driver-side fold when rendering ES responses for collected buckets).
  */
object DdSketch {

  val Alpha: Double = 0.01
  /** Values with |v| ≤ MinValue land in the zero bin (crate default 1e-9). */
  val MinValue: Double = 1.0e-9
  val Gamma: Double = 1.0 + 2.0 * Alpha / (1.0 - Alpha)
  val GammaLn: Double = math.log1p(2.0 * Alpha / (1.0 - Alpha))
  private val ValueFactor: Double = 2.0 / (1.0 + Gamma)

  /** Store id: 1 = positive store, 0 = zero bin, -1 = negative store. */
  def storeCol(v: Column): Column =
    when(v > MinValue, lit(1)).when(v < -MinValue, lit(-1)).otherwise(lit(0))

  /** Bin key within the store (0 for the zero bin). `log` is ln. */
  def keyCol(v: Column): Column =
    when(v > MinValue, ceil(log(v) / GammaLn).cast("int"))
      .when(v < -MinValue, ceil(log(-v) / GammaLn).cast("int"))
      .otherwise(lit(0))

  /** Representative value of a bin — the estimate the quantile walk returns. */
  def binValue(store: Int, key: Int): Double = store match {
    case 0 => 0.0
    case 1 => ValueFactor * math.exp(key * GammaLn)
    case _ => -(ValueFactor * math.exp(key * GammaLn))
  }

  final case class Bin(store: Int, key: Int, count: Long)

  /** Ascending-value bin order: negative store by key desc (larger key =
    * larger magnitude = smaller value), then the zero bin, then the
    * positive store by key asc. */
  private def ascending(bins: Seq[Bin]): Seq[Bin] =
    bins.sortBy(b => (b.store, if (b.store < 0) -b.key else b.key))

  /** Quantile estimate from a bin histogram, exactly the crate's walk:
    * rank = floor(q·(n−1)) (integer truncation), first bin with
    * cumulative count strictly greater than rank. */
  def quantile(bins: Seq[Bin], q: Double): Option[Double] = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
    val n = bins.iterator.map(_.count).sum
    if (n == 0L) None
    else {
      val rank = (q * (n - 1).toDouble).toLong
      var cum = 0L
      ascending(bins).collectFirst {
        case b if { cum += b.count; cum > rank } => binValue(b.store, b.key)
      }
    }
  }

  /** Sketch bins per group: the distributed state. One shuffle of
    * (group, store, key) triples; null values are excluded (ES metric
    * semantics). */
  def binsByGroup(df: DataFrame, group: Column, v: Column): DataFrame =
    df.filter(v.isNotNull)
      .groupBy(group.as("grp"), storeCol(v).as("store"), keyCol(v).as("key"))
      .agg(count(lit(1)).as("cnt"))

  /** Distributed single-quantile estimate per group, fully in the frame —
    * the cumulative window runs over the per-group BIN histogram (≤ ~2048
    * rows per group), never over rows, so it is safe at any group size.
    * SQL-mirrorable 1:1 (ln/ceil/exp/floor + window), which is what makes
    * the driver query oracle-checkable in DuckDB. */
  def quantileByGroup(df: DataFrame, group: Column, v: Column, q: Double): DataFrame = {
    val bins = binsByGroup(df, group, v)
    // ascending-value order as a single sortable expression
    val ord = when(col("store") < 0, -col("key")).otherwise(col("key"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("store").asc, ord.asc)
    val wAll = Window.partitionBy(col("grp"))
    bins
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .filter(col("cum") > floor(lit(q) * (col("n") - 1)))
      // first qualifying bin in ascending order = min (store, ord) tuple;
      // groups are tiny so a second bounded window picks it
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("store").asc, ord.asc)))
      .filter(col("rk") === 1)
      .select(col("grp"),
        when(col("store") === 0, 0.0)
          .otherwise(col("store") * lit(ValueFactor) * exp(col("key") * GammaLn))
          .as("value"))
  }
}
