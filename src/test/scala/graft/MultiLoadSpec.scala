package graft

import org.apache.spark.sql.functions._
import graft.warehouse.Warehouse

/** The two properties the reference's sequential file loop
  * (Code.gs:87-109) silently relies on, proven for the one-shuffle
  * re-expression: re-running the same files changes nothing, and the
  * physical arrival order of rows changes nothing. */
class MultiLoadSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("fin_multi_load is idempotent: re-delivering every file as a later wave is a no-op") {
    val b = Warehouse.multiLoadBatches(spark, sf)
    val once = canon(Warehouse.multiLoadFold(b))
    val rerun = canon(Warehouse.multiLoadFold(
      b.unionByName(b.withColumn("batch", col("batch") + 1000000L))))
    assert(once == rerun)
  }

  test("fin_multi_load is order-insensitive: shuffled arrival order yields the same warehouse") {
    val b = Warehouse.multiLoadBatches(spark, sf)
    val ordered = canon(Warehouse.multiLoadFold(b))
    val shuffled = canon(Warehouse.multiLoadFold(b.repartition(13, col("pos"))))
    assert(ordered == shuffled)
  }

  test("month-NAME-keyed late file folds identically to its number-keyed twin (Code.gs:264-274)") {
    // the reference dedupe-keys the Final sheet on
    // monthNameToNum_(month) || month — name-or-number tolerant, so an
    // older workbook whose month column carries 'March' collides with a
    // correction keyed 3. graft's fold keys on integer month; the
    // reference's tolerance is the coalesce(monthNumber(name), month)
    // normalization applied at ingest — this case proves a name-typed
    // late wave folds bit-identically to its number-typed twin.
    import graft.functions.Financial
    val b = Warehouse.multiLoadBatches(spark, sf)
    def lateWave(base: org.apache.spark.sql.DataFrame) = base
      .withColumn("batch", col("batch") + 1000000L)
      .withColumn("amount", col("amount") + 7.0)
    // name-typed delivery: month travels as 'January'..'December', then
    // re-enters the key space through the reference's normalization
    val named = lateWave(b)
      .withColumn("month_raw", Financial.monthName(col("month")))
      .withColumn("month",
        coalesce(Financial.monthNumber(col("month_raw")), col("month")))
      .drop("month_raw")
    val viaNames = canon(Warehouse.multiLoadFold(b.unionByName(named)))
    val viaNumbers = canon(Warehouse.multiLoadFold(b.unionByName(lateWave(b))))
    assert(viaNames == viaNumbers, "name-keyed wave diverged from number-keyed twin")
    // and the late wave genuinely overwrote (not a vacuous equality)
    assert(viaNames != canon(Warehouse.multiLoadFold(b)))
  }

  test("latestPeriodBatch: newest-file mode is a special case of the fold") {
    val b = Warehouse.multiLoadBatches(spark, sf)
    val sel = Warehouse.latestPeriodBatch(b)
    // exactly one batch survives the selector, and it is the max
    val mx = b.agg(max(col("batch"))).collect()(0).getLong(0)
    assert(sel.select(col("batch")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(mx))
    // incremental mode == one-shot mode: fold the newest file onto the
    // already-folded warehouse of every earlier batch (re-stamped below
    // the newest, as an existing warehouse is), same fixed point as
    // folding all batches at once
    val prior = Warehouse.multiLoadFold(b.filter(col("batch") =!= mx))
      .withColumn("pos", lit(0L)).withColumn("batch", lit(0L))
    val incremental = canon(Warehouse.multiLoadFold(prior.unionByName(sel)))
    assert(incremental == canon(Warehouse.multiLoadFold(b)))
  }

  test("fin_multi_load applies corrections: re-delivered keys carry the amended amount") {
    val out = Warehouse.finMultiLoad(spark, sf)
    val b = Warehouse.multiLoadBatches(spark, sf)
    // every key whose correction wave exists must surface the wave-2 amount
    val corrected = b.filter(col("batch") >= 100000L)
      .select(col("gl_code"), col("year"), col("month"), col("department"),
        col("category"), col("amount"), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("gl_code"), col("year"), col("month"), col("department"), col("category"))
      .orderBy(col("pos").desc)
    val winners = corrected.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "pos")
      .withColumnRenamed("amount", "expected_amount")
    val joined = out.join(winners,
      Seq("gl_code", "year", "month", "department", "category"), "inner")
    assert(joined.count() == winners.count())
    assert(joined.filter(col("amount") =!= col("expected_amount")).count() == 0)
  }
}
