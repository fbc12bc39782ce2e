package graft.expr

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitter sketch + the exact-verified heavy-hitters
  * operator built on it — the corpus-scale answer to "which tokens /
  * domains / keys dominate this 100 TB table" without a full
  * de-duplicating shuffle of every distinct value.
  *
  * The sketch (Misra & Gries 1982, merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS'12) keeps at most `capacity` counters;
  * `reduce` increments a tracked value, admits an untracked one while
  * space remains, and otherwise decrements every counter (dropping
  * zeros); `merge` sums counterparts and trims back to `capacity` by
  * subtracting the (capacity+1)-largest count. Both paths undercount
  * every value by at most n/(capacity+1) TOTAL (n = stream length),
  * under ANY partitioning/merge order — so every value with true
  * frequency > n/(capacity+1) is guaranteed tracked at the end.
  * Buffer is O(capacity) regardless of cardinality, partial-agg
  * friendly (map-side combine does most of the work).
  *
  * [[HeavyHitters.heavyHitters]] turns the PROBABLY-overcomplete
  * candidate set into an EXACT answer with one verification pass:
  * broadcast the ≤`capacity` candidates against the stream, count
  * them exactly, keep those at/above the frequency threshold. By the
  * guarantee, the result EQUALS the exact "GROUP BY HAVING count ≥
  * n div freqDen + 1" answer whenever `freqDen ≤ capacity + 1` —
  * which is how q_heavy_hitters hash-matches a plain SQL oracle while
  * never shuffling the full distinct-value set.
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, scala.collection.mutable.HashMap[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  override def zero: Buf = scala.collection.mutable.HashMap.empty

  override def reduce(m: Buf, v: String): Buf = {
    m.get(v) match {
      case Some(c) => m.update(v, c + 1)
      case None if m.size < capacity => m.update(v, 1L)
      case None =>
        // decrement-all: every tracked count −1, zeros evicted (the
        // arriving value's +1 and a −1 cancel — it stays untracked).
        // O(capacity), but each decrement cancels one earlier
        // increment → amortized O(1) per row.
        val dead = new scala.collection.mutable.ArrayBuffer[String]
        m.mapValuesInPlace((_, c) => c - 1)
        m.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(m.remove)
    }
    m
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-largest count from all, drop <= 0
      val counts = a.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = new scala.collection.mutable.ArrayBuffer[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(m: Buf): Map[String, Long] = m.toMap

  override def bufferEncoder: Encoder[scala.collection.mutable.HashMap[String, Long]] =
    Encoders.kryo[scala.collection.mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}

object HeavyHitters {

  /** MG candidate map over a string column: one row holding
    * value → (undercounted) estimate, at most `capacity` entries.
    * NULLs are skipped (typed aggregators never see them).
    */
  def candidates(df: DataFrame, value: Column, capacity: Int): DataFrame = {
    val agg = udaf(new MisraGries(capacity), Encoders.STRING)
    // kryo buffer surfaces as BINARY; decode via the same encoder by
    // exploding on the driver is wrong at scale — instead re-shape to
    // rows with a deserializing UDF kept OFF the hot path (runs once
    // on a single 1-row result).
    df.select(value.as("__v")).na.drop(Seq("__v"))
      .agg(agg(col("__v")).as("__mg"))
  }

  /** EXACT heavy hitters: all values of `value` with frequency
    * ≥ n div freqDen + 1 (strictly more than n/freqDen), with their
    * exact counts — `(value, cnt)`. Requires `freqDen ≤ capacity + 1`
    * so the sketch's recall guarantee makes the answer exact (see
    * class doc). Plan shape: one sketch pass (O(capacity) state,
    * map-side combined), one broadcast-semi verification count over
    * the stream, a 1-row total cross-joined in — the full
    * distinct-value set is never shuffled.
    */
  def heavyHitters(df: DataFrame, value: Column, capacity: Int, freqDen: Long): DataFrame = {
    require(freqDen > 0, s"freqDen must be positive, got $freqDen")
    require(freqDen <= capacity + 1L,
      s"exactness needs freqDen <= capacity+1 (guarantee covers freq > n/(capacity+1)); " +
        s"got freqDen=$freqDen, capacity=$capacity")
    val agg = udaf(new MisraGries(capacity), Encoders.STRING)
    val vals = df.select(value.as("value")).na.drop(Seq("value"))
    // sketch AND total in the SAME 1-row pass — a separate count()
    // would be a third full scan of the stream for one number
    val sketchAndTotal = vals
      .agg(agg(col("value")).as("__mg"), count(lit(1)).as("__n"))
    val cand = sketchAndTotal
      .select(explode(map_keys(deserializeMg(col("__mg")))).as("value"), col("__n"))
    // inner join carries the constant __n along with each candidate
    // row — ONE reference to the sketch plan, no second evaluation
    vals.join(broadcast(cand), Seq("value"))
      .groupBy("value").agg(count(lit(1)).as("cnt"), first(col("__n")).as("__n"))
      .filter(col("cnt") >= expr(s"__n div ${freqDen}L") + lit(1L))
      .select(col("value"), col("cnt"))
  }

  /** Per-group exact heavy hitters — `(grp, value, cnt)` for every
    * group value pair with in-group frequency ≥ n_grp div freqDen + 1
    * (same exactness argument as [[heavyHitters]], applied per group:
    * each group's sketch sees exactly its own stream, and partial
    * sketches merge per group key). The shape for "top tokens per
    * language / top URLs per domain" over a corpus whose (group,
    * value) distinct space is too large to shuffle whole: only rows
    * matching the ≤capacity-per-group candidates reach the counting
    * aggregate.
    */
  def heavyHittersByGroup(df: DataFrame, group: Column, value: Column,
      capacity: Int, freqDen: Long): DataFrame = {
    require(freqDen > 0, s"freqDen must be positive, got $freqDen")
    require(freqDen <= capacity + 1L,
      s"exactness needs freqDen <= capacity+1; got freqDen=$freqDen, capacity=$capacity")
    val agg = udaf(new MisraGries(capacity), Encoders.STRING)
    val vals = df.select(group.as("grp"), value.as("value")).na.drop(Seq("grp", "value"))
    // per-group sketch AND per-group total in ONE keyed agg pass; the
    // inner join then carries the group's __n on every candidate row
    // (no separate totals scan, no second join)
    val cand = vals.groupBy("grp")
      .agg(agg(col("value")).as("__mg"), count(lit(1)).as("__n"))
      .select(col("grp"), explode(map_keys(deserializeMg(col("__mg")))).as("value"), col("__n"))
    vals.join(cand, Seq("grp", "value"))
      .groupBy("grp", "value").agg(count(lit(1)).as("cnt"), first(col("__n")).as("__n"))
      .filter(col("cnt") >= expr(s"__n div ${freqDen}L") + lit(1L))
      .select(col("grp"), col("value"), col("cnt"))
  }

  /** Kryo map payload → MapType column (one invocation per GROUP —
    * never on a per-row hot path).
    */
  private val deserializeMg = udf((bytes: Array[Byte]) => {
    // Use the running environment's Spark conf so custom kryo settings
    // (registrator, registrationRequired) match the Encoders.kryo
    // side that produced the payload; default conf only as a fallback
    // for detached test contexts.
    val conf = Option(org.apache.spark.SparkEnv.get).map(_.conf)
      .getOrElse(new org.apache.spark.SparkConf(false))
    val ser = new org.apache.spark.serializer.KryoSerializer(conf).newInstance()
    ser.deserialize[Map[String, Long]](java.nio.ByteBuffer.wrap(bytes))
  })
}
