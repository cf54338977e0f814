package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Knn}

/** Manual drive: the occupancy escape valve against an engineered
  * bucket-concentrated block — the skew case the valve guards, which
  * the uniform sweep corpus never exhibits (measured max cell 204 of a
  * 256 cap at 100x: the valve correctly stays cold there, and the
  * blocked-vs-global cost gap is the PRICED recall trade, not skew).
  *
  * Fixture: a "hot" block of vectors constructed to share table-0's
  * base-width signature (iterative projection onto the all-positive
  * sign cone of the seed-1000 planes) while staying sign-diverse on
  * the higher planes, next to a healthy random block. Without the
  * valve, table 0's bucket join scores |hot|^2 pairs; with it, the hot
  * block escalates to the width the occupancy demands and the higher
  * planes split the cell. Reports wall clock valve-on vs valve-off and
  * the escalated width. */
object FloodValveDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nHot = sys.env.get("SPARK_GRAFT_FLOOD_N").map(_.toInt).getOrElse(20000)
    val nCold = nHot
    val dims = 64
    val b0 = Graph.autoLshBits(nHot max nCold)
    // table-0 plane weights (the signLshKeyColumns derivation)
    val planes: Array[Array[Double]] = Array.tabulate(b0)(b =>
      Array.tabulate(dims)(d =>
        graft.functions.expressions.SignLsh64.mix(1000L + b * 1000003L + d)
          .toDouble / Long.MaxValue))
    val norms2 = planes.map(w => w.map(x => x * x).sum)
    val rnd = new scala.util.Random(11)
    def flooded(): Array[Float] = {
      val v = Array.fill(dims)(rnd.nextDouble() * 2 - 1)
      // iterative projection: force every base-width plane positive
      var pass = 0
      var ok = false
      while (pass < 50 && !ok) {
        ok = true
        var b = 0
        while (b < b0) {
          var p = 0.0
          var i = 0
          while (i < dims) { p += planes(b)(i) * v(i); i += 1 }
          if (p <= 0) {
            ok = false
            val alpha = (-p + 1e-4 * math.sqrt(norms2(b))) / norms2(b)
            i = 0
            while (i < dims) { v(i) += alpha * planes(b)(i); i += 1 }
          }
          b += 1
        }
        pass += 1
      }
      require(ok, "sign-cone projection did not converge")
      v.map(_.toFloat)
    }
    def randomVec(): Array[Float] =
      Array.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat)
    val rows =
      (0 until nHot).map(i => (i.toLong, flooded(), "hot")) ++
      (0 until nCold).map(i => ((100000 + i).toLong, randomVec(), "cold"))
    val df = rows.toDF("vec_id", "embedding", "b").repartition(32).persist()
    df.count()

    // premise: the hot block really is one base-width table-0 cell
    val occ = df.filter($"b" === "hot")
      .select(Knn.signLshKey($"embedding", dims, b0, 1000L).as("k"))
      .groupBy("k").count().agg(max("count")).head().getLong(0)
    println(s"FLOOD premise b0=$b0 hotMaxCell=$occ of $nHot")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (withValve, tOn) = time(Graph.knnGraphLsh(df, "vec_id", "embedding",
      k = 3, dims = dims, bits = 0, tables = 8, blockCol = Some("b")).count())
    val escBits = (0 to (16 - b0)).find(e => occ <= 256L * (1L << e))
      .map(b0 + _).getOrElse(16)
    println(f"FLOOD_VALVE_ON  wall=${tOn}%.2fs rows=$withValve escalated_to=$escBits")
    val (noValve, tOff) = time(Graph.knnGraphLsh(df, "vec_id", "embedding",
      k = 3, dims = dims, bits = 0, tables = 8, blockCol = Some("b"),
      blockBucketCap = Long.MaxValue).count())
    println(f"FLOOD_VALVE_OFF wall=${tOff}%.2fs rows=$noValve")
    spark.stop()
  }
}
