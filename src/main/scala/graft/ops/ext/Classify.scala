package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed classifier primitives for corpus curation: the models a
  * 100 TB pipeline actually trains IN the engine (class priors + count
  * tables + closed forms), as opposed to the ones it trains outside and
  * only scores with. Everything here is aggregation-shaped — one or two
  * fact exchanges, dims broadcast — and every score is reproducible
  * across engines: counts stay integers, ln() only ever sees integer
  * inputs, and float accumulation goes through DECIMAL(38,18) so the
  * sum order cannot change the answer (the q84/q288 discipline).
  *
  * Reference scope: the reference engine (annotation/commands/
  * run_annotate.py) has no model surface at all — these extend the
  * engine for LLM-pipeline curation (domain/language routing, quality
  * regression, embedding-space label transfer).
  */
object Classify {

  private val Dec = DecimalType(38, 18)
  private val DecInt = DecimalType(38, 0)

  /** Multinomial Naive Bayes with add-one smoothing, trained on the
    * even-id half of the corpus and scored on the odd half; returns the
    * (true, predicted) confusion census.
    *
    * Score(d, c) = ln D_c − ln D + Σ_t m_t·ln(n_tc + 1) − n_d·ln(N_c + V),
    * every ln() input an exact integer. The per-(doc, class) overlap
    * term is ONE shuffle of the test token frame joined against the
    * (token, class) count table; the class table (|C| rows) and the
    * scalar (D, V) frame broadcast. Argmax is a |C|-wide window per
    * doc, tie-broken by class name — no floats cross an engine
    * boundary unquantized: scores accumulate in DECIMAL(38,18).
    */
  def naiveBayesConfusion(docs: DataFrame, textCol: String,
      classCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("did"), col(classCol).as("cls"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val train = toks.filter(col("did") % 2 === 0)
    val ctc = train.groupBy("token", "cls").agg(count(lit(1)).as("ctc"))
    val classTable = docs.filter(col(idCol) % 2 === 0)
      .groupBy(col(classCol).as("clang")).agg(count(lit(1)).as("dc"))
      .join(train.groupBy(col("cls").as("clang"))
          .agg(count(lit(1)).as("nc")),
        Seq("clang"), "left")
      .na.fill(0L, Seq("nc"))
    val scalars = docs.filter(col(idCol) % 2 === 0)
      .agg(count(lit(1)).as("dtot"))
      .crossJoin(train.agg(countDistinct(col("token")).as("v")))

    val testM = toks.filter(col("did") % 2 === 1)
      .groupBy("did", "token").agg(count(lit(1)).as("m"))
    val nd = testM.groupBy("did").agg(sum("m").as("n_d"))
    val testDocs = docs.filter(col(idCol) % 2 === 1)
      .select(col(idCol).as("did"), col(classCol).as("true_cls"))
      .join(nd, Seq("did"), "left").na.fill(0L, Seq("n_d"))
    val overlap = testM
      .join(ctc.withColumnRenamed("cls", "clang"), Seq("token"))
      .groupBy("did", "clang")
      .agg(sum((col("m") * log(col("ctc") + 1)).cast(Dec)).as("s1"))

    val scored = testDocs
      .crossJoin(broadcast(classTable))
      .crossJoin(broadcast(scalars))
      .join(overlap, Seq("did", "clang"), "left")
      .select(col("did"), col("true_cls"), col("clang"),
        (log(col("dc")).cast(Dec) - log(col("dtot")).cast(Dec)
          - (col("n_d") * log(col("nc") + col("v"))).cast(Dec)
          + coalesce(col("s1"), lit(0).cast(Dec))).as("score"))
    val pred = scored.withColumn("r", row_number().over(
        Window.partitionBy("did")
          .orderBy(col("score").desc, col("clang"))))
      .filter(col("r") === 1)
    pred.groupBy(col("true_cls"), col("clang").as("pred_cls"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_cls", "pred_cls")
  }

  /** Closed-form ridge regression (two regressors + intercept) per
    * group, from ONE pass of exact-integer Gram sums. Inputs must
    * already be integer-quantized columns; the centered second-moment
    * matrix S′ = n·Σxy − Σx·Σy is computed in DECIMAL(38,0) (exact at
    * any corpus size), and only the final solve runs in double — the
    * same expression tree in the oracle, so the doubles agree bit for
    * bit. lambda rides on the S′ scale as λ·n.
    */
  def ridgeClosedForm(df: DataFrame, groupCol: String, x1: Column,
      x2: Column, y: Column, lambda: Double): DataFrame = {
    val g = df
      .select(col(groupCol), x1.as("x1"), x2.as("x2"), y.as("y"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum("x1").as("sx1"), sum("x2").as("sx2"), sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("sx1x1"),
        sum(col("x2") * col("x2")).as("sx2x2"),
        sum(col("x1") * col("x2")).as("sx1x2"),
        sum(col("x1") * col("y")).as("sx1y"),
        sum(col("x2") * col("y")).as("sx2y"),
        sum((col("y").cast(DecInt) * col("y"))).as("syy"))
    def sp(sxy: Column, sx: Column, sy: Column): Column =
      (col("n").cast(DecInt) * sxy.cast(DecInt)
        - sx.cast(DecInt) * sy.cast(DecInt)).cast("double")
    val withS = g.select(col(groupCol), col("n"),
      sp(col("sx1x1"), col("sx1"), col("sx1")).as("s11"),
      sp(col("sx2x2"), col("sx2"), col("sx2")).as("s22"),
      sp(col("sx1x2"), col("sx1"), col("sx2")).as("s12"),
      sp(col("sx1y"), col("sx1"), col("sy")).as("s1y"),
      sp(col("sx2y"), col("sx2"), col("sy")).as("s2y"),
      sp(col("syy"), col("sy"), col("sy")).as("syy"),
      (col("sx1").cast("double") / col("n").cast("double")).as("mx1"),
      (col("sx2").cast("double") / col("n").cast("double")).as("mx2"),
      (col("sy").cast("double") / col("n").cast("double")).as("my"))
    val lam = lit(lambda) * col("n").cast("double")
    val det = (col("s11") + lam) * (col("s22") + lam) - col("s12") * col("s12")
    val b1 = ((col("s22") + lam) * col("s1y") - col("s12") * col("s2y")) / det
    val b2 = ((col("s11") + lam) * col("s2y") - col("s12") * col("s1y")) / det
    withS.select(col(groupCol), col("n"),
        b1.as("b1d"), b2.as("b2d"),
        (col("my") - b1 * col("mx1") - b2 * col("mx2")).as("b0d"),
        ((b1 * col("s1y") + b2 * col("s2y")) / col("syy")).as("r2d"))
      .select(col(groupCol), col("n"),
        round(col("b1d"), 6).as("b1"), round(col("b2d"), 6).as("b2"),
        round(col("b0d"), 6).as("intercept"), round(col("r2d"), 6).as("r2"))
      .orderBy(groupCol)
  }

  /** Nearest-class-centroid (Rocchio) assignment over an embedding
    * column: class centroids from the even-id half, every odd-id vector
    * assigned to its max-cosine centroid, returned as the (true,
    * predicted) confusion census.
    *
    * Components quantize to integers (×1e6) BEFORE any sum, so the
    * centroid component sums are exact at any scale (DECIMAL-guarded
    * squares); cosine is invariant to the centroid's 1/n scale, so the
    * division never happens. The d×|C| centroid frame broadcasts; the
    * only corpus-sized exchanges are the component explode and the
    * per-(vector, class) dot aggregation.
    */
  def rocchioConfusion(emb: DataFrame, vecCol: String, labelCol: String,
      idCol: String): DataFrame = {
    val comps = emb.select(col(idCol).as("vid"), col(labelCol).as("lbl"),
        posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("vid"), col("lbl"), col("i"),
        floor(col("x").cast("double") * 1000000.0 + 0.5)
          .cast("long").as("qx"))
    val cent = comps.filter(col("vid") % 2 === 0)
      .groupBy(col("lbl").as("clbl"), col("i"))
      .agg(sum(col("qx").cast(DecInt)).as("sq"))
    val centNorm = cent.groupBy("clbl")
      .agg(sum(col("sq") * col("sq")).as("c2"))
    val test = comps.filter(col("vid") % 2 === 1)
    val tNorm = test.groupBy("vid")
      .agg(sum(col("qx") * col("qx")).as("t2"))
    val dots = test
      .join(broadcast(cent), Seq("i"))
      .groupBy("vid", "lbl", "clbl")
      .agg(sum(col("qx").cast(DecInt) * col("sq")).as("dot"))
    val scored = dots
      .join(tNorm, Seq("vid"))
      .join(broadcast(centNorm), Seq("clbl"))
      .select(col("vid"), col("lbl"), col("clbl"),
        (col("dot").cast("double")
          / (sqrt(col("t2").cast("double"))
            * sqrt(col("c2").cast("double")))).as("cos"))
    val pred = scored.withColumn("r", row_number().over(
        Window.partitionBy("vid")
          .orderBy(col("cos").desc, col("clbl"))))
      .filter(col("r") === 1)
    pred.groupBy(col("lbl").as("true_label"),
        col("clbl").as("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }
}
