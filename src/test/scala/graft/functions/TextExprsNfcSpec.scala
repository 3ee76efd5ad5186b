package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExprsNfcSpec extends SparkSpec {
  import spark.implicits._

  private val Acute = "\u0301" // combining acute accent
  private val Tilde = "\u0303" // combining tilde
  private val EAcute = "\u00e9" // precomposed e-acute
  private val NTilde = "\u00f1" // precomposed n-tilde

  test("nfc folds combining sequences; identity on NFC input; null-safe") {
    VecExprs.register(spark)
    val rows = Seq(
      Some(s"cafe$Acute"),      // decomposed -> café
      Some(s"caf$EAcute"),      // already NFC: unchanged
      Some(s"nin${Tilde}o"),    // wrong base: tilde combines with n
      Some(""),
      None)
      .toDF("s")
      .select(call_function("nfc", col("s")).as("n"))
      .as[Option[String]].collect().toSeq
    assert(rows(0).contains(s"caf$EAcute"))
    assert(rows(1).contains(s"caf$EAcute"))
    assert(rows(2).contains(s"ni$NTilde" + "o"))
    assert(rows(3).contains(""))
    assert(rows(4).isEmpty)
  }

  test("nfc stays inside whole-stage codegen and shortens codepoint count") {
    VecExprs.register(spark)
    val df = spark.range(4).select(
      (length(concat(lit(s"e$Acute"), col("id").cast("string"))) -
        length(call_function("nfc",
          concat(lit(s"e$Acute"), col("id").cast("string"))))).as("delta"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix is the WholeStageCodegen marker in the compact form
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Int].collect().forall(_ == 1), "e+combining acute must fold")
  }
}
