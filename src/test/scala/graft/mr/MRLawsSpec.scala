package graft.mr

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based MR-core laws (SURVEY.md §5.2-4). The generators avoid
  * '\t' and '\n' in keys/values where the tab-KV line codec would be
  * lossy by design (a tab in the KEY is not representable — the decoder's
  * first-tab split reassigns it to the value, mirroring the reference's
  * convention, so key generators exclude tabs while VALUE generators
  * include them).
  */
class MRLawsSpec extends SparkSpec {

  /** scalatestplus-scalacheck is not on the offline classpath; drive
    * ScalaCheck directly. Spark jobs per case are slow → 20 cases each. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  private val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('\'', ' ', ','))).map(_.mkString)
  private val valGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('\t'), 1 -> Gen.const(' '))).map(_.mkString)
  private val kvsGen: Gen[List[(String, String)]] =
    Gen.resize(40, Gen.listOf(Gen.zip(keyGen, valGen)))

  test("KV codec round-trips any tab-free key with any value (maxsplit=1 law)") {
    check(Prop.forAll(keyGen, valGen) { (k, v) =>
      KVCodec.decode(KVCodec.encode((k, v))).contains((k, v))
    })
  }

  test("merged reduce output is independent of the partition count R") {
    check(Prop.forAll(kvsGen, Gen.choose(1, 9)) { (kvs, r) =>
      def run(n: Int): Map[String, String] =
        MRJob.Keyed(spark, spark.sparkContext.parallelize(kvs, 3))
          .partitionSort(n)
          .reduceNative((k, vs) => Iterator((k, vs.mkString("|"))))
          .rdd.collect().toMap
      run(r) == run(1)
    })
  }

  test("native map ≡ script map (identity through `cat`)") {
    check(Prop.forAll(kvsGen) { kvs =>
      val lines = spark.createDataset(kvs.map(KVCodec.encode))(
        org.apache.spark.sql.Encoders.STRING)
      val native = MRJob.mapNative(lines)(l => KVCodec.decode(l))
        .rdd.collect().sorted.toSeq
      val scripted = MRJob.mapScript(lines, Seq("cat"))
        .rdd.collect().sorted.toSeq
      native == scripted
    })
  }

  test("partitionSort yields key-sorted runs within every partition (reducer contract)") {
    check(Prop.forAll(kvsGen) { kvs =>
      MRJob.Keyed(spark, spark.sparkContext.parallelize(kvs, 2)).partitionSort(3)
        .rdd.mapPartitions(it => Iterator(it.map(_._1).toSeq)).collect()
        .forall(ks => ks == ks.sorted)
    })
  }
}
