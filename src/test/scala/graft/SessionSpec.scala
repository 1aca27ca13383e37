package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config-level pins for the deployment profiles (no session is created —
  * the builders are validated through their option maps). */
class SessionSpec extends AnyFunSuite {

  test("object-store profile carries the S3A deployment block") {
    val conf = GraftSession.objectStoreConf(
      endpoint = Some("http://minio:9000"),
      pathStyleAccess = true, sslEnabled = false)
    assert(conf("spark.hadoop.fs.s3a.impl") ===
      "org.apache.hadoop.fs.s3a.S3AFileSystem")
    assert(conf("spark.hadoop.fs.s3a.endpoint") === "http://minio:9000")
    assert(conf("spark.hadoop.fs.s3a.path.style.access") === "true")
    assert(conf("spark.hadoop.fs.s3a.connection.ssl.enabled") === "false")
    // credentials resolve through the provider chain, never inline keys
    assert(conf("spark.hadoop.fs.s3a.aws.credentials.provider")
      .contains("EnvironmentVariableCredentialsProvider"))
    assert(!conf.values.exists(v => v.contains("AKIA") || v.contains("secret")))
    // rename-free commits: the magic committer must be wired end to end
    assert(conf("spark.hadoop.fs.s3a.committer.name") === "magic")
    assert(conf("spark.hadoop.fs.s3a.committer.magic.enabled") === "true")
    assert(conf("spark.sql.sources.commitProtocolClass")
      .contains("PathOutputCommitProtocol"))
  }

  test("object-store profile omits the endpoint for AWS-native deployments") {
    val conf = GraftSession.objectStoreConf()
    assert(!conf.contains("spark.hadoop.fs.s3a.endpoint"))
    assert(conf("spark.hadoop.fs.s3a.path.style.access") === "false")
    assert(conf("spark.hadoop.fs.s3a.connection.ssl.enabled") === "true")
  }

  test("the --conf extensions entry point installs the entire native function surface") {
    // ADVICE r3 recurred in r10 (jaro-winkler and contains-any were lazily
    // registered but missing from the --conf path): apply the extensions to
    // a bare SparkSessionExtensions and read back the injected identifiers,
    // so forgetting the injectFunction for a new kernel fails a test instead
    // of a deployment
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts)
    val names = exts.getClass.getDeclaredFields.flatMap { f =>
      f.setAccessible(true)
      f.get(exts) match {
        case buf: scala.collection.mutable.Buffer[_] =>
          buf.toSeq.collect {
            case (id: org.apache.spark.sql.catalyst.FunctionIdentifier, _, _) =>
              id.funcName
          }
        case _ => Nil
      }
    }.toSet
    // every kernel under graft/functions with a session registration
    val expected = Set("graft_minhash", "graft_dot", "graft_simhash",
      "graft_rolling_hash", "graft_shingles", "graft_vocab_hits",
      "graft_jaro_winkler", "graft_pq_adc", "graft_contains_any")
    assert(expected.subsetOf(names), s"missing injections: ${expected -- names}")
  }
}
