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
}
