package graft.sources

import org.apache.spark.sql.SparkSession
import graft.model.TargetConfig

/** Target config → Hadoop S3A configuration (reference s3.py:29-53 mapped
  * per SURVEY.md §2.1 S4/S5 and §2.4 L4).
  *
  * The reference builds a boto3 client with explicit keys / session token /
  * named profile / custom endpoint, wrapped in a 5-try exponential backoff.
  * On Spark all of that is connector configuration — the S3A committer then
  * streams multipart uploads instead of staging whole files in memory
  * (strictly better than the reference's BytesIO buffering,
  * __init__.py:272-277).
  */
object S3Conf {
  def apply(spark: SparkSession, config: TargetConfig): Unit = {
    val h = spark.sparkContext.hadoopConfiguration
    config.awsAccessKeyId.foreach(h.set("fs.s3a.access.key", _))
    config.awsSecretAccessKey.foreach(h.set("fs.s3a.secret.key", _))
    config.awsSessionToken.foreach { t =>
      h.set("fs.s3a.session.token", t)
      h.set("fs.s3a.aws.credentials.provider",
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
    }
    config.awsProfile.foreach { p =>
      h.set("fs.s3a.aws.credentials.provider",
        "com.amazonaws.auth.profile.ProfileCredentialsProvider")
      h.set("aws.profile", p)
    }
    config.awsEndpointUrl.foreach { e =>
      h.set("fs.s3a.endpoint", e)
      h.set("fs.s3a.path.style.access", "true")
    }
    // SSE-KMS server-side encryption (legacy L4, reference s3.py:58-87)
    config.encryptionType.foreach {
      case t if t.equalsIgnoreCase("KMS") =>
        h.set("fs.s3a.server-side-encryption-algorithm", "SSE-KMS")
        config.encryptionKey.foreach(h.set("fs.s3a.server-side-encryption.key", _))
      case t if t.equalsIgnoreCase("none") => ()
      case t => throw new UnsupportedOperationException(
        s"encryption_type $t is not supported") // reference: NotImplementedError
    }
    // retry/backoff parity with s3.py:16-25 (5 tries, exponential)
    h.set("fs.s3a.attempts.maximum", "5")
    h.set("fs.s3a.retry.limit", "5")
    // scale hygiene: fast upload with bounded buffering
    h.set("fs.s3a.fast.upload", "true")
    h.set("fs.s3a.multipart.size", "67108864") // 64 MiB parts
  }

  def outputUri(config: TargetConfig): String =
    config.s3Bucket.map(b => s"s3a://$b").getOrElse(
      throw new IllegalArgumentException("Required key is missing from config: [s3_bucket]"))
}
