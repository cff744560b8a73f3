package graft.model

import org.apache.spark.sql.types._

/** Data model for object-storage metadata events.
  *
  * Field inventory mirrors the reference's public event model
  * (reference: src/main/scala/com/scality/clueso/CluesoConstants.scala:9-65):
  * an op-log entry `(opIndex, type, bucket, key)` carrying a metadata
  * payload with free-form user metadata (`userMd`), ACLs, physical
  * locations, tags and replication info.
  */
object ObjectEvent {

  val replicationInfoSchema: StructType = new StructType()
    .add("status", StringType)
    .add("content", ArrayType(StringType, containsNull = false))
    .add("destination", StringType)
    .add("storageClass", StringType)
    .add("role", StringType)

  val locationSchema: StructType = new StructType()
    .add("key", StringType, nullable = false)
    .add("size", LongType, nullable = false)
    .add("start", LongType, nullable = false)
    .add("dataStoreName", StringType)
    .add("dataStoreETag", StringType)

  val aclSchema: StructType = new StructType()
    .add("Canned", StringType)
    .add("FULL_CONTROL", ArrayType(StringType, containsNull = false))
    .add("WRITE_ACP", ArrayType(StringType, containsNull = false))
    .add("READ", ArrayType(StringType, containsNull = false))
    .add("READ_ACP", ArrayType(StringType, containsNull = false))

  val payloadSchema: StructType = new StructType()
    .add("userMd", MapType(StringType, StringType))
    .add("bucket", StringType)
    .add("key", StringType)
    .add("acl", aclSchema)
    .add("location", ArrayType(locationSchema, containsNull = false))
    .add("tags", MapType(StringType, StringType, valueContainsNull = false))
    .add("replicationInfo", replicationInfoSchema)
    .add("md-model-version", IntegerType)
    .add("owner-display-name", StringType)
    .add("owner-id", StringType)
    .add("content-length", IntegerType)
    .add("content-type", StringType)
    .add("last-modified", TimestampType)
    .add("content-md5", StringType)
    .add("x-amz-server-version-id", StringType)
    .add("dataStoreName", StringType)
    .add("x-amz-storage-class", StringType)
    .add("x-amz-server-side-encryption", StringType)
    .add("x-amz-server-side-encryption-aws-kms-key-id", StringType)
    .add("x-amz-server-side-encryption-customer-algorithm", StringType)
    .add("x-amz-website-redirect-location", StringType)
    .add("isDeleteMarker", BooleanType)
    .add("x-amz-version-id", StringType)

  /** Wire format: the raw op-log event (the `value` payload arrives as a
    * JSON *string* nested inside the envelope, as emitted by the metadata
    * journal).
    */
  val wireSchema: StructType = new StructType()
    .add("opIndex", StringType)
    .add("type", StringType, nullable = false)
    .add("bucket", StringType)
    .add("key", StringType, nullable = false)
    .add("value", StringType)

  /** Stored format in the landing/staging zones. */
  val storedSchema: StructType = new StructType()
    .add("bucket", StringType)
    .add("key", StringType, nullable = false)
    .add("opIndex", StringType, nullable = false)
    .add("opGroup", LongType, nullable = false)
    .add("type", StringType, nullable = false)
    .add("message", payloadSchema)

  /** Columns a search returns to the caller
    * (reference: CluesoConstants.scala:67-76).
    */
  val resultColumns: Seq[String] = Seq(
    "key", "last-modified", "content-md5", "owner-id",
    "owner-display-name", "content-length", "x-amz-storage-class", "bucket")
}
