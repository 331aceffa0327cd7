package graft.sources

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** A minimal non-`file:` Hadoop filesystem scheme (`graftfs://`) aliasing
  * local disk — the cheapest possible stand-in for an object store.
  *
  * Purpose: prove the engine's path handling is scheme-agnostic (reference
  * O16 parity — the reference talks to Azure blob storage through its own
  * client, `cmd/azure/azure_util.go:67-146`; Spark reaches any store
  * through the Hadoop FileSystem SPI instead). Every read/write path in
  * this library goes through that SPI, so registering
  * `spark.hadoop.fs.graftfs.impl = graft.sources.GraftFs` and handing any
  * source a `graftfs:///...` URI must behave identically to `file:///` —
  * asserted end-to-end in `GraftFsSpec`. Swapping in a real `abfss://` /
  * `s3a://` connector is configuration, not code.
  */
class GraftFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
