package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test fixture: a Hadoop FileSystem registered under the fake scheme
  * `memfs://` that stores data on the local disk. Registering it via
  * `fs.memfs.impl` lets the suite drive LoadFile / GetFileList /
  * ExportToFile through a NON-`file:` scheme end-to-end — the proof that
  * the object-store pass-through claim (any `s3a://`-style location is just
  * a Hadoop FS scheme, model.scala `File` doc) survives the glob/pattern/
  * single-file-rename logic in the operators.
  */
class MemFs extends RawLocalFileSystem {
  override def getScheme: String = "memfs"
  override def getUri: URI       = URI.create("memfs:///")
}
