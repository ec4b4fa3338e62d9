package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

/** Shared file resolution for the file-backed DataSource V2 providers
  * (dnsmag, warc): glob expansion, non-recursive directory listing with
  * hidden/metadata entries skipped (`_SUCCESS`, dotfiles), fail-fast on
  * paths matching nothing — one implementation so the providers' listing
  * semantics cannot drift. */
private[sources] object DataFileListing {
  def listDataFiles(paths: Seq[String], hconf: Configuration,
                    sourceName: String): Seq[FileStatus] = {
    def hidden(name: String) = name.startsWith("_") || name.startsWith(".")
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(hconf)
      val matched = Option(fs.globStatus(hp)).getOrElse(Array.empty[FileStatus])
      if (matched.isEmpty)
        throw new java.io.FileNotFoundException(s"$sourceName source: path does not exist: $p")
      matched.toSeq.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(f => f.isFile && !hidden(f.getPath.getName))
        else Seq(st)
      }
    }
  }
}
